"""Property-based round-trip of the VP8L decoder against a GENERAL
literal-only test-side encoder: any small RGB image (arbitrary dims,
arbitrary palette) encodes with per-channel canonical Huffman trees —
simple codes for ≤2 distinct values, code-length-coded trees otherwise —
and must decode bit-exact. Pure python (no Spark), so hypothesis can
drive hundreds of shapes cheaply; this is the same independent-encoder
discipline as the GIF LZW and PNG golden suites."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lakota_spark.operators.multimodal import _parse_webp

from tests.test_operators import (  # noqa: E402 - test helpers
    _VP8LWriter,
    _vp8l_head,
    _wr_lengths,
    _wr_simple,
    _wrap_webp,
)


def _channel_tree(w, values, alphabet=256):
    """Emit a tree covering ``values`` (distinct uint8s) and return the
    symbol -> (code, length) map used for pixel emission."""
    vals = sorted(set(values))
    if len(vals) <= 2:
        return _wr_simple(w, vals)
    bits = (len(vals) - 1).bit_length()
    return _wr_lengths(w, {v: bits for v in vals}, alphabet)


def encode_vp8l_literal(img: np.ndarray) -> bytes:
    """Literal-only VP8L: no transforms, no cache, no meta, no LZ77."""
    h, wd, _ = img.shape
    w = _VP8LWriter()
    _vp8l_head(w, wd, h)
    w.u(0, 1)  # no transforms
    w.u(0, 1)  # no color cache
    w.u(0, 1)  # no meta huffman
    # the GREEN alphabet is 256 literals + 24 length codes (no cache):
    # the code-length stream must cover the full 280, or the decoder
    # reads the red tree's bits as more code lengths
    g = _channel_tree(w, img[:, :, 1].ravel(), alphabet=280)
    r = _channel_tree(w, img[:, :, 0].ravel())
    b = _channel_tree(w, img[:, :, 2].ravel())
    _wr_simple(w, [255])  # alpha
    _wr_simple(w, [0])    # distance (unused)
    for y in range(h):
        for x in range(wd):
            for tree, chan in ((g, 1), (r, 0), (b, 2)):
                code, length = tree[int(img[y, x, chan])]
                w.code(code, length)
    return _wrap_webp(w.payload())


@settings(max_examples=120, deadline=None)
@given(
    st.integers(1, 9),
    st.integers(1, 9),
    st.lists(
        st.tuples(
            st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
        ),
        min_size=1,
        max_size=7,
        unique=True,
    ),
    st.randoms(use_true_random=False),
)
def test_vp8l_literal_roundtrip(w, h, palette, rng):
    img = np.array(
        [
            [palette[rng.randrange(len(palette))] for _ in range(w)]
            for _ in range(h)
        ],
        dtype=np.uint8,
    )
    got = _parse_webp(encode_vp8l_literal(img))
    assert got is not None and got.shape == (h, w, 3)
    assert (got == img).all()
