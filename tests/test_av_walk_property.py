"""Property-based suites for the round-12 container walks — the same
independent-muxer discipline as the VP8L/GIF/PNG property tests: any
field combination the test-side muxers emit must round-trip exactly,
and arbitrary bytes must never crash a walk (hostile-input honesty:
return a dict or None, nothing else)."""

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from lakota_spark.operators.multimodal import (
    _parse_mkv_headers,
    _parse_mp4_headers,
    _parse_ogg_av_headers,
)

from tests.test_operators import (  # noqa: E402 - independent muxers
    _mk_fmp4,
    _mk_mp4_av,
    _mk_ogg_page,
    _mk_theora_ident,
    _mk_vorbis_ident,
    _mk_webm,
)


@settings(max_examples=150, deadline=None)
@given(
    width=st.integers(1, 4095),
    height=st.integers(1, 4095),
    dur_ms=st.integers(1, 10**7),
    channels=st.integers(1, 8),
    scale=st.one_of(st.none(), st.integers(1, 10**8)),
    doctype=st.sampled_from([b"webm", b"matroska"]),
    unknown=st.booleans(),
)
def test_ebml_walk_roundtrip(width, height, dur_ms, channels, scale,
                             doctype, unknown):
    got = _parse_mkv_headers(_mk_webm(
        width, height, dur_ms, channels, doctype=doctype, scale=scale,
        unknown_segment=unknown,
    ))
    assert got is not None
    assert got["doctype"] == doctype.decode()
    assert (got["width"], got["height"]) == (float(width), float(height))
    assert got["channels"] == float(channels)
    # duration = float64(dur_ms) * scale / 1e9 — replay the parser's
    # own IEEE chain
    eff = scale if scale is not None else 1_000_000
    assert got["duration_s"] == float(dur_ms) * eff / 1e9


@settings(max_examples=150, deadline=None)
@given(data=st.binary(max_size=512))
def test_ebml_walk_never_crashes(data):
    out = _parse_mkv_headers(data)
    assert out is None or isinstance(out, dict)
    # seeded with the magic so the walk goes deeper before rejecting
    out2 = _parse_mkv_headers(b"\x1a\x45\xdf\xa3" + data)
    assert out2 is None or isinstance(out2, dict)


@settings(max_examples=150, deadline=None)
@given(
    # FMBW/FMBH are u16 macroblock counts, so picture dims cap at
    # 16 * 65535 (PICW/PICH themselves are u24)
    picw=st.integers(1, 16 * 65535),
    pich=st.integers(1, 16 * 65535),
    frn=st.integers(1, 1 << 30),
    frd=st.integers(1, 1 << 30),
    kfg=st.integers(0, 31),
    key_ix=st.integers(0, 1 << 20),
    delta=st.integers(0, 1 << 10),
    samples=st.integers(1, 1 << 40),
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
    ch=st.integers(1, 8),
)
def test_ogg_av_walk_roundtrip(picw, pich, frn, frd, kfg, key_ix, delta,
                               samples, rate, ch):
    delta = min(delta, (1 << kfg) - 1) if kfg else 0
    granule = (key_ix << kfg) | delta
    if granule <= 0:
        granule = 1 << kfg if kfg else 1
        key_ix, delta = (1, 0) if kfg else (1, 0)
    blob = (
        _mk_ogg_page(3, 0, 2, 0, [_mk_theora_ident(picw, pich, frn, frd, kfg)])
        + _mk_ogg_page(9, 0, 2, 0, [_mk_vorbis_ident(ch, rate)])
        + _mk_ogg_page(3, granule, 4, 1, [b"\x00" * 8])
        + _mk_ogg_page(9, samples, 4, 1, [b"\x00" * 8])
    )
    got = _parse_ogg_av_headers(blob)
    assert got is not None
    assert (got["n_streams"], got["n_video"], got["n_audio"]) == (2, 1, 1)
    assert (got["width"], got["height"]) == (float(picw), float(pich))
    assert (got["rate"], got["channels"]) == (float(rate), float(ch))
    frames = (granule >> kfg) + (granule & ((1 << kfg) - 1)) + 1
    assert got["duration_s"] == max(frames * frd / frn, samples / rate)


@settings(max_examples=150, deadline=None)
@given(data=st.binary(max_size=512))
def test_ogg_av_walk_never_crashes(data):
    out = _parse_ogg_av_headers(data)
    assert out is None or isinstance(out, dict)
    out2 = _parse_ogg_av_headers(b"OggS\x00\x02" + data)
    assert out2 is None or isinstance(out2, dict)


@settings(max_examples=100, deadline=None)
@given(
    v=st.integers(0, 1 << 30),
    a=st.integers(0, 1 << 30),
    durs=st.lists(st.integers(1, 1 << 30), min_size=1, max_size=8),
    timescale=st.integers(1, 1 << 30),
    ver=st.sampled_from([0, 1]),
)
def test_fmp4_sidx_roundtrip(v, a, durs, timescale, ver):
    got = _parse_mp4_headers(
        _mk_fmp4(v, a, durs, timescale=timescale, sidx_ver=ver)
    )
    assert got is not None
    assert got["n_fragments"] == float(len(durs))
    assert got["duration_s"] == sum(durs) / timescale
    assert got["v_samples"] == float(v * len(durs))
    assert got["n_samples"] == float(a * len(durs))


@settings(max_examples=150, deadline=None)
@given(data=st.binary(max_size=512))
def test_mp4_walk_never_crashes(data):
    out = _parse_mp4_headers(data)
    assert out is None or isinstance(out, dict)
    blob = _mk_mp4_av(64, 48, 100, 1)
    out2 = _parse_mp4_headers(blob + data)
    assert out2 is None or isinstance(out2, dict)
