"""Round-10 VP8L decode-throughput probe (r9 judge ask #5): the
table-driven Huffman loop + SWAR predictor vs the r9 per-symbol dict
decoder, across the decode regimes:

1. full-entropy literal images (worst case for the Huffman loop — every
   pixel costs 4 symbol reads, no LZ77/cache) via the test-side
   literal encoder;
2. LZ77-dominated images (1 literal + max-length backrefs — the
   amplification regime; decodes via C-speed array slices);
3. the predictor inverse alone, all-sequential (mode 13, the SWAR
   floor) and all-vectorized (mode 2) block modes.

Usage: python scripts/probe_vp8l_r10.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    sys.path.insert(0, "/root/repo/tests")
    from tests.test_operators import (
        _VP8LWriter, _vp8l_head, _wr_lengths, _wr_simple, _wrap_webp,
    )
    from tests.test_vp8l_property import encode_vp8l_literal

    from lakota_spark.operators.multimodal import (
        _parse_webp, _vp8l_unpredict,
    )

    rng = np.random.default_rng(3)
    print("-- full-entropy literals (Huffman worst case) --")
    for side in (512, 1024, 2048):
        img = rng.integers(0, 256, (side, side, 3), dtype=np.uint8)
        payload = encode_vp8l_literal(img)
        t0 = time.monotonic()
        got = _parse_webp(payload)
        t = time.monotonic() - t0
        assert (got == img).all()
        mpix = side * side / 1e6
        print(f"  {side}x{side}: {t:.2f}s = {mpix / t:.2f} MPix/s "
              f"({len(payload)} payload bytes)")

    print("-- LZ77-dominated (tiny payload, slice copies) --")
    for wd, h in ((4096, 4096), (8192, 7800)):
        n = wd * h
        w = _VP8LWriter()
        _vp8l_head(w, wd, h)
        w.u(0, 1)
        w.u(0, 1)
        w.u(0, 1)
        g = _wr_lengths(w, {20: 1, 256 + 23: 1}, 280)
        _wr_simple(w, [10])
        _wr_simple(w, [30])
        _wr_simple(w, [255])
        _wr_simple(w, [1])  # dist map (1,0) -> dist 1
        c, l = g[20]
        w.code(c, l)
        left = n - 1
        while left:
            ln = min(left, 4096)
            c, l = g[256 + 23]
            w.code(c, l)
            w.u(ln - 3073, 10)
            left -= ln
        payload = _wrap_webp(w.payload())
        t0 = time.monotonic()
        got = _parse_webp(payload)
        t = time.monotonic() - t0
        assert got is not None and (got == got[0, 0]).all()
        print(f"  {wd}x{h} ({n / 1e6:.0f} MPix): {t:.2f}s = "
              f"{n / 1e6 / t:.0f} MPix/s ({len(payload)} payload bytes)")

    print("-- predictor inverse (transform alone) --")
    for side in (2048,):
        w = h = side
        sb = 4
        tw = (w + 15) >> 4
        th = (h + 15) >> 4
        out = rng.integers(0, 2 ** 32, w * h, dtype=np.uint32)
        for mode, label in ((13, "all-seq mode13 (SWAR floor)"),
                            (2, "all-vec mode2")):
            sub = np.full(tw * th, mode, dtype=np.uint32) << 8
            t0 = time.monotonic()
            _vp8l_unpredict(out.copy(), w, h, sb, sub, tw)
            t = time.monotonic() - t0
            print(f"  {label} {w * h / 1e6:.0f} MPix: {t:.2f}s = "
                  f"{w * h / 1e6 / t:.2f} MPix/s")


if __name__ == "__main__":
    main()
