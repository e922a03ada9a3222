"""Arithmetic-coded JPEG (SOF9, T.81 Annex D QM-coder + Annex F
models) — round 10's codec-boundary shrink. Validation strategy
(no arithmetic-JPEG sample files or codec libraries ship in this
container, documented in the module):

* QM-coder round-trip fuzz across context counts / skews / lengths;
* compression-rate sanity — the adaptive coder must approach the
  entropy of a skewed memoryless source (a mistranscribed Table D.3
  row breaks adaptation and fails this, while round-trip alone would
  still pass because encoder and decoder share the table);
* COEFFICIENT-exact block round-trip across precisions, restart
  intervals, and dense AC spectra;
* a Huffman-vs-arithmetic cross-check: the same image through two
  completely disjoint entropy coders must decode to the same mean;
* mutation fuzz over the entropy segment: corrupt streams return
  None or a finite value — never an exception, never a hang.
"""

import math
import random
import struct

from carbon_clickhouse_spark.datapipe.multimodal import (
    _QM_FIXED,
    _QM_TABLE,
    _QmDecoder,
    _QmEncoder,
    _arith_scan_blocks,
    _parse_jpeg_arith,
    decode_image,
    encode_jpeg_arith_blocks,
    encode_jpeg_arith_gray_blocks,
    encode_jpeg_gray_blocks,
)


def test_qe_table_invariants():
    assert len(_QM_TABLE) == 114
    for i, (qe, nmps, nlps, switch) in enumerate(_QM_TABLE):
        assert 0 < qe < 0x8000
        assert 0 <= nmps < 114 and 0 <= nlps < 114
        assert switch in (0, 1)
    # MPS switching happens exactly at the fast-attack states
    assert [i for i, t in enumerate(_QM_TABLE) if t[3]] == [
        0, 14, 36, 64, 80, 88, 95, 105, 110, 112,
    ]
    # the fixed bin self-loops and never switches
    assert _QM_TABLE[_QM_FIXED][1:] == (_QM_FIXED, _QM_FIXED, 0)
    # adaptation direction: an MPS renorm always sharpens the
    # estimate (Qe non-increasing); an LPS relaxes it (Qe
    # non-decreasing) except at the SWITCH states, where the MPS
    # sense flips and the chain restarts sharper for the flipped
    # sense — universal in Table D.3, so a transposed digit or a
    # swapped transition in the transcription trips here
    for i, (qe, nmps, nlps, s) in enumerate(_QM_TABLE[:113]):
        assert _QM_TABLE[nmps][0] <= qe, i
        if not s:
            assert _QM_TABLE[nlps][0] >= qe, i


def test_qm_roundtrip_fuzz():
    rng = random.Random(5)
    for _ in range(300):
        nctx = rng.randrange(1, 6)
        probs = [rng.choice((0.02, 0.1, 0.5, 0.9, 0.98)) for _ in range(nctx)]
        bits = [
            (c, 1 if rng.random() < probs[c] else 0)
            for c in (rng.randrange(nctx) for _ in range(rng.randrange(1, 1200)))
        ]
        enc = _QmEncoder()
        ebins = bytearray(nctx)
        for ctx, b in bits:
            enc.encode(ebins, ctx, b)
        stream = enc.flush()
        dec = _QmDecoder(stream, 0)
        dbins = bytearray(nctx)
        assert all(dec.decode(dbins, ctx) == b for ctx, b in bits)


def test_qm_compression_approaches_entropy():
    """p = 0.05 memoryless source: H = 0.286 bits/sym. The QM coder's
    documented inefficiency is ~5%; a wrong Qe/transition entry stalls
    adaptation and blows this bound (checked: zeroing one NMPS hop
    pushes the ratio past 1.3)."""
    rng = random.Random(9)
    n = 40000
    bits = [1 if rng.random() < 0.05 else 0 for _ in range(n)]
    enc = _QmEncoder()
    bins = bytearray(1)
    for b in bits:
        enc.encode(bins, 0, b)
    out = enc.flush()
    h = -(0.05 * math.log2(0.05) + 0.95 * math.log2(0.95))
    assert len(out) < 1.12 * h * n / 8


def _sos_end(p: bytes) -> int:
    i = 2
    while p[i + 1] != 0xDA:
        (ln,) = struct.unpack_from(">H", p, i + 2)
        i += 2 + ln
    return i + 2 + struct.unpack_from(">H", p, i + 2)[0]


def test_block_coefficients_roundtrip_exactly():
    rng = random.Random(17)
    for trial in range(60):
        nb = rng.randrange(1, 12)
        ri = rng.choice((0, 0, 2, 3, 5))
        prec = rng.choice((8, 8, 12))
        blocks = []
        for _ in range(nb):
            ac = [0] * 63
            for _ in range(rng.randrange(0, 30)):
                ac[rng.randrange(63)] = rng.choice(
                    (1, -1, 2, -2, rng.randrange(-2000, 2000))
                )
            blocks.append((rng.randrange(-4000, 4000), ac))
        p = encode_jpeg_arith_blocks(blocks, precision=prec, restart_interval=ri)
        coll = []
        got = _arith_scan_blocks(
            p, _sos_end(p), [(1, 1, 1, 0)], [(1, 0, 0)],
            {0: (0, 1)}, {0: 5}, 8, 8 * nb, ri, collect=coll,
        )
        assert got is not None, (trial, prec, ri)
        assert [c[0] for c in coll] == [b[0] for b in blocks], trial
        assert [c[1] for c in coll] == [b[1] for b in blocks], trial


def test_huffman_vs_arithmetic_cross_check():
    """The same constant-block image through the two disjoint entropy
    coders (canonical Huffman vs adaptive QM) must decode to the same
    (width, height, mean) — the strongest offline substitute for a
    third-party arithmetic stream."""
    rng = random.Random(23)
    for _ in range(20):
        vals = [rng.randrange(256) for _ in range(rng.randrange(1, 17))]
        wh, hh, mh = decode_image(encode_jpeg_gray_blocks(vals))
        wa, ha, ma = decode_image(encode_jpeg_arith_gray_blocks(vals))
        assert (wh, hh) == (wa, ha)
        assert mh == ma


def test_restart_and_precision_means():
    vals = [0, 255, 128, 1, 254, 97]
    got = _parse_jpeg_arith(
        encode_jpeg_arith_gray_blocks(vals, restart_interval=2)
    )
    assert got == (8, 48, sum(vals) / len(vals))
    v12 = [0, 4095, 2048, 123]
    got = _parse_jpeg_arith(
        encode_jpeg_arith_gray_blocks(v12, precision=12, restart_interval=3)
    )
    assert got is not None
    assert abs(got[2] - sum(v12) / len(v12) * 255 / 4095) < 1e-9


def test_decode_image_dispatch():
    p = encode_jpeg_arith_gray_blocks([10, 20, 30])
    assert decode_image(p) == (8, 24, 20.0)


def test_mutation_fuzz_never_raises():
    """Corrupt entropy bytes (past the SOS header, so the dims stay
    sane) must yield None or a finite tuple — no exception, no hang.
    Truncations too."""
    rng = random.Random(31)
    base = encode_jpeg_arith_gray_blocks(
        [rng.randrange(256) for _ in range(9)], restart_interval=3
    )
    start = _sos_end(base)
    for _ in range(300):
        buf = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            buf[rng.randrange(start, len(buf))] = rng.randrange(256)
        got = _parse_jpeg_arith(bytes(buf))
        if got is not None:
            w, h, m = got
            assert w == 8 and h == 72
            assert m is None or math.isfinite(m)
    for cut in range(start, len(base), 3):
        got = _parse_jpeg_arith(base[:cut])
        assert got is None or math.isfinite(got[2])


def test_progressive_coefficients_roundtrip_exactly():
    """SOF10: DC first (Al=1) + AC first + DC refine + AC refine must
    reconstruct every integer coefficient exactly, restarts included
    — newly-significant refinement coefficients, corrections, and
    negative DC bit-OR semantics all exercised by the random spectra."""
    from carbon_clickhouse_spark.datapipe.multimodal import (
        _arith_progressive_grids,
        encode_jpeg_arith_progressive,
    )

    rng = random.Random(47)
    for trial in range(50):
        nb = rng.randrange(1, 10)
        ri = rng.choice((0, 0, 2, 3))
        blocks = []
        for _ in range(nb):
            ac = [0] * 63
            for _ in range(rng.randrange(0, 25)):
                ac[rng.randrange(63)] = rng.choice(
                    (1, -1, 2, -2, 3, -3, rng.randrange(-1500, 1500))
                )
            blocks.append((rng.randrange(-3000, 3000), ac))
        p = encode_jpeg_arith_progressive(blocks, restart_interval=ri)
        got = _arith_progressive_grids(p)
        assert got is not None, (trial, ri)
        grids = got[5][1]
        for i, (dc, ac) in enumerate(blocks):
            blk = grids[(i, 0)]
            assert blk[0] == dc, (trial, i)
            assert blk[1:] == list(ac), (trial, i)


def test_progressive_vs_sequential_arithmetic_cross_check():
    """The same blocks through SOF9 (one scan) and SOF10 (four
    successive-approximation scans) must decode to identical
    (width, height, mean)."""
    from carbon_clickhouse_spark.datapipe.multimodal import (
        _parse_jpeg_arith_progressive,
        encode_jpeg_arith_progressive,
    )

    rng = random.Random(53)
    for _ in range(10):
        blocks = [
            (rng.randrange(-128, 128), [0] * 63)
            for _ in range(rng.randrange(1, 12))
        ]
        seq = _parse_jpeg_arith(encode_jpeg_arith_blocks(blocks))
        prog = _parse_jpeg_arith_progressive(
            encode_jpeg_arith_progressive(blocks)
        )
        assert seq == prog


def test_progressive_decode_image_dispatch():
    from carbon_clickhouse_spark.datapipe.multimodal import (
        encode_jpeg_arith_progressive,
    )

    p = encode_jpeg_arith_progressive([(-28, [0] * 63), (72, [0] * 63)])
    assert decode_image(p) == (8, 16, (100 + 200) / 2)


def test_progressive_mutation_fuzz_never_raises():
    from carbon_clickhouse_spark.datapipe.multimodal import (
        _parse_jpeg_arith_progressive,
        encode_jpeg_arith_progressive,
    )

    rng = random.Random(59)
    base = encode_jpeg_arith_progressive(
        [(rng.randrange(-100, 100), [0] * 63) for _ in range(6)],
        restart_interval=2,
    )
    start = _sos_end(base)
    for _ in range(200):
        buf = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            buf[rng.randrange(start, len(buf))] = rng.randrange(256)
        got = _parse_jpeg_arith_progressive(bytes(buf))
        if got is not None:
            assert math.isfinite(got[2])
    for cut in range(start, len(base), 7):
        got = _parse_jpeg_arith_progressive(base[:cut])
        assert got is None or math.isfinite(got[2])


def test_lossless_arithmetic_roundtrip_exactly():
    """SOF11 (Annex H.2 over the QM-coder): every predictor, point
    transforms, restart intervals, multi-component (SHARED statistics
    per DC table destination), 8/12/16-bit — exact reconstruction."""
    from carbon_clickhouse_spark.datapipe.multimodal import (
        _parse_jpeg_arith_lossless,
        encode_jpeg_arith_lossless,
    )

    rng = random.Random(61)
    for trial in range(60):
        ncomp = rng.choice((1, 2, 3))
        h, w = rng.randrange(1, 9), rng.randrange(1, 9)
        pred = rng.randrange(1, 8)
        pt = rng.choice((0, 0, 1, 2))
        ri = rng.choice((0, 0, 3, 5))
        prec = rng.choice((8, 8, 12, 16))
        planes = [
            [
                [rng.randrange(1 << prec) & ~((1 << pt) - 1) for _ in range(w)]
                for _ in range(h)
            ]
            for _ in range(ncomp)
        ]
        p = encode_jpeg_arith_lossless(
            planes, predictor=pred, pt=pt, precision=prec,
            restart_interval=ri,
        )
        got = _parse_jpeg_arith_lossless(p)
        assert got is not None, (trial, pred, pt, ri, prec)
        want = min(
            255.0,
            sum(v for r in planes[0] for v in r)
            / (w * h) * 255 / ((1 << prec) - 1),
        )
        assert (got[0], got[1]) == (w, h)
        assert abs(got[2] - want) < 1e-9, (trial, got[2], want)


def test_lossless_arithmetic_vs_huffman_cross_check():
    """The same plane through SOF3 (Huffman lossless) and SOF11
    (arithmetic lossless) shares the H.1 prediction layer — identical
    (width, height, mean) through disjoint entropy coders."""
    from carbon_clickhouse_spark.datapipe.multimodal import (
        _parse_jpeg_arith_lossless,
        _parse_jpeg_lossless,
        encode_jpeg_arith_lossless,
        encode_jpeg_lossless,
    )

    rng = random.Random(67)
    for _ in range(10):
        h, w = rng.randrange(2, 9), rng.randrange(2, 9)
        pred = rng.randrange(1, 8)
        plane = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        hm = _parse_jpeg_lossless(encode_jpeg_lossless([plane], predictor=pred))
        am = _parse_jpeg_arith_lossless(
            encode_jpeg_arith_lossless([plane], predictor=pred)
        )
        assert hm == am


def test_lossless_arithmetic_mutation_fuzz():
    from carbon_clickhouse_spark.datapipe.multimodal import (
        _parse_jpeg_arith_lossless,
        encode_jpeg_arith_lossless,
    )

    rng = random.Random(71)
    plane = [[rng.randrange(256) for _ in range(8)] for _ in range(6)]
    base = encode_jpeg_arith_lossless([plane], predictor=4, restart_interval=5)
    start = _sos_end(base)
    for _ in range(200):
        buf = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            buf[rng.randrange(start, len(buf))] = rng.randrange(256)
        got = _parse_jpeg_arith_lossless(bytes(buf))
        if got is not None:
            assert math.isfinite(got[2])
    for cut in range(start, len(base), 5):
        got = _parse_jpeg_arith_lossless(base[:cut])
        assert got is None or math.isfinite(got[2])


def test_hierarchical_yields_dims_with_null_mean():
    """The one remaining JPEG boundary: a hierarchical stream (DHP +
    differential SOF5 frame) surfaces real dimensions with a NULL
    mean through decode_image — no exception, no guess."""

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    frame = struct.pack(">BHHB", 8, 24, 16, 1) + bytes([1, 0x11, 0])
    payload = (
        b"\xff\xd8"
        + seg(0xDE, frame)   # DHP
        + seg(0xC5, frame)   # differential sequential frame
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + b"\xff\xd9"
    )
    assert decode_image(payload) == (16, 24, None)


def test_corrupt_dims_bounded():
    """A mutated dims field must abort via the MCU sanity cap rather
    than grinding through synthesized zero-bit decisions."""
    base = bytearray(encode_jpeg_arith_gray_blocks([5, 6, 7]))
    # SOF9 height field: find marker 0xC9, height at offset +4
    i = 2
    while base[i + 1] != 0xC9:
        (ln,) = struct.unpack_from(">H", base, i + 2)
        i += 2 + ln
    struct.pack_into(">HH", base, i + 4, 0xFFFF, 0xFFF8)
    assert _parse_jpeg_arith(bytes(base)) is None
