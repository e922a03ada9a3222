"""Progressive-JPEG AC decode (round 8): coefficient-exact round
trips through BOTH encoder/decoder pairs, refinement edge cases, and
the Spark-side detail feature.

Validation strategy: the baseline pair (sequential encode -> full
coefficient decode) and the progressive pair (Annex G scan script
with successive approximation -> DC+AC band decode) are INDEPENDENT
code paths; both must reproduce the same input blocks exactly, so a
mirrored encode/decode misunderstanding in one pair is caught by the
other."""

import random

import pytest

from carbon_clickhouse_spark.datapipe.multimodal import (
    encode_jpeg_coeff_blocks,
    encode_jpeg_coeff_blocks_progressive,
    extract_image_detail,
    parse_jpeg_coefficients,
)


def _rand_blocks(rng, n, density, mag=300):
    out = []
    for _ in range(n):
        blk = [0] * 64
        blk[0] = rng.randrange(-600, 600)
        for k in range(1, 64):
            if rng.random() < density:
                blk[k] = rng.randrange(1, mag) * rng.choice((1, -1))
        out.append(blk)
    return out


def _decode_grid(payload):
    got = parse_jpeg_coefficients(payload)
    assert got is not None
    return got[4][1]


def test_roundtrip_property_both_pairs():
    rng = random.Random(11)
    for trial in range(40):
        blocks = _rand_blocks(
            rng, rng.randrange(1, 12), rng.choice((0.0, 0.02, 0.1, 0.3, 0.8))
        )
        want = {(i, 0): blk for i, blk in enumerate(blocks)}
        assert _decode_grid(encode_jpeg_coeff_blocks(blocks)) == want
        prog = encode_jpeg_coeff_blocks_progressive(
            blocks,
            dc_al=rng.choice((0, 1, 2)),
            ac_bands=rng.choice(
                (((1, 63),), ((1, 5), (6, 63)), ((1, 2), (3, 20), (21, 63)))
            ),
            ac_al=rng.choice((0, 1, 2, 3)),
        )
        assert _decode_grid(prog) == want, trial


def test_refinement_edges():
    """Hand-picked shapes that exercise every refinement branch:
    correction bits crossed by ZRL, newly-significant after long
    zero-history runs, EOB-run blocks owing correction bits, and a
    coefficient at the band's last slot."""
    cases = [
        # one big coeff (already significant at al=2) + one small that
        # only appears in the final refinement
        [[100] + [0] * 62 + [1]],
        # 17 leading zeros force ZRL in first scans; the significant
        # coefficient beyond them takes correction bits across ZRL
        [[50] + [0] * 17 + [200, 0, 3] + [0] * 43],
        # two blocks: first all-zero band (EOB run), second dense —
        # the run's correction bits flush before the next symbol
        [[10] + [0] * 63, [20] + [5, -5, 4, -4, 3, -3] + [0] * 57],
        # negative coefficients refining downward
        [[-30] + [-2, -3, -200] + [0] * 60],
        # alternating significant/insignificant across a band split
        [[0] + [9 if k % 3 == 0 else 0 for k in range(1, 64)]],
    ]
    for blocks in cases:
        want = {(i, 0): blk for i, blk in enumerate(blocks)}
        for ac_al in (1, 2, 3):
            for bands in (((1, 63),), ((1, 8), (9, 63))):
                got = _decode_grid(
                    encode_jpeg_coeff_blocks_progressive(
                        blocks, dc_al=1, ac_bands=bands, ac_al=ac_al
                    )
                )
                assert got == want, (blocks, ac_al, bands)


def test_long_eob_runs():
    """Hundreds of all-zero-band blocks exercise multi-bit EOBn
    symbols in first AND refinement scans."""
    blocks = [[i % 7] + [0] * 63 for i in range(300)]
    blocks[150][5] = 40  # one island of AC energy mid-run
    want = {(i, 0): blk for i, blk in enumerate(blocks)}
    assert _decode_grid(encode_jpeg_coeff_blocks(blocks)) == want
    got = _decode_grid(
        encode_jpeg_coeff_blocks_progressive(blocks, ac_al=2)
    )
    assert got == want


def test_mean_paths_agree_with_coefficients():
    """The existing DC-only mean features and the full coefficient
    decode agree on DC (same streams, different retention)."""
    from carbon_clickhouse_spark.datapipe.multimodal import (
        _parse_jpeg_exact,
        _parse_jpeg_progressive_exact,
    )

    blocks = [[7, 3, 0, -2] + [0] * 60, [-9] + [0] * 62 + [5]]
    base = encode_jpeg_coeff_blocks(blocks)
    w, h, (num, den) = _parse_jpeg_exact(base)
    assert (w, h) == (8, 16)
    # mean = (sum(DC)*q0 + 1024*blocks) / (8*blocks)
    assert (num, den) == ((7 - 9) * 8 + 1024 * 2, 16)
    prog = encode_jpeg_coeff_blocks_progressive(blocks)
    assert _parse_jpeg_progressive_exact(prog) == (8, 16, (num, den))


def test_extract_image_detail_spark(spark):
    import pandas as pd

    blocks_hi = [[10, 100, -50] + [0] * 61]   # strong AC energy
    blocks_flat = [[10] + [0] * 63]           # none
    rows = [
        (1, encode_jpeg_coeff_blocks_progressive(blocks_hi)),
        (2, encode_jpeg_coeff_blocks(blocks_flat)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in extract_image_detail(df).collect()
    }
    # dequantized energy: (100*8)^2 + (-50*8)^2, one block
    assert got[1]["ac_energy"] == 800.0**2 + 400.0**2
    assert got[1]["nonzero_ac"] == 2
    assert got[2]["ac_energy"] == 0.0 and got[2]["nonzero_ac"] == 0
    assert got[1]["width"] == 8 and got[1]["n_blocks"] == 1

    # the explicit boundary: non-JPEG payloads raise
    bad = spark.createDataFrame(
        [(3, b"P5 1 1 255 x")], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="JPEG"):
        extract_image_detail(bad).collect()


def test_video_features_accept_progressive_frames(spark):
    """An MJPEG-AVI whose frames are PROGRESSIVE JPEGs decodes through
    the same exact-rational mean path (r8: the baseline-only frame
    restriction is gone)."""
    from carbon_clickhouse_spark.datapipe.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg_gray_blocks_progressive,
        extract_video_features,
    )

    frames = [
        encode_jpeg_gray_blocks_progressive([100, 120]),
        encode_jpeg_gray_blocks_progressive([140, 160]),
    ]
    avi = encode_avi_mjpeg(frames, width=8, height=16)
    df = spark.createDataFrame(
        [(1, avi)], "doc_id long, payload binary"
    )
    r = extract_video_features(df).collect()[0]
    assert r["n_frames"] == 2
    assert r["mean_byte"] == (110.0 + 150.0) / 2


def test_refinement_overrun_returns_none():
    """A refinement-scan s=1 symbol whose zero-run lands past the
    band end is a malformed stream: the decoder must honor the None
    contract (ADVICE r8) instead of silently dropping the coefficient
    and decoding on with a wrong grid."""
    from carbon_clickhouse_spark.datapipe.multimodal import _decode_ac_scan

    comps = [(1, 1, 1, 0)]  # one 8x8 component -> one block
    scan = [(1, 0, 0)]
    # single Huffman code: "0" -> rs 0x21 (run 2, size 1) — two
    # zero-history skips starting at ss=62 overrun se=63
    huff = {(1, 0): {(1, 0): 0x21}}
    coef: dict = {}
    got = _decode_ac_scan(
        bytes([0b01000000, 0xFF, 0xD9]),
        0,
        comps,
        scan,
        huff,
        8,
        8,
        0,
        62,  # ss
        63,  # se
        1,  # ah -> refinement pass
        0,  # al
        coef,
    )
    assert got is None
