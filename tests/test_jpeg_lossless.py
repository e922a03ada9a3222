"""Lossless JPEG (SOF3, T.81 Annex H) — round 9's codec-boundary
shrink. Validation mirrors the progressive-JPEG discipline: the
encoder/decoder pair round-trips arbitrary images (every predictor,
point transforms, restart intervals, multi-component, 16-bit), and a
HAND-DERIVED byte-level golden stream — categories, extension bits,
and predictions worked out from Annex H on paper, only the bit
packing automated — pins BOTH sides against the spec independently
of each other, so a mirrored misunderstanding cannot hide."""

import random
import struct

from carbon_clickhouse_spark.datapipe.multimodal import (
    _parse_jpeg_lossless,
    decode_image,
    encode_jpeg_lossless,
)


def _bits_to_bytes(bitstr: str) -> bytes:
    bitstr = bitstr.replace(" ", "")
    pad = (-len(bitstr)) % 8
    bitstr += "1" * pad  # JPEG pads with 1s
    out = bytearray()
    for i in range(0, len(bitstr), 8):
        b = int(bitstr[i : i + 8], 2)
        out.append(b)
        if b == 0xFF:
            out.append(0x00)  # byte stuffing
    return bytes(out)


def _golden_stream() -> tuple[bytes, list[list[int]]]:
    """2x2 grayscale, P=8, predictor 1, Pt 0, samples
    [[100, 101], [90, 200]] — worked by hand from Annex H:

    - (0,0): Px = default 2^(8-0-1) = 128, diff = -28 -> category 5,
      extension bits = (-28 - 1) & 31 = 3 -> 00011
    - (0,1): first line -> Px = Ra = 100, diff = +1 -> cat 1, bit 1
    - (1,0): first column -> Px = Rb = 100, diff = -10 -> cat 4,
      bits = (-10 - 1) & 15 = 5 -> 0101
    - (1,1): predictor 1 -> Px = Ra = 90, diff = +110 -> cat 7,
      bits = 110 -> 1101110

    DC table = 17 categories at code length 5, canonical: code(k)=k.
    """
    samples = [[100, 101], [90, 200]]
    out = bytearray(b"\xff\xd8")
    bits = [0, 0, 0, 0, 17] + [0] * 11
    body = bytes([0]) + bytes(bits) + bytes(range(17))
    out += bytes([0xFF, 0xC4]) + struct.pack(">H", len(body) + 2) + body
    sof = struct.pack(">BHHB", 8, 2, 2, 1) + bytes([1, 0x11, 0])
    out += bytes([0xFF, 0xC3]) + struct.pack(">H", len(sof) + 2) + sof
    scan = bytes([1, 1, 0x00, 1, 0, 0])  # Ns=1; comp 1; Ss=1 Se=0 Pt=0
    out += bytes([0xFF, 0xDA]) + struct.pack(">H", len(scan) + 2) + scan
    out += _bits_to_bytes(
        "00101 00011"   # cat 5, bits 3
        "00001 1"       # cat 1, bit 1
        "00100 0101"    # cat 4, bits 5
        "00111 1101110"  # cat 7, bits 110
    )
    out += b"\xff\xd9"
    return bytes(out), samples


def test_golden_stream_decodes_exactly():
    payload, samples = _golden_stream()
    got = _parse_jpeg_lossless(payload)
    assert got is not None
    w, h, mean = got
    want_mean = sum(sum(r) for r in samples) / 4
    assert (w, h) == (2, 2)
    assert abs(mean - want_mean) < 1e-12


def test_encoder_matches_hand_derivation_bit_for_bit():
    payload, samples = _golden_stream()
    assert encode_jpeg_lossless([samples], predictor=1) == payload


def _golden_dri_stream() -> tuple[bytes, list[list[int]]]:
    """3x4 grayscale, P=8, predictor 4 (Ra+Rb-Rc), Pt 0, DRI = 6 —
    worked by hand from T.81 H.1.1, which requires 1-D (Ra)
    prediction for the ENTIRE first line of each restart interval,
    not just the single sample after the RST marker (r9 advice; the
    DICOM/DNG-common conformant-encoder shape):

    interval 1 (rows 0-1, first_line = 0):
      (0,0) default 128, diff -28 -> cat5 + 00011
      (0,1) first line Ra=100, diff +2 -> cat2 + 10
      (0,2) Ra=102, diff +2 -> cat2 + 10
      (1,0) column 0 Rb=100, diff +10 -> cat4 + 1010
      (1,1) P4 = 110+102-100 = 112, diff -1 -> cat1 + 0
      (1,2) P4 = 111+104-102 = 113, diff -1 -> cat1 + 0
    RST0, interval 2 (rows 2-3, first_line = 2):
      (2,0) default 128, diff -8 -> cat4 + 0111
      (2,1) FIRST LINE OF INTERVAL -> Ra=120, diff +1 -> cat1 + 1
            (the old rule would predict P4 = 120+111-110 = 121,
            diff 0 -> cat0: a pre-fix decoder reconstructs 122 here
            and drifts to mean 116.75)
      (2,2) Ra=121, diff +1 -> cat1 + 1
      (3,0) column 0 Rb=120, diff +10 -> cat4 + 1010
      (3,1) P4 = 130+121-120 = 131, diff 0 -> cat0
      (3,2) P4 = 131+122-121 = 132, diff 0 -> cat0
    """
    samples = [
        [100, 102, 104],
        [110, 111, 112],
        [120, 121, 122],
        [130, 131, 132],
    ]
    out = bytearray(b"\xff\xd8")
    bits = [0, 0, 0, 0, 17] + [0] * 11
    body = bytes([0]) + bytes(bits) + bytes(range(17))
    out += bytes([0xFF, 0xC4]) + struct.pack(">H", len(body) + 2) + body
    sof = struct.pack(">BHHB", 8, 4, 3, 1) + bytes([1, 0x11, 0])
    out += bytes([0xFF, 0xC3]) + struct.pack(">H", len(sof) + 2) + sof
    out += bytes([0xFF, 0xDD]) + struct.pack(">HH", 4, 6)
    scan = bytes([1, 1, 0x00, 4, 0, 0])  # Ns=1; comp 1; pred 4, Pt 0
    out += bytes([0xFF, 0xDA]) + struct.pack(">H", len(scan) + 2) + scan
    out += _bits_to_bytes(
        "00101 00011"
        "00010 10"
        "00010 10"
        "00100 1010"
        "00001 0"
        "00001 0"
    )
    out += bytes([0xFF, 0xD0])
    out += _bits_to_bytes(
        "00100 0111"
        "00001 1"
        "00001 1"
        "00100 1010"
        "00000"
        "00000"
    )
    out += b"\xff\xd9"
    return bytes(out), samples


def test_golden_dri_stream_restart_first_line_is_1d():
    """Conformant externally-authored DRI stream (hand-encoded from
    H.1.1) decodes exactly; discriminates the restart first-line rule."""
    payload, samples = _golden_dri_stream()
    got = _parse_jpeg_lossless(payload)
    assert got is not None
    w, h, mean = got
    want_mean = sum(sum(r) for r in samples) / 12
    assert (w, h) == (3, 4)
    assert abs(mean - want_mean) < 1e-12  # 116.25; old rule: 116.75


def test_encoder_matches_dri_hand_derivation_bit_for_bit():
    payload, samples = _golden_dri_stream()
    assert (
        encode_jpeg_lossless([samples], predictor=4, restart_interval=6)
        == payload
    )


def test_roundtrip_property_all_predictors():
    rng = random.Random(11)
    for trial in range(40):
        ncomp = rng.choice((1, 2, 3))
        h, w = rng.randrange(1, 9), rng.randrange(1, 9)
        pred = rng.randrange(1, 8)
        pt = rng.choice((0, 0, 1, 2))
        ri = rng.choice((0, 0, 3, 5))
        planes = [
            [
                [rng.randrange(256) & ~((1 << pt) - 1) for _ in range(w)]
                for _ in range(h)
            ]
            for _ in range(ncomp)
        ]
        payload = encode_jpeg_lossless(
            planes, predictor=pred, pt=pt, restart_interval=ri
        )
        got = _parse_jpeg_lossless(payload)
        assert got is not None, (trial, pred, pt, ri)
        gw, gh, mean = got
        want = sum(v for p in planes for r in p for v in r) / (
            ncomp * w * h
        )
        assert (gw, gh) == (w, h)
        assert abs(mean - want) < 1e-9, (trial, mean, want)


def test_sixteen_bit_and_decode_image_integration():
    rng = random.Random(3)
    plane = [[rng.randrange(65536) for _ in range(6)] for _ in range(4)]
    payload = encode_jpeg_lossless([plane], predictor=4, precision=16)
    w, h, mean = _parse_jpeg_lossless(payload)
    want = sum(sum(r) for r in plane) / 24 * 255.0 / 65535
    assert (w, h) == (6, 4) and abs(mean - want) < 1e-9

    small = encode_jpeg_lossless([[[10, 20], [30, 40]]], predictor=7)
    assert decode_image(small) == (2, 2, 25.0)


def test_malformed_contracts():
    payload, _ = _golden_stream()
    # truncated entropy data
    assert _parse_jpeg_lossless(payload[:-4] + b"\xff\xd9") is None
    # predictor selector out of range (Ss = 0)
    bad = bytearray(payload)
    sos = bad.find(b"\xff\xda")
    bad[sos + 2 + 2 + 3] = 0  # Ss byte inside the scan header
    assert _parse_jpeg_lossless(bytes(bad)) is None
    # non-1x1 sampling rejected
    bad2 = bytearray(payload)
    sof = bad2.find(b"\xff\xc3")
    bad2[sof + 2 + 2 + 6 + 1] = 0x22  # HV byte of component 1
    assert _parse_jpeg_lossless(bytes(bad2)) is None
    # a baseline stream is not claimed by the lossless parser
    from carbon_clickhouse_spark.datapipe.multimodal import (
        encode_jpeg_coeff_blocks,
    )

    assert _parse_jpeg_lossless(
        encode_jpeg_coeff_blocks([[5] + [0] * 63])
    ) is None


def test_twelve_bit_extended_sequential():
    """SOF1 12-bit Huffman DCT (r9): exact byte-domain mean
    255/4095-scaled from the 12-bit DC sum; SOF0 at 12-bit stays
    rejected (baseline is 8-bit by definition); the 8-bit path is
    byte-identical to before."""
    import random

    from carbon_clickhouse_spark.datapipe.multimodal import (
        _parse_jpeg_exact,
        decode_image,
        encode_jpeg_gray_blocks,
        encode_jpeg_gray_blocks_12bit,
    )

    rng = random.Random(2)
    for _ in range(20):
        vals = [rng.randrange(4096) for _ in range(rng.randrange(1, 9))]
        ri = rng.choice((0, 0, 2))
        p = encode_jpeg_gray_blocks_12bit(vals, restart_interval=ri)
        w, h, mean = decode_image(p)
        want = (sum(vals) / len(vals)) * 255.0 / 4095.0
        assert (w, h) == (8, 8 * len(vals))
        assert abs(mean - want) < 1e-9

    assert decode_image(encode_jpeg_gray_blocks([10, 200, 45])) == (
        8,
        24,
        85.0,
    )

    bad = bytearray(encode_jpeg_gray_blocks_12bit([100]))
    i = bad.find(b"\xff\xc1")
    bad[i + 1] = 0xC0  # relabel SOF1 as SOF0
    assert _parse_jpeg_exact(bytes(bad)) is None


def test_twelve_bit_progressive():
    """SOF2 12-bit (r9): the progressive DC path carries the same
    precision threading as sequential — exact 255/4095-scaled mean;
    the 8-bit progressive path is unchanged."""
    import random

    from carbon_clickhouse_spark.datapipe.multimodal import (
        decode_image,
        encode_jpeg_gray_blocks_progressive,
    )

    assert decode_image(
        encode_jpeg_gray_blocks_progressive([10, 200, 45])
    ) == (8, 24, 85.0)

    rng = random.Random(4)
    for _ in range(15):
        vals = [rng.randrange(4096) for _ in range(rng.randrange(1, 8))]
        p = encode_jpeg_gray_blocks_progressive(vals, precision=12)
        w, h, mean = decode_image(p)
        want = (sum(vals) / len(vals)) * 255.0 / 4095.0
        assert (w, h) == (8, 8 * len(vals))
        assert abs(mean - want) < 1e-9
