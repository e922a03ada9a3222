"""Hierarchical JPEG (T.81 Annex K) — round 11's codec-boundary
shrink: the NON-DIFFERENTIAL first frame of a DHP stream decodes for
real (spliced out and routed through the same flat decoders), while
differential refinement frames stay fenced behind the pinned
dims + NULL-mean boundary. Validation follows the lossless/arith
discipline: round-trips across every first-frame mode the flat
encoders cover, a DHP-dims-take-precedence arm, the spec-invalid
orderings, and the mutation/truncation fuzz arm."""

import math
import random
import struct

from carbon_clickhouse_spark.datapipe.multimodal import (
    _parse_jpeg_hierarchical,
    decode_image,
    encode_jpeg_gray_blocks,
    encode_jpeg_hierarchical,
)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def test_first_frame_decodes_all_modes():
    """Every first-frame mode x restart x refinement combination
    yields DHP dims + the exact closed-form mean — identical to the
    flat encoder's contract (constant blocks -> mean(values))."""
    vals = [10, 200, 99, 31, 250]
    exp = sum(vals) / len(vals)
    for first in ("baseline", "arith", "lossless"):
        for ri in (0, 2):
            for ref in (True, False):
                p = encode_jpeg_hierarchical(
                    vals, first=first, restart_interval=ri, refinement=ref
                )
                w, h, mean = decode_image(p)
                assert (w, h) == (8, 40), (first, ri, ref)
                assert mean is not None and abs(mean - exp) < 1e-9, (
                    first,
                    ri,
                    ref,
                    mean,
                )


def test_hierarchical_mean_bitwise_equals_flat():
    """The spliced first frame must decode through the SAME code path
    as the flat stream — bit-identical mean, not approximately."""
    vals = [7, 130, 255, 0, 64, 201]
    flat = decode_image(encode_jpeg_gray_blocks(vals))
    hier = decode_image(encode_jpeg_hierarchical(vals, first="baseline"))
    assert hier[2] == flat[2]
    assert (hier[0], hier[1]) == (flat[0], flat[1])


def test_dhp_dims_take_precedence_over_frame_dims():
    """When the hierarchy changes resolution, the reported dims are
    the DHP full-image declaration, not the (smaller) first frame's;
    the mean is the first frame's decoded (low-pass) mean."""
    vals = [50, 150]
    p = bytearray(encode_jpeg_hierarchical(vals, first="baseline"))
    # DHP body: marker(2)+len(2), precision at 6, height at 7, width 9
    assert p[2:4] == b"\xff\xde"
    struct.pack_into(">HH", p, 7, 64, 32)  # full image 32x64
    w, h, mean = decode_image(bytes(p))
    assert (w, h) == (32, 64)
    assert mean is not None and abs(mean - 100.0) < 1e-9


def test_differential_first_frame_keeps_null_mean_boundary():
    """Spec-invalid ordering (first frame differential SOF5): the r10
    pinned boundary — real DHP dims, NULL mean — survives."""
    frame = struct.pack(">BHHB", 8, 24, 16, 1) + bytes([1, 0x11, 0])
    payload = (
        b"\xff\xd8"
        + _seg(0xDE, frame)
        + _seg(0xC5, frame)
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + b"\xff\xd9"
    )
    assert _parse_jpeg_hierarchical(payload) == (16, 24, None)
    assert decode_image(payload) == (16, 24, None)


def test_exp_before_first_frame_is_fenced():
    """EXP before any SOF means the first frame expects a reference
    grid — differential by construction, so dims + NULL mean."""
    frame = struct.pack(">BHHB", 8, 24, 16, 1) + bytes([1, 0x11, 0])
    payload = (
        b"\xff\xd8"
        + _seg(0xDE, frame)
        + _seg(0xDF, bytes([0x10]))  # EXP: Eh=1, Ev=0
        + _seg(0xC0, frame)
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + b"\xff\xd9"
    )
    assert _parse_jpeg_hierarchical(payload) == (16, 24, None)


def test_non_hierarchical_streams_return_none():
    """Flat JPEGs (no DHP) and non-JPEG bytes must fall through to
    the flat parsers — _parse_jpeg_hierarchical stays out of the
    way."""
    flat = encode_jpeg_gray_blocks([1, 2, 3])
    assert _parse_jpeg_hierarchical(flat) is None
    assert _parse_jpeg_hierarchical(b"\x89PNG\r\n\x1a\n") is None
    assert _parse_jpeg_hierarchical(b"") is None
    # flat decode still works end to end
    assert decode_image(flat)[2] == 2.0


def _sos_start(buf: bytes) -> int:
    i = 2
    while buf[i + 1] != 0xDA:
        (ln,) = struct.unpack_from(">H", buf, i + 2)
        i += 2 + ln
    return i


def test_mutation_and_truncation_fuzz():
    """The lossless/arith fuzz discipline: random byte mutations in
    and after the first scan, and every truncation point, must never
    raise or return a non-finite mean — corrupt streams degrade to
    None or to dims + NULL mean."""
    rng = random.Random(43)
    base = encode_jpeg_hierarchical(
        [11, 222, 133, 4], first="baseline", restart_interval=2
    )
    start = _sos_start(base)
    for _ in range(300):
        buf = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            buf[rng.randrange(start, len(buf))] = rng.randrange(256)
        got = _parse_jpeg_hierarchical(bytes(buf))
        if got is not None and got[2] is not None:
            assert math.isfinite(got[2])
    for cut in range(4, len(base), 3):
        got = _parse_jpeg_hierarchical(base[:cut])
        if got is not None and got[2] is not None:
            assert math.isfinite(got[2])
    # header-region mutations too (marker walk robustness)
    for _ in range(300):
        buf = bytearray(base)
        buf[rng.randrange(2, start)] = rng.randrange(256)
        got = _parse_jpeg_hierarchical(bytes(buf))
        if got is not None and got[2] is not None:
            assert math.isfinite(got[2])
