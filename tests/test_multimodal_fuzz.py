"""Property fuzz for the pure-Python media parsers: valid containers
round-trip exactly; arbitrary byte noise is never claimed by a real
decoder (returns None / falls through) and never crashes."""

import struct

from hypothesis import given, settings, strategies as st

from carbon_clickhouse_spark.datapipe.multimodal import (
    _parse_bmp,
    _parse_netpbm,
    _parse_wav,
    decode_image,
)


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(1, 64),
    h=st.integers(1, 64),
    maxval=st.integers(1, 255),
    gray=st.booleans(),
    comment=st.booleans(),
    data=st.binary(min_size=1, max_size=64),
)
def test_netpbm_roundtrip(w, h, maxval, gray, comment, data):
    magic, ch = (b"P5", 1) if gray else (b"P6", 3)
    body = (data * ((w * h * ch) // len(data) + 1))[: w * h * ch]
    hdr = magic + (b"\n# c\n" if comment else b"\n")
    payload = hdr + b"%d %d\n%d\n" % (w, h, maxval) + body
    got = _parse_netpbm(payload)
    assert got is not None
    gw, gh, mean = got
    assert (gw, gh) == (w, h)
    assert mean == sum(body) / len(body)
    # truncated pixel array (any shortfall) must be rejected, not
    # reported with fabricated statistics
    assert _parse_netpbm(payload[:-1]) is None


@settings(max_examples=300, deadline=None)
@given(noise=st.binary(max_size=128))
def test_noise_never_claimed_or_crashes(noise):
    # parsers must either reject (None) or return well-formed values;
    # decode_image with fake=True must always produce the deterministic
    # fake for anything the real decoders reject
    for parse in (_parse_netpbm, _parse_bmp):
        out = parse(noise)
        if out is not None:
            w, h, mean = out
            assert w > 0 and h > 0 and 0.0 <= mean <= 255.0
    _parse_wav(noise)  # must not raise
    w, h, m = decode_image(noise, fake=True)
    assert w >= 64 and h >= 64


@settings(max_examples=100, deadline=None)
@given(
    channels=st.integers(1, 2),
    rate=st.sampled_from([8000, 16000, 44100]),
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=32),
)
def test_wav_roundtrip(channels, rate, samples):
    if channels == 2 and len(samples) % 2:
        samples = samples + [0]
    body = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    info = _parse_wav(wav)
    assert info["n_channels"] == channels and info["sample_rate"] == rate
    assert info["n_samples"] == len(samples) // channels
    if samples:
        assert info["mean_abs_sample"] == sum(abs(s) for s in samples) / len(samples)


def _png_encode(width, height, color_type, rows, filters, plte=None):
    """Minimal PNG encoder for fixtures: per-row filter types applied
    per the spec, so the decoder's unfilter path is exercised for real."""
    import zlib

    from carbon_clickhouse_spark.datapipe.multimodal import _PNG_SIG, _png_chunk

    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bpp = ch
    prev = [0] * (width * ch)
    raw = b""
    for row, ft in zip(rows, filters):
        out = bytearray([ft])
        for i, x in enumerate(row):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                q = a + b - c
                pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out.append((x - pred) & 0xFF)
        raw += bytes(out)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    chunks = _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        chunks += _png_chunk(b"PLTE", plte)
    chunks += _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    return _PNG_SIG + chunks


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 16),
    color_type=st.sampled_from([0, 2, 4, 6]),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip_all_filters(w, h, color_type, seed):
    import random

    from carbon_clickhouse_spark.datapipe.multimodal import _parse_png

    rng = random.Random(seed)
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    rows = [[rng.randrange(256) for _ in range(w * ch)] for _ in range(h)]
    filters = [rng.randrange(5) for _ in range(h)]
    payload = _png_encode(w, h, color_type, rows, filters)
    got = _parse_png(payload)
    assert got is not None
    gw, gh, mean = got
    flat = [v for row in rows for v in row]
    assert (gw, gh) == (w, h)
    assert abs(mean - sum(flat) / len(flat)) < 1e-9
    # corrupt any single CRC byte -> rejected, never fabricated
    bad = bytearray(payload)
    bad[len(payload) - 5] ^= 0xFF  # inside IEND CRC
    assert _parse_png(bytes(bad)) is None
    # truncated -> rejected
    assert _parse_png(payload[: len(payload) // 2]) is None


def test_png_palette_and_noise():
    from carbon_clickhouse_spark.datapipe.multimodal import _parse_png

    plte = bytes(range(30))  # 10 RGB entries
    rows = [[r % 10 for r in range(5)] for _ in range(4)]
    payload = _png_encode(5, 4, 3, rows, [0, 0, 0, 0], plte=plte)
    w, h, mean = _parse_png(payload)
    expanded = [plte[v * 3 + k] for row in rows for v in row for k in range(3)]
    assert (w, h) == (5, 4)
    assert abs(mean - sum(expanded) / len(expanded)) < 1e-9
    # index past the palette -> rejected
    bad_rows = [[200] * 5] * 4
    assert _parse_png(_png_encode(5, 4, 3, bad_rows, [0] * 4, plte=plte)) is None
    # decode_image prefers the real PNG path over the fake
    from carbon_clickhouse_spark.datapipe.multimodal import decode_image

    assert decode_image(payload) == (w, h, mean)


@settings(max_examples=200, deadline=None)
@given(noise=st.binary(max_size=200))
def test_png_noise_never_claimed(noise):
    from carbon_clickhouse_spark.datapipe.multimodal import _PNG_SIG, _parse_png

    out = _parse_png(noise)
    assert out is None or (out[0] > 0 and out[1] > 0)
    out = _parse_png(_PNG_SIG + noise)
    assert out is None or (out[0] > 0 and out[1] > 0)


# --- JPEG (baseline, DC-mean decode) --------------------------------

from carbon_clickhouse_spark.datapipe.multimodal import (  # noqa: E402
    _JPEG_FIX_AC,
    _JPEG_FIX_DC,
    _JpegBitWriter,
    _jpeg_huff_encode_table,
    _parse_jpeg,
    encode_jpeg_gray_blocks,
)


@settings(max_examples=100, deadline=None)
@given(
    vals=st.lists(st.integers(0, 255), min_size=1, max_size=32),
    ri=st.integers(0, 5),
)
def test_jpeg_roundtrip_exact_mean(vals, ri):
    p = encode_jpeg_gray_blocks(vals, restart_interval=ri)
    got = _parse_jpeg(p)
    assert got is not None
    w, h, mean = got
    assert (w, h) == (8, 8 * len(vals))
    assert mean == sum(vals) / len(vals)
    # a truncated entropy stream must be rejected, not averaged short
    assert _parse_jpeg(p[: len(p) - 3]) is None


def _jpeg_with_ac(vals):
    """Variant of the fixture encoder that also emits one AC
    coefficient (run 0, size 1) plus a ZRL per block — the mean must
    not move, because every AC basis function integrates to zero."""
    base = encode_jpeg_gray_blocks(vals)
    head, entropy_and_eoi = base.split(b"\xff\xda", 1)
    sos_len = struct.unpack(">H", entropy_and_eoi[:2])[0]
    sos = entropy_and_eoi[: sos_len]
    dc_enc = _jpeg_huff_encode_table(*_JPEG_FIX_DC)
    ac_enc = _jpeg_huff_encode_table(*_JPEG_FIX_AC)
    w = _JpegBitWriter()
    pred = 0
    for v in vals:
        dcq = v - 128
        diff = dcq - pred
        pred = dcq
        s = abs(diff).bit_length()
        w.put(*dc_enc[s])
        if s:
            w.put(diff if diff >= 0 else diff - 1, s)
        w.put(*ac_enc[0x01])  # AC (run 0, size 1)
        w.put(1, 1)           # coefficient +1
        w.put(*ac_enc[0xF0])  # ZRL: 16 zero coefficients
        w.put(*ac_enc[0x01])  # another AC further in
        w.put(0, 1)           # coefficient -1
        w.put(*ac_enc[0x00])  # EOB
    w.pad()
    return head + b"\xff\xda" + sos + bytes(w.out) + b"\xff\xd9"


@settings(max_examples=50, deadline=None)
@given(vals=st.lists(st.integers(0, 255), min_size=1, max_size=16))
def test_jpeg_ac_coefficients_do_not_move_the_mean(vals):
    assert _parse_jpeg(_jpeg_with_ac(vals)) == _parse_jpeg(
        encode_jpeg_gray_blocks(vals)
    )


def test_jpeg_interleaved_three_component_scan():
    """Hand-built YCbCr 1x1-sampling baseline JPEG: three constant
    components per MCU; the reported mean is over the luma component
    only."""
    dc_enc = _jpeg_huff_encode_table(*_JPEG_FIX_DC)
    ac_enc = _jpeg_huff_encode_table(*_JPEG_FIX_AC)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    luma_vals, cb, cr = [10, 250], 99, 130
    h = 8 * len(luma_vals)
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes([8] * 64))
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, h, 8, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += seg(0xC4, bytes([0x00]) + bytes(_JPEG_FIX_DC[0]) + bytes(_JPEG_FIX_DC[1]))
    out += seg(0xC4, bytes([0x10]) + bytes(_JPEG_FIX_AC[0]) + bytes(_JPEG_FIX_AC[1]))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    w = _JpegBitWriter()
    preds = {1: 0, 2: 0, 3: 0}
    for i in range(len(luma_vals)):
        for cid, v in ((1, luma_vals[i]), (2, cb), (3, cr)):
            dcq = v - 128
            diff = dcq - preds[cid]
            preds[cid] = dcq
            s = abs(diff).bit_length()
            w.put(*dc_enc[s])
            if s:
                w.put(diff if diff >= 0 else diff - 1, s)
            w.put(*ac_enc[0x00])
    w.pad()
    out += w.out + b"\xff\xd9"
    got = _parse_jpeg(bytes(out))
    assert got == (8, h, sum(luma_vals) / len(luma_vals))


@settings(max_examples=300, deadline=None)
@given(noise=st.binary(min_size=0, max_size=128))
def test_jpeg_noise_never_claimed_or_crashes(noise):
    from carbon_clickhouse_spark.datapipe.multimodal import _parse_jpeg_dims

    assert _parse_jpeg(noise) is None
    assert _parse_jpeg(b"\xff\xd8" + noise) in (None,)
    # the dims-only walk must also never crash; a claim must carry
    # positive dimensions
    got = _parse_jpeg_dims(b"\xff\xd8" + noise)
    assert got is None or (got[0] > 0 and got[1] > 0)


def test_progressive_jpeg_yields_dims_null_mean():
    """A MALFORMED progressive JPEG — baseline entropy data relabeled
    SOF2, whose Ss=0/Se=63 scan is illegal in progressive mode (T.81
    G.1.1.1.1) — must refuse to decode and surface its REAL dimensions
    with a None mean instead of raising or guessing. (Well-formed
    SOF2 files now decode for real: test_datapipe.py::
    test_progressive_jpeg_dc_decode.)"""
    from carbon_clickhouse_spark.datapipe.multimodal import (
        _parse_jpeg_dims,
        decode_image,
    )

    base = encode_jpeg_gray_blocks([10, 20, 30])
    sof_at = base.index(b"\xff\xc0")
    prog = base[:sof_at] + b"\xff\xc2" + base[sof_at + 2 :]
    assert _parse_jpeg(prog) is None  # full decoder still refuses
    assert _parse_jpeg_dims(prog) == (8, 24)
    assert decode_image(prog) == (8, 24, None)
    # baseline path is unchanged
    assert decode_image(base) == (8, 24, 20.0)


# --- Video: MJPEG-in-AVI --------------------------------------------

from carbon_clickhouse_spark.datapipe.multimodal import (  # noqa: E402
    _parse_avi_mjpeg,
    encode_avi_mjpeg,
)


@settings(max_examples=60, deadline=None)
@given(
    frame_vals=st.lists(
        st.lists(st.integers(0, 255), min_size=1, max_size=4),
        min_size=1,
        max_size=6,
    )
)
def test_avi_mjpeg_roundtrip(frame_vals):
    hb = len(frame_vals[0])
    frames = [
        encode_jpeg_gray_blocks((vs * hb)[:hb]) for vs in frame_vals
    ]
    avi = encode_avi_mjpeg(frames, 8, 8 * hb)
    got = _parse_avi_mjpeg(avi)
    assert got is not None
    w, h, out_frames = got
    assert (w, h, len(out_frames)) == (8, 8 * hb, len(frames))
    assert out_frames == frames  # container walk is byte-exact
    # truncated container: no fabricated frames
    assert _parse_avi_mjpeg(avi[:30]) is None


@settings(max_examples=200, deadline=None)
@given(noise=st.binary(min_size=0, max_size=96))
def test_avi_noise_never_claimed_or_crashes(noise):
    assert _parse_avi_mjpeg(noise) is None
    assert _parse_avi_mjpeg(b"RIFF" + noise) is None


def test_avi_frames_operator_and_video_features(spark):
    from pyspark.sql import functions as F

    from carbon_clickhouse_spark.datapipe.multimodal import (
        attach_avi_payload,
        avi_frames,
        extract_image_features,
        extract_video_features,
    )

    docs = spark.createDataFrame(
        [(1, "ab"), (2, "abcde")], "doc_id long, text string"
    )
    feats = {r.doc_id: r for r in extract_video_features(
        attach_avi_payload(docs)
    ).collect()}
    # doc 1: nb=2 -> 3 frames, hb=3; doc 2: nb=5 -> 2 frames, hb=6
    assert feats[1].n_frames == 3 and feats[1].height == 24
    assert feats[2].n_frames == 2 and feats[2].height == 48
    exp1 = sum((2 + 37 * i + 11 * f) % 256 for f in range(3) for i in range(3)) / 9
    assert abs(feats[1].mean_byte - exp1) < 1e-9
    # frame sampler composes with the image decoder
    sampled = avi_frames(attach_avi_payload(docs), every_n_frames=2)
    per_frame = extract_image_features(
        sampled.select("doc_id", F.col("frame_bytes").alias("payload"))
    ).collect()
    # doc1 frames 0,2 ; doc2 frame 0
    assert len(per_frame) == 3
    means = sorted(round(r.mean_byte, 4) for r in per_frame)
    e10 = sum((2 + 37 * i) % 256 for i in range(3)) / 3
    e12 = sum((2 + 37 * i + 22) % 256 for i in range(3)) / 3
    e20 = sum((5 + 37 * i) % 256 for i in range(6)) / 6
    assert means == sorted(round(v, 4) for v in (e10, e12, e20))


def test_avi_deep_list_nesting_bounded():
    """Crafted deeply-nested LIST chains must return None (depth cap),
    never a RecursionError that would abort the Arrow batch."""
    inner = b"JUNK"
    for _ in range(5000):
        inner = b"LIST" + struct.pack("<I", len(inner) + 4) + b"xxxx" + inner
    payload = b"RIFF" + struct.pack("<I", len(inner) + 4) + b"AVI " + inner
    assert _parse_avi_mjpeg(payload) is None


@settings(max_examples=120, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    pred=st.integers(1, 7),
    pt=st.integers(0, 2),
    ri=st.sampled_from((0, 3, 7)),
    mut_pos=st.integers(0, 10_000),
    mut_val=st.integers(0, 255),
)
def test_lossless_jpeg_mutation_never_crashes(
    seed, pred, pt, ri, mut_pos, mut_val
):
    """Round-trip survives every predictor/point-transform/restart
    combination, and a single-byte mutation anywhere in the stream
    either still decodes (headers/means may legitimately change) or
    returns None — never raises. The malformed contract the whole
    multimodal surface promises."""
    import random

    from carbon_clickhouse_spark.datapipe.multimodal import (
        _parse_jpeg_lossless,
        encode_jpeg_lossless,
    )

    rng = random.Random(seed)
    h, w = rng.randrange(1, 7), rng.randrange(1, 7)
    plane = [
        [rng.randrange(256) & ~((1 << pt) - 1) for _ in range(w)]
        for _ in range(h)
    ]
    payload = encode_jpeg_lossless(
        [plane], predictor=pred, pt=pt, restart_interval=ri
    )
    got = _parse_jpeg_lossless(payload)
    assert got is not None and (got[0], got[1]) == (w, h)
    want = sum(sum(r) for r in plane) / (w * h)
    assert abs(got[2] - want) < 1e-9

    mutated = bytearray(payload)
    mutated[mut_pos % len(mutated)] = mut_val
    out = _parse_jpeg_lossless(bytes(mutated))  # must not raise
    assert out is None or (
        isinstance(out, tuple) and len(out) == 3
    )
