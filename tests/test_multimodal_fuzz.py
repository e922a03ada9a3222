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
