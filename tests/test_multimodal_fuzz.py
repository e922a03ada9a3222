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
    data=st.binary(max_size=64),
)
def test_netpbm_roundtrip(w, h, maxval, gray, comment, data):
    magic, ch = (b"P5", 1) if gray else (b"P6", 3)
    body = (data * ((w * h * ch) // max(len(data), 1) + 1))[: w * h * ch]
    hdr = magic + (b"\n# c\n" if comment else b"\n")
    payload = hdr + b"%d %d\n%d\n" % (w, h, maxval) + body
    got = _parse_netpbm(payload)
    assert got is not None
    gw, gh, mean = got
    assert (gw, gh) == (w, h)
    assert mean == (sum(body) / len(body) if body else 0.0)


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
