"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so each partition streams through Python in
vectorized batches (the only sane shape for CPU-bound media work on a
cluster: one task per partition, no driver involvement, linear scale).

Formats decoded for REAL, pure-Python (no imaging/audio libraries
needed): binary netpbm (P5 PGM / P6 PPM — full header + pixel-mean
decode), PNG (chunk walk + CRC check + zlib IDAT inflate + scanline
unfilter), BMP (BITMAPINFOHEADER dims + pixel-array mean), and WAV
(RIFF chunk walk: channels / sample rate / bit depth / duration /
mean absolute 16-bit sample). Formats that require a codec stack
(JPEG, video) raise ``NotImplementedError`` unless
``fake=True`` selects the deterministic byte-derived stand-in —
swapping in PIL/ffmpeg is a one-function change in
:func:`decode_image`.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("bits_per_sample", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("mean_abs_sample", T.DoubleType()),
    ]
)

# cyclic 0..255 pixel pattern used by the synthetic-PPM fixture; its
# mean has the closed form floor(n/256)*32640 + r*(r-1)/2 over n
# (r = n % 256), which the SQL oracle reproduces exactly
_PIX_CYCLE = bytes(range(256))


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Turn a text table into a media table (payload = utf-8 bytes of
    the text, no real container format) — fixture for the binary
    plumbing and the ``fake=True`` decoder path."""
    return df.select(
        F.col("doc_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("fake").alias("format"),
            F.length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def attach_ppm_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build REAL binary P6 PPM images deterministically from a text
    table: width 8, height 1 + (utf8len(text) % 64), pixel bytes the
    cyclic 0..255 pattern. The payloads are valid netpbm files any
    external viewer can open, and every feature the decoder extracts
    has a closed form over the text length — so a SQL oracle can check
    the REAL decode path end-to-end."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for t in pdf[text_col]:
                n_txt = len(t.encode("utf-8")) if t is not None else 0
                h = 1 + (n_txt % 64)
                n = 8 * h * 3
                body = (_PIX_CYCLE * (n // 256 + 1))[:n]
                p = b"P6\n8 %d\n255\n" % h + body
                payloads.append(p)
                metas.append({"format": "ppm", "n_bytes": len(p)})
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return df.select("doc_id", text_col).mapInPandas(gen, MEDIA_SCHEMA)


def attach_png_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build REAL 8-bit grayscale PNGs deterministically from a text
    table: width 8, height 1 + (utf8len(text) % 64), unfiltered pixel
    bytes the cyclic 0..255 pattern, scanlines filter-type 0, IDAT via
    ``zlib.compress`` (deterministic at a fixed level). Every decoded
    feature has the same closed form over text length as the PPM
    fixture (with n = 8*h gray bytes instead of 24*h RGB bytes), so a
    SQL oracle checks the real chunk-walk + inflate + unfilter path
    end-to-end."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for t in pdf[text_col]:
                n_txt = len(t.encode("utf-8")) if t is not None else 0
                h = 1 + (n_txt % 64)
                n = 8 * h
                body = (_PIX_CYCLE * (n // 256 + 1))[:n]
                raw = b"".join(
                    b"\x00" + body[r * 8 : (r + 1) * 8] for r in range(h)
                )
                ihdr = struct.pack(">IIBBBBB", 8, h, 8, 0, 0, 0, 0)
                p = (
                    _PNG_SIG
                    + _png_chunk(b"IHDR", ihdr)
                    + _png_chunk(b"IDAT", zlib.compress(raw, 6))
                    + _png_chunk(b"IEND", b"")
                )
                payloads.append(p)
                metas.append({"format": "png", "n_bytes": len(p)})
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return df.select("doc_id", text_col).mapInPandas(gen, MEDIA_SCHEMA)


def _parse_netpbm(payload: bytes) -> tuple[int, int, float] | None:
    """Binary netpbm (P5 gray / P6 RGB): parse the whitespace+comment
    header per the netpbm spec, return (width, height, mean of pixel
    bytes). maxval > 255 (2-byte samples) handled as raw byte mean."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        return None
    idx, vals = 2, []
    n = len(payload)
    while len(vals) < 3 and idx < n:
        while idx < n and payload[idx : idx + 1].isspace():
            idx += 1
        if payload[idx : idx + 1] == b"#":
            while idx < n and payload[idx] != 0x0A:
                idx += 1
            continue
        start = idx
        while idx < n and not payload[idx : idx + 1].isspace():
            idx += 1
        if idx == start:
            return None
        try:
            vals.append(int(payload[start:idx]))
        except ValueError:
            return None
    if len(vals) < 3:
        return None
    idx += 1  # exactly one whitespace byte after maxval
    width, height, maxval = vals
    if width <= 0 or height <= 0 or not 0 < maxval < 65536:
        return None  # signed/zero header tokens: not a valid netpbm
    channels = 3 if magic == b"P6" else 1
    per_sample = 2 if maxval > 255 else 1
    expected = width * height * channels * per_sample
    data = payload[idx : idx + expected]
    if len(data) < expected:
        return None  # truncated pixel array: don't fabricate statistics
    mean = sum(data) / len(data)
    return width, height, mean


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(cid: bytes, body: bytes) -> bytes:
    """Encode one PNG chunk (length + id + body + CRC32)."""
    return (
        struct.pack(">I", len(body))
        + cid
        + body
        + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
    )


def _parse_png(payload: bytes) -> tuple[int, int, float] | None:
    """Real PNG decode, pure stdlib: chunk walk with CRC32 verification,
    IDAT zlib inflate, per-scanline unfilter (filter types 0-4 per the
    PNG spec §9: None/Sub/Up/Average/Paeth), then mean over the
    reconstructed sample bytes. Palette images (color type 3) expand
    indices through PLTE before the mean so the statistic is over
    actual RGB values. Supported: 8/16-bit depths, all five color
    types, non-interlaced. Adam7 interlace and sub-byte depths fall
    through to the unknown-format path (returns None) rather than
    guessing."""
    if payload[:8] != _PNG_SIG:
        return None
    idx, n = 8, len(payload)
    width = height = bit_depth = color_type = None
    idat: list[bytes] = []
    plte: bytes | None = None
    while idx + 12 <= n:
        (size,) = struct.unpack_from(">I", payload, idx)
        if idx + 12 + size > n:
            return None  # truncated chunk
        cid = payload[idx + 4 : idx + 8]
        body = payload[idx + 8 : idx + 8 + size]
        (crc,) = struct.unpack_from(">I", payload, idx + 8 + size)
        if zlib.crc32(cid + body) & 0xFFFFFFFF != crc:
            return None  # corrupt chunk: refuse, don't fabricate
        if cid == b"IHDR":
            if size != 13:
                return None
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if comp != 0 or filt != 0 or interlace != 0:
                return None
            if color_type not in _PNG_CHANNELS or bit_depth not in (8, 16):
                return None
            if color_type == 3 and bit_depth != 8:
                return None
            if not 0 < width <= 1 << 20 or not 0 < height <= 1 << 20:
                return None
        elif cid == b"PLTE":
            plte = body
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"IEND":
            break
        idx += 12 + size
    if width is None or not idat:
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    bpp = _PNG_CHANNELS[color_type] * (bit_depth // 8)
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        return None  # wrong scanline payload size: corrupt/truncated
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ft = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif ft != 0:
            return None
        out += line
        prev = line
    if color_type == 3:
        if plte is None or len(plte) % 3:
            return None
        if out and max(out) * 3 + 3 > len(plte):
            return None  # index past the palette
        expanded = bytearray()
        for v in out:
            expanded += plte[v * 3 : v * 3 + 3]
        out = expanded
    mean = sum(out) / len(out) if out else 0.0
    return width, height, mean


def _parse_bmp(payload: bytes) -> tuple[int, int, float] | None:
    """BMP: BITMAPINFOHEADER-family width/height (signed; negative
    height = top-down) + mean over the pixel array at the declared
    offset. A bare 'BM' prefix is not enough to claim the format
    (document text can start with it): the DIB header size must be a
    known BITMAPINFO variant, the pixel offset must land inside the
    payload past the headers, and dimensions must be sane — otherwise
    fall through to the unknown-format path."""
    if payload[:2] != b"BM" or len(payload) < 54:
        return None
    pix_offset = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size not in (40, 52, 56, 64, 108, 124):
        return None
    if not 14 + dib_size <= pix_offset <= len(payload):
        return None
    width, height = struct.unpack_from("<ii", payload, 18)
    if width <= 0 or height == 0 or width > 1 << 20 or abs(height) > 1 << 20:
        return None
    data = payload[pix_offset:]
    mean = sum(data) / len(data) if data else 0.0
    return width, abs(height), mean


def _parse_wav(payload: bytes) -> dict | None:
    """WAV: walk RIFF chunks (any fmt/data order); fmt -> channels/
    rate/bits, data -> sample count + mean absolute sample. The mean
    is computed for PCM16 only and reported as None for other bit
    depths — a missing value, never a silently-wrong 0.0. A fmt chunk
    declaring zero channels/rate is rejected as malformed."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    idx, n = 12, len(payload)
    channels = rate = bits = None
    data_body = None
    while idx + 8 <= n:
        cid = payload[idx : idx + 4]
        size = struct.unpack_from("<I", payload, idx + 4)[0]
        body = payload[idx + 8 : idx + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            channels = struct.unpack_from("<H", body, 2)[0]
            rate = struct.unpack_from("<I", body, 4)[0]
            bits = struct.unpack_from("<H", body, 14)[0]
        elif cid == b"data":
            data_body = body
        idx += 8 + size + (size & 1)  # chunks are word-aligned
    if not channels or not rate or not bits:
        return None
    n_samples = 0
    mean_abs: float | None = None
    if data_body is not None:
        frame = channels * bits // 8
        n_samples = len(data_body) // frame if frame else 0
        if bits == 16 and len(data_body) >= 2:
            m = len(data_body) - len(data_body) % 2
            samples = struct.unpack(f"<{m // 2}h", data_body[:m])
            mean_abs = sum(abs(s) for s in samples) / (m // 2)
    return {
        "n_channels": channels,
        "sample_rate": rate,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_s": n_samples / rate,
        "mean_abs_sample": mean_abs,
    }


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, float]:
    """Decode one image payload -> (width, height, mean_byte).

    netpbm (P5/P6), PNG, and BMP decode for real in pure Python.
    Other formats need a codec library this container does not ship;
    they raise unless ``fake=True`` selects the deterministic
    byte-derived stand-in (pseudo-dimensions + hash-mean from payload
    length)."""
    out = _parse_netpbm(payload) or _parse_png(payload) or _parse_bmp(payload)
    if out is not None:
        return out
    if not fake:
        raise NotImplementedError(
            "only netpbm/PNG/BMP decode in pure Python; JPEG/video "
            "decode requires PIL/ffmpeg — pass fake=True or swap in "
            "a real decoder here"
        )
    n = len(payload)
    width = 64 + (n % 577)
    height = 64 + ((n * 31) % 577)
    mean_byte = (n * 2654435761 % 25600) / 100.0
    return width, height, mean_byte


def extract_image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas image feature extraction over binary payloads.

    Arrow streams each partition through Python in batches; output is
    a narrow features table. Partitioning of the input is preserved —
    repartition upstream by size if payloads are skewed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "mean_byte": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """mapInPandas WAV feature extraction (real RIFF parse): channel
    count, sample rate, bit depth, sample count, duration, mean
    absolute PCM16 sample. Non-WAV payloads raise."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                w = _parse_wav(p)
                if w is None:
                    raise NotImplementedError(
                        "extract_audio_features decodes WAV only"
                    )
                rows.append({"doc_id": doc_id, **w})
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: slice the payload at fixed strides
    (stand-in for video keyframe extraction) -> exploded
    (doc_id, frame_idx, frame_bytes). Pure column expressions."""
    n = F.length("payload")
    idxs = F.sequence(
        F.lit(0),
        F.least(F.floor(n / every_n_bytes).cast("int"), F.lit(max_frames - 1)),
    )
    return media.select(
        "doc_id",
        F.posexplode(
            F.transform(
                idxs,
                lambda i: F.substring(
                    F.col("payload"), (i * every_n_bytes + 1).cast("int"), every_n_bytes
                ),
            )
        ).alias("frame_idx", "frame_bytes"),
    )
