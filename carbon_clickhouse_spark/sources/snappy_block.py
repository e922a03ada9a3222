"""Pure-Python snappy BLOCK format codec (the compression Prometheus
remote-write mandates — ``receiver/prometheus.go:181`` calls
``snappy.Decode`` on every request body).

Implements the public snappy format description
(google/snappy ``format_description.txt``): a little-endian base-128
uvarint preamble holding the uncompressed length, then a stream of
elements — literals and back-references ("copies") with 1/2/4-byte
offsets. Decompression is exact and validating (bad offsets, length
overruns, and preamble mismatches raise); compression emits the
all-literal encoding, which every conforming decoder accepts (the
spec requires no minimum compression), so tests and clients can
produce valid wire bodies without python-snappy.

This keeps the Prometheus live front dependency-free: a real
``remote_write`` client's snappy body decodes here in-process. When
python-snappy IS installed it is preferred (C speed); this module is
the fallback and the ground truth for tests.
"""

from __future__ import annotations


class SnappyError(ValueError):
    pass


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(data):
            raise SnappyError("truncated uvarint preamble")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 35:
            raise SnappyError("uvarint too long")


def _write_uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decompress(data: bytes) -> bytes:
    """Snappy block format -> raw bytes. Raises :class:`SnappyError`
    on any malformed input (mirrors the reference returning 400 on
    ``snappy.Decode`` failure)."""
    expected, pos = _read_uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59  # 60..63 -> 1..4 length bytes
                if pos + extra > n:
                    raise SnappyError("truncated literal length")
                ln = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise SnappyError("truncated literal body")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = 4 + ((tag >> 2) & 0x7)
            if pos >= n:
                raise SnappyError("truncated copy-1 offset")
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise SnappyError("truncated copy-2 offset")
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise SnappyError("truncated copy-4 offset")
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise SnappyError("copy offset out of range")
        # overlapping copies repeat the pattern: byte-at-a-time semantics
        start = len(out) - offset
        for i in range(ln):
            out.append(out[start + i])
    if len(out) != expected:
        raise SnappyError(
            f"decompressed length {len(out)} != preamble {expected}"
        )
    return bytes(out)


def compress(data: bytes) -> bytes:
    """Raw bytes -> valid snappy block stream (all-literal encoding;
    legal per the format spec, accepted by every decoder)."""
    out = bytearray(_write_uvarint(len(data)))
    pos, n = 0, len(data)
    while pos < n:
        ln = min(n - pos, 1 << 32)
        chunk = data[pos : pos + ln]
        pos += ln
        if ln <= 60:
            out.append(((ln - 1) << 2) | 0)
        else:
            nbytes = (max(ln - 1, 1).bit_length() + 7) // 8
            out.append(((59 + nbytes) << 2) | 0)
            out += (ln - 1).to_bytes(nbytes, "little")
        out += chunk
    return bytes(out)
