"""Pure-Python LZ4 frame codec for carbon-clickhouse chunk files.

The reference writer compresses finished RowBinary chunks as LZ4
*frames* (``writer/writer.go:228-240`` via ``github.com/pierrec/lz4``
v2, header ``BlockMaxSize: 4<<20`` at ``writer/writer.go:78-81``;
algo selection ``helper/config/compression.go:11-19``; files named
``default.<nanots>.lz4``). Every uploader and the cat/recover
utilities must therefore read ``.lz4`` chunks.

The container ships no lz4/xxhash modules, so this implements the
public LZ4 Frame Format v1.6.1 + LZ4 block format + xxHash32 from the
published specs. The compressor is a greedy hash-table matcher —
correctness and wire compatibility over ratio; decode handles every
frame option (content size/checksum, block checksums, any block max
size, skippable frames). Round-trips are cross-validated against the
``lz4`` CLI in tests.

Used executor-side by :mod:`.rowbinary` — each file decodes
independently inside a task, so the pure-Python cost parallelizes
across the cluster and is paid once per chunk, not per point.
"""

from __future__ import annotations

import struct

MAGIC = 0x184D2204
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F

# xxHash32 primes (public spec)
_P1, _P2, _P3, _P4, _P5 = (
    2654435761,
    2246822519,
    3266489917,
    668265263,
    374761393,
)
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 of ``data`` — the frame format's checksum function."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        limit = n - 16
        while i <= limit:
            lane1, lane2, lane3, lane4 = struct.unpack_from("<4I", data, i)
            v1 = (_rotl32((v1 + lane1 * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl32((v2 + lane2 * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl32((v3 + lane3 * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl32((v4 + lane4 * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        acc = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)
        ) & _M32
    else:
        acc = (seed + _P5) & _M32
    acc = (acc + n) & _M32
    while i + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, i)
        acc = (_rotl32((acc + lane * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        acc = (_rotl32((acc + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    acc ^= acc >> 15
    acc = (acc * _P2) & _M32
    acc ^= acc >> 13
    acc = (acc * _P3) & _M32
    acc ^= acc >> 16
    return acc


# ---------------------------------------------------------------------------
# LZ4 block format
# ---------------------------------------------------------------------------

def decompress_block(src: bytes, max_size: int | None = None) -> bytes:
    """Decode one LZ4 block (sequences of literals + matches)."""
    out = bytearray()
    i = 0
    n = len(src)
    while i < n:
        token = src[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        if lit_len:
            out += src[i : i + lit_len]
            i += lit_len
        if i >= n:
            break  # last sequence is literals-only
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("corrupt LZ4 block: zero offset")
        match_len = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise ValueError("corrupt LZ4 block: offset before start")
        # overlapping copy semantics (byte-at-a-time when overlapped)
        if offset >= match_len:
            out += out[start : start + match_len]
        else:
            for k in range(match_len):
                out.append(out[start + k])
        if max_size is not None and len(out) > max_size:
            raise ValueError("LZ4 block exceeds declared max size")
    return bytes(out)


def compress_block(src: bytes) -> bytes:
    """Greedy LZ4 block compressor (hash table over 4-byte windows).

    Honors the spec's end conditions: the last 5 bytes are literals,
    and no match starts within the last 12 bytes. Output may be
    incompressible-sized for high-entropy input; callers fall back to
    an uncompressed frame block when it doesn't shrink.
    """
    n = len(src)
    out = bytearray()
    if n == 0:
        return b"\x00"
    table: dict[int, int] = {}
    anchor = 0
    i = 0
    limit = n - 12  # matches may not start past here
    while limit >= 0 and i <= limit:
        key = src[i : i + 4]
        cand = table.get(hash(key))
        table[hash(key)] = i
        if (
            cand is not None
            and i - cand <= 0xFFFF
            and src[cand : cand + 4] == key
        ):
            # extend the match forward (stop 5 bytes before the end)
            m = i + 4
            c = cand + 4
            end = n - 5
            while m < end and src[m] == src[c]:
                m += 1
                c += 1
            match_len = m - i
            lit_len = i - anchor
            _emit_sequence(out, src, anchor, lit_len, i - cand, match_len)
            i = m
            anchor = m
        else:
            i += 1
    # trailing literals
    lit = n - anchor
    token_lit = 15 if lit >= 15 else lit
    out.append(token_lit << 4)
    if lit >= 15:
        rem = lit - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += src[anchor:]
    return bytes(out)


def _emit_sequence(
    out: bytearray, src: bytes, anchor: int, lit_len: int, offset: int, match_len: int
) -> None:
    ml = match_len - 4
    token = (15 if lit_len >= 15 else lit_len) << 4 | (15 if ml >= 15 else ml)
    out.append(token)
    if lit_len >= 15:
        rem = lit_len - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += src[anchor : anchor + lit_len]
    out.append(offset & 0xFF)
    out.append(offset >> 8)
    if ml >= 15:
        rem = ml - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)


# ---------------------------------------------------------------------------
# LZ4 frame format
# ---------------------------------------------------------------------------

_BD_SIZES = {4: 64 * 1024, 5: 256 * 1024, 6: 1024 * 1024, 7: 4 * 1024 * 1024}


def decompress_frame(data: bytes) -> bytes:
    """Decode a complete LZ4 frame stream (possibly several frames
    back-to-back, as produced by appending writers)."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        (magic,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
            (size,) = struct.unpack_from("<I", data, pos)
            pos += 4 + size
            continue
        if magic != MAGIC:
            raise ValueError(f"bad LZ4 frame magic: {magic:#x}")
        flg = data[pos]
        bd = data[pos + 1]
        pos += 2
        version = flg >> 6
        if version != 1:
            raise ValueError(f"unsupported LZ4 frame version {version}")
        block_checksum = bool(flg & 0x10)
        content_size_flag = bool(flg & 0x08)
        content_checksum = bool(flg & 0x04)
        dict_id_flag = bool(flg & 0x01)
        bmax = _BD_SIZES.get((bd >> 4) & 0x7)
        if bmax is None:
            raise ValueError("bad LZ4 frame BD byte")
        header_start = pos - 2
        if content_size_flag:
            pos += 8
        if dict_id_flag:
            pos += 4
        hc = data[pos]
        expect = (xxh32(data[header_start:pos]) >> 8) & 0xFF
        if hc != expect:
            raise ValueError("LZ4 frame header checksum mismatch")
        pos += 1
        while True:
            (bsize,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if bsize == 0:  # EndMark
                break
            uncompressed = bool(bsize & 0x80000000)
            bsize &= 0x7FFFFFFF
            blob = data[pos : pos + bsize]
            pos += bsize
            if block_checksum:
                (bchk,) = struct.unpack_from("<I", data, pos)
                pos += 4
                if xxh32(blob) != bchk:
                    raise ValueError("LZ4 block checksum mismatch")
            out += blob if uncompressed else decompress_block(blob, bmax)
        if content_checksum:
            (cchk,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxh32(bytes(out)) != cchk:
                raise ValueError("LZ4 content checksum mismatch")
    return bytes(out)


def compress_frame(
    data: bytes,
    block_max_size: int = 4 << 20,
    content_checksum: bool = True,
) -> bytes:
    """Encode ``data`` as one LZ4 frame, mirroring the reference
    writer's header (4 MiB independent blocks, content checksum —
    pierrec/lz4 v2 defaults)."""
    bd_code = next(
        (c for c, s in sorted(_BD_SIZES.items()) if s >= block_max_size), 7
    )
    flg = (1 << 6) | (0x04 if content_checksum else 0)
    bd = bd_code << 4
    header = bytes([flg, bd])
    out = bytearray(struct.pack("<I", MAGIC))
    out += header
    out.append((xxh32(header) >> 8) & 0xFF)
    bmax = _BD_SIZES[bd_code]
    for off in range(0, len(data), bmax):
        chunk = data[off : off + bmax]
        comp = compress_block(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            out += comp
        else:
            out += struct.pack("<I", len(chunk) | 0x80000000)
            out += chunk
    out += struct.pack("<I", 0)  # EndMark
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)
