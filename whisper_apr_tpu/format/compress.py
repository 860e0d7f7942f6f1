"""Pure-Python LZ4 block compression/decompression.

(reference: src/format/compress.rs — pure-Rust LZ4 block decompressor for
WASM, 64 KB blocks, sequence format documented at :1-22: token byte with
literal-length high nibble / match-length-minus-4 low nibble, 15-extension
bytes, 2-byte little-endian match offset, final block must end in literals.)

Host-side only (model files are decompressed once at load).
"""

from __future__ import annotations

import struct
from typing import List

from ..errors import FormatError

BLOCK_SIZE = 64 * 1024            # reference: compress.rs:27
MAX_BLOCK_SIZE = 4 * 1024 * 1024  # reference: compress.rs:30
LZ4_MAGIC = 0x184D2204            # reference: compress.rs:34
MIN_MATCH = 4


def decompress_block(compressed: bytes, decompressed_size: int) -> bytes:
    """Decompress one raw LZ4 block (reference: compress.rs decompress_block)."""
    if decompressed_size > MAX_BLOCK_SIZE:
        raise FormatError(
            f"decompressed size {decompressed_size} exceeds maximum "
            f"{MAX_BLOCK_SIZE}")
    src = compressed
    n = len(src)
    out = bytearray()
    i = 0
    while i < n:
        token = src[i]
        i += 1
        # literals
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if i >= n:
                    raise FormatError("truncated LZ4 literal length")
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        if i + lit_len > n:
            raise FormatError("truncated LZ4 literals")
        out += src[i: i + lit_len]
        i += lit_len
        if i >= n:
            break  # last sequence is literals-only
        # match
        if i + 2 > n:
            raise FormatError("truncated LZ4 match offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(out):
            raise FormatError(f"invalid LZ4 match offset {offset}")
        match_len = (token & 0x0F) + MIN_MATCH
        if (token & 0x0F) == 15:
            while True:
                if i >= n:
                    raise FormatError("truncated LZ4 match length")
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        # overlapping copy (byte-by-byte semantics)
        pos = len(out) - offset
        for _ in range(match_len):
            out.append(out[pos])
            pos += 1
        if len(out) > decompressed_size:
            raise FormatError("LZ4 output exceeds expected size")
    if len(out) != decompressed_size:
        raise FormatError(
            f"LZ4 size mismatch: got {len(out)}, expected {decompressed_size}")
    return bytes(out)


def compress_block(data: bytes) -> bytes:
    """Greedy hash-table LZ4 block compressor (valid block format; not
    ratio-optimal). The last sequence is always literal-only and the final
    5 bytes are literals, per the LZ4 spec."""
    n = len(data)
    if n == 0:
        return b"\x00"
    out = bytearray()
    table: dict = {}
    anchor = 0
    i = 0
    # matches may not start within the last 12 bytes (spec end constraints)
    limit = max(0, n - 12)

    def emit(lit_start: int, lit_end: int, match_off: int = 0,
             match_len: int = 0) -> None:
        lit_len = lit_end - lit_start
        tok_lit = 15 if lit_len >= 15 else lit_len
        tok_match = 0
        if match_len:
            m = match_len - MIN_MATCH
            tok_match = 15 if m >= 15 else m
        out.append((tok_lit << 4) | tok_match)
        if lit_len >= 15:
            rem = lit_len - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(data[lit_start:lit_end])
        if match_len:
            out.append(match_off & 0xFF)
            out.append((match_off >> 8) & 0xFF)
            m = match_len - MIN_MATCH
            if m >= 15:
                rem = m - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    while i < limit:
        key = data[i: i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF and \
                data[cand: cand + 4] == key:
            # extend the match (but leave the final 5 bytes as literals)
            match_len = 4
            max_len = n - 5 - i
            while match_len < max_len and \
                    data[cand + match_len] == data[i + match_len]:
                match_len += 1
            if match_len >= MIN_MATCH:
                emit(anchor, i, i - cand, match_len)
                i += match_len
                anchor = i
                continue
        i += 1
    # trailing literals
    emit(anchor, n)
    return bytes(out)


class Decompressor:
    """Streaming block decompressor (reference: compress.rs:37 Decompressor)."""

    def __init__(self) -> None:
        self._buffer = b""

    def decompress_block(self, compressed: bytes,
                         decompressed_size: int) -> bytes:
        self._buffer = decompress_block(compressed, decompressed_size)
        return self._buffer


def compress_blocks(data: bytes, block_size: int = BLOCK_SIZE) -> bytes:
    """Split into blocks and compress each: u32 compressed-size + u32
    original-size + payload per block (the framing the .apr ``compressed``
    flag implies — 64 KB blocks, reference: compress.rs:27)."""
    out = bytearray()
    for start in range(0, len(data), block_size):
        chunk = data[start: start + block_size]
        comp = compress_block(chunk)
        out += struct.pack("<II", len(comp), len(chunk))
        out += comp
    return bytes(out)


def decompress_blocks(data: bytes) -> bytes:
    """Inverse of compress_blocks."""
    out = bytearray()
    i = 0
    while i < len(data):
        if i + 8 > len(data):
            raise FormatError("truncated compressed block header")
        comp_size, orig_size = struct.unpack_from("<II", data, i)
        i += 8
        if i + comp_size > len(data):
            raise FormatError("truncated compressed block payload")
        out += decompress_block(data[i: i + comp_size], orig_size)
        i += comp_size
    return bytes(out)
