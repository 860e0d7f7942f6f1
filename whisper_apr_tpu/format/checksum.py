"""CRC-32 (IEEE 802.3) integrity checksum for .apr files.

The reference implements a table-driven CRC-32 in Rust
(reference: src/format/checksum.rs:20-90). That algorithm is bit-identical to
zlib's crc32, which the reference documents explicitly ("Compatible with
zlib"), so the host-side Python implementation simply delegates to
``zlib.crc32``.
"""

from __future__ import annotations

import zlib


def crc32(data: bytes) -> int:
    """CRC-32 of ``data`` (reference: src/format/checksum.rs crc32)."""
    return zlib.crc32(data) & 0xFFFFFFFF


class Crc32:
    """Streaming CRC-32 hasher (reference: src/format/checksum.rs:44-90)."""

    def __init__(self) -> None:
        self._state = 0

    def update(self, data: bytes) -> None:
        self._state = zlib.crc32(data, self._state)

    def finalize(self) -> int:
        return self._state & 0xFFFFFFFF
