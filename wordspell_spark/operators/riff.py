"""Shared RIFF chunk walking — WAV (audio), AVI (video) and WebP all use
the same fourcc/size/even-padding chunk grammar; one walker means the
truncation and padding edge cases are fixed in exactly one place."""

from __future__ import annotations

import struct
from typing import Iterator


def walk_chunks(buf: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, body_start, size) over a RIFF chunk run, honoring
    even-byte padding; stops cleanly at a truncated tail."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        if pos + 8 + size > end:
            return
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)
