"""Versioned little-endian serialization for sketch payloads.

The reference persists its Bloom filter with Go's ``gob``
(components/bloomfilter/component.go:97-138) — opaque and Go-only.  We use an
explicit, documented little-endian layout instead so payloads are portable and
byte-stable across Python/numpy versions (SURVEY.md §7 "serialization
discipline").

Common header (12 bytes):

    magic   : 4 bytes  b"WSPK"
    version : u8       format version (bump on any layout/hash change)
    kind    : u8       sketch kind id (see KIND_*)
    flags   : u16      reserved, 0
    plen    : u32      length of the kind-specific params block

followed by the params block, followed by the kind-specific body.  ``merge``
MUST reject payloads whose (version, kind, params) differ — the analogue of
the reference fixing filter geometry up front via ``Reset(size)``
(components/bloomfilter/component.go:60-68).
"""

from __future__ import annotations

import struct

MAGIC = b"WSPK"
VERSION = 1

KIND_BLOOM = 1
KIND_HLL = 2
KIND_CMS = 3
KIND_KLL = 4
KIND_TDIGEST = 5
KIND_THETA = 6
KIND_FREQ = 7
KIND_SAMPLE = 8

KIND_NAMES = {
    KIND_BLOOM: "bloom",
    KIND_HLL: "hll",
    KIND_CMS: "cms",
    KIND_KLL: "kll",
    KIND_TDIGEST: "tdigest",
    KIND_THETA: "theta",
    KIND_FREQ: "freq",
    KIND_SAMPLE: "sample",
}

_HEADER = struct.Struct("<4sBBHI")

# flags bits (u16, previously reserved-0; readers that predate a flag MUST
# reject payloads carrying it rather than misparse the body — enforced by
# each kernel's deserialize checking the bits it understands)
FLAG_SPARSE = 0x0001  # kind-specific compact body for nearly-empty sketches


class SketchFormatError(ValueError):
    pass


def pack_header(kind: int, params: bytes, flags: int = 0) -> bytes:
    return _HEADER.pack(MAGIC, VERSION, kind, flags, len(params)) + params


def unpack_header_full(
    payload: bytes | bytearray | memoryview,
) -> tuple[int, int, bytes, memoryview]:
    """Return (kind, flags, params_bytes, body_memoryview)."""
    buf = memoryview(payload)
    if len(buf) < _HEADER.size:
        raise SketchFormatError(f"payload too short: {len(buf)} bytes")
    magic, version, kind, flags, plen = _HEADER.unpack_from(buf, 0)
    if magic != MAGIC:
        raise SketchFormatError(f"bad magic {magic!r}")
    if version != VERSION:
        raise SketchFormatError(f"unsupported version {version}")
    off = _HEADER.size
    params = bytes(buf[off : off + plen])
    return kind, flags, params, buf[off + plen :]


def unpack_header(payload: bytes | bytearray | memoryview) -> tuple[int, bytes, memoryview]:
    """Return (kind, params_bytes, body_memoryview); flag-carrying payloads
    must go through kernels that know their flags (see unpack_header_full)."""
    kind, flags, params, body = unpack_header_full(payload)
    if flags:
        raise SketchFormatError(f"unexpected header flags 0x{flags:04x} for this reader")
    return kind, params, body


def peek_kind(payload: bytes) -> int:
    kind, _, _, _ = unpack_header_full(payload)
    return kind
