"""Mergeable Bloom filter kernel (pure numpy, vectorized).

Reproduces the semantics of the reference's Bloom component
(/root/reference/components/bloomfilter/component.go:44-138): sized from an
element-count estimate and a target false-positive rate (``NewWithEstimates``,
component.go:52), Add/Test with zero false negatives, byte-blob persistence.
Default FPR mirrors the reference's 0.005 (component.go:16); builder examples
use 0.01 (examples/indexbuilder/main.go:20).

Differences by design (Spark-first, SURVEY.md §2.11):

* batch-vectorized ``update`` over numpy arrays, not per-element ``Add``;
* ``merge`` = bitwise OR of bit arrays with identical geometry — the UDAF
  merge contract (SURVEY.md §2.9 U3);
* explicit versioned little-endian payload instead of Go gob.

State layout: ``m`` bits kept as a boolean array in memory (scatter-fast
updates — the build path sets ~k bits per element per Arrow batch, and
pack/unpack per update would dominate), packed to little-endian u64 words
only at the serde boundary.  ``k`` hash functions via Kirsch–Mitzenmacher
double hashing (hashing.py).
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import numpy as np

from . import serde
from .hashing import dedupe_values, double_hash, row_hash_u32_matrix, splitmix64

DEFAULT_FPR = 0.005  # reference default, component.go:16

_U64 = np.uint64
_PARAMS = struct.Struct("<QI")  # m_bits, k
_MAX_SPARSE_M = 1 << 31  # sparse wire form only below this m (see serialize)


def optimal_m_k(n: int, p: float) -> tuple[int, int]:
    """Optimal bit count / hash count for n elements at FPR p.

    Same formulas bits-and-blooms uses under ``NewWithEstimates``.
    """
    n = max(1, int(n))
    m = max(64, int(math.ceil(-n * math.log(p) / (math.log(2) ** 2))))
    m = ((m + 63) // 64) * 64  # whole u64 words
    k = max(1, round((m / n) * math.log(2)))
    return m, k


@dataclass
class BloomState:
    m: int  # number of bits
    k: int  # number of hash functions
    bits: np.ndarray  # bool array, length m (packed to u64 words on serialize)

    def copy(self) -> "BloomState":
        return BloomState(self.m, self.k, self.bits.copy())


def create(n_estimate: int = 1_000_000, fpr: float = DEFAULT_FPR, *, m: int | None = None, k: int | None = None) -> BloomState:
    if m is None or k is None:
        m, k = optimal_m_k(n_estimate, fpr)
    return BloomState(m, k, np.zeros(m, dtype=bool))


def _set_bits(state: BloomState, h1: np.ndarray, h2: np.ndarray) -> None:
    if h1.size == 0:
        return
    m = _U64(state.m)
    for i in range(state.k):
        idx = (h1 + _U64(i) * h2) % m
        state.bits[idx.astype(np.int64)] = True


def _test_bits(state: BloomState, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    if h1.size == 0:
        return np.empty(0, dtype=bool)
    m = _U64(state.m)
    out = np.ones(h1.shape, dtype=bool)
    for i in range(state.k):
        idx = (h1 + _U64(i) * h2) % m
        out &= state.bits[idx.astype(np.int64)]
    return out


def update(state: BloomState, values) -> BloomState:
    """Insert a batch of values (str / bytes / int / float array).

    Duplicate values are dropped before hashing (numeric batches) or before
    the k-probe scatter (string batches) — bit-setting is idempotent and
    Zipfian batches are mostly repeats, so this cuts the dominant hash +
    random-write cost by the batch's duplication factor."""
    vals = np.asarray(values)
    if vals.dtype.kind in "iuf":
        h1, h2 = double_hash(dedupe_values(vals))
        _set_bits(state, h1, h2)
        return state
    h1, h2 = double_hash(values)
    u1, first = np.unique(h1, return_index=True)
    _set_bits(state, u1, h2[first])
    return state


def update_hashes(state: BloomState, h1: np.ndarray, *, dedupe: bool = True) -> BloomState:
    """Insert pre-hashed 64-bit keys (e.g. row_hash_u32_matrix output).

    ``dedupe=True`` (default) drops repeated hashes before the k-probe
    scatter — a 10× win on Zipfian token batches where the batch is mostly
    repeats.  Callers whose hashes are already near-distinct (the SymSpell
    deletion-neighborhood path) pass ``dedupe=False``: there the O(n log n)
    sort is pure overhead and bit-setting is idempotent anyway, so the
    filter contents are identical either way.
    """
    h1 = h1.astype(_U64, copy=False)
    if dedupe:
        h1 = np.unique(h1)
    _set_bits(state, h1, splitmix64(h1) | _U64(1))
    return state


def update_unique_hashes(state: BloomState, uh: np.ndarray, counts: np.ndarray | None = None) -> BloomState:
    """Shared-hash fast path (multi-kind harness): ``uh`` are DISTINCT
    ``hash64`` keys of the batch.  ``counts`` is accepted for signature
    uniformity across kinds and ignored — bit-setting is idempotent.
    Bit-identical to ``update(values)``: every probe index derives from h1."""
    return update_hashes(state, uh, dedupe=False)


def update_u32_rows(state: BloomState, mat: np.ndarray, valid_len: np.ndarray | None = None) -> BloomState:
    """Insert each row of a (n, L) uint32 matrix as one set element.

    This is the fast path for SymSpell deletion neighborhoods: candidate
    generation emits codepoint/token matrices and we never materialize
    Python strings (input_hint: no per-row Python).  Deletion neighborhoods
    of distinct words are near-distinct, so the idempotent-update dedupe is
    skipped (measured: the sort costs ~10% on unique batches, saves nothing).
    """
    return update_hashes(state, row_hash_u32_matrix(mat, valid_len), dedupe=False)


def contains(state: BloomState, values) -> np.ndarray:
    """Vectorized membership test — no false negatives, FPR-bounded positives.

    Parity: ``Test`` at components/bloomfilter/component.go:86-94.
    """
    h1, h2 = double_hash(values)
    return _test_bits(state, h1, h2)


def contains_hashes(state: BloomState, h1: np.ndarray) -> np.ndarray:
    h1 = h1.astype(_U64, copy=False)
    return _test_bits(state, h1, splitmix64(h1) | _U64(1))


def merge(a: BloomState, b: BloomState) -> BloomState:
    """Set-union of two filters — requires identical geometry."""
    if (a.m, a.k) != (b.m, b.k):
        raise serde.SketchFormatError(f"bloom geometry mismatch: ({a.m},{a.k}) vs ({b.m},{b.k})")
    return BloomState(a.m, a.k, a.bits | b.bits)


def fill_ratio(state: BloomState) -> float:
    return float(state.bits.sum()) / state.m


def approx_fpr(state: BloomState) -> float:
    """Current effective false-positive probability given fill ratio."""
    return float(fill_ratio(state) ** state.k)


def serialize(state: BloomState) -> bytes:
    """Dense packed-bit or sparse wire form, whichever is smaller.

    Sparse body: u32 count, then count ascending u32 set-bit indices —
    chosen deterministically whenever ``4*set_bits + 4 < m/8`` (and m fits
    u32 indexing).  Why: the filter is sized once for the FULL expected
    element count (the reference's NewWithEstimates discipline), so a
    partial built from one partition's slice of one group carries a huge,
    almost-empty bit array — at n_estimate=200k that is ~430 KB dense per
    (partition, group) payload; a partition that saw 100 items serializes
    to ~5 KB sparse.  In-memory state stays a bool array; merge (OR) and
    contains() are unchanged."""
    params = _PARAMS.pack(state.m, state.k)
    # cheap gate first (no index materialization on the dense/saturated
    # path); the _MAX_SPARSE_M cap bounds what a corrupt sparse payload can
    # force deserialize to allocate — serialize applies the same cap so
    # every emitted payload stays round-trippable
    n_set = int(np.count_nonzero(state.bits))
    if state.m <= _MAX_SPARSE_M and 4 * n_set + 4 < state.m // 8:
        nz = np.flatnonzero(state.bits)
        body = struct.pack("<I", nz.size) + np.ascontiguousarray(nz, dtype="<u4").tobytes()
        return serde.pack_header(serde.KIND_BLOOM, params, serde.FLAG_SPARSE) + body
    packed = np.packbits(state.bits, bitorder="little")  # LSB-first == old u64-word layout
    return serde.pack_header(serde.KIND_BLOOM, params) + packed.tobytes()


def deserialize(payload: bytes) -> BloomState:
    kind, flags, params, body = serde.unpack_header_full(payload)
    if kind != serde.KIND_BLOOM:
        raise serde.SketchFormatError(f"not a bloom payload (kind={kind})")
    if flags & ~serde.FLAG_SPARSE:
        raise serde.SketchFormatError(f"unknown bloom flags 0x{flags:04x}")
    m, k = _PARAMS.unpack(params)
    if flags & serde.FLAG_SPARSE:
        if m > _MAX_SPARSE_M:
            # a 30-byte corrupt payload must not force a giant allocation;
            # legit filters above the cap always serialize dense, where the
            # body-size cross-check rejects a lying header for free
            raise serde.SketchFormatError(f"sparse bloom m={m} above cap {_MAX_SPARSE_M}")
        if len(body) < 4 or (len(body) - 4) % 4:
            raise serde.SketchFormatError("sparse bloom body size mismatch")
        (n,) = struct.unpack_from("<I", body, 0)
        idx = np.frombuffer(body[4:], dtype="<u4").astype(np.int64)
        if idx.size != n:
            raise serde.SketchFormatError("sparse bloom body size mismatch")
        if idx.size and (idx[-1] >= m or (np.diff(idx) <= 0).any()):
            raise serde.SketchFormatError("sparse bloom indices not ascending in range")
        bits = np.zeros(m, dtype=np.bool_)
        bits[idx] = True
        return BloomState(m, k, bits)
    raw = np.frombuffer(body, dtype=np.uint8)
    if raw.size != m // 8:
        raise serde.SketchFormatError("bloom body size mismatch")
    bits = np.unpackbits(raw, bitorder="little").view(np.bool_)
    return BloomState(m, k, bits)
