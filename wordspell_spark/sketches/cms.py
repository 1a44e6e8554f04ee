"""Mergeable count-min sketch kernel (pure numpy, vectorized).

Answers heavy-hitter token frequencies (BASELINE.json north_star) — the
sketch analogue of the reference's exact word-frequency index
(/root/reference/components/index/builder.go:224-246) whose additive merge
(components/index/models.go:58-72) is exactly the CMS merge contract:
counter-wise sum.

Cormode–Muthukrishnan guarantees with width w = ceil(e/ε), depth d =
ceil(ln(1/δ)): estimate ≥ true count, and ≤ true + ε·N with probability
1 − δ (N = total added weight).  Conservative update is deliberately NOT
used — it breaks merge linearity, and mergeability is the whole point here.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import numpy as np

from . import serde
from .hashing import double_hash, splitmix64

_U64 = np.uint64
_PARAMS = struct.Struct("<II")  # width, depth
_MAX_SPARSE_CELLS = 1 << 28  # sparse wire form only below this (see serialize)

DEFAULT_EPS = 1e-4
DEFAULT_DELTA = 1e-3


def dims_for(eps: float = DEFAULT_EPS, delta: float = DEFAULT_DELTA) -> tuple[int, int]:
    width = int(math.ceil(math.e / eps))
    depth = int(math.ceil(math.log(1.0 / delta)))
    return width, max(1, depth)


@dataclass
class CmsState:
    width: int
    depth: int
    counts: np.ndarray  # int64 (depth, width)
    total: int  # total added weight N (for the ε·N bound)

    def copy(self) -> "CmsState":
        return CmsState(self.width, self.depth, self.counts.copy(), self.total)


def create(eps: float = DEFAULT_EPS, delta: float = DEFAULT_DELTA, *, width: int | None = None, depth: int | None = None) -> CmsState:
    if width is None or depth is None:
        width, depth = dims_for(eps, delta)
    return CmsState(width, depth, np.zeros((depth, width), dtype=np.int64), 0)


def _row_idx(h1: np.ndarray, h2: np.ndarray, d: int, width: int) -> np.ndarray:
    """Bucket indices for depth row d — computed per row to avoid
    materializing the (depth, n) matrix (a 100s-of-MB transient on
    10M-value Arrow batches, which dominated the update profile)."""
    return ((h1 + _U64(d) * h2) % _U64(width)).astype(np.int64)


def update(state: CmsState, values, weights=None) -> CmsState:
    """Add a batch of values with optional integer weights (default 1)."""
    h1, h2 = double_hash(values)
    n = h1.size
    if n == 0:
        return state
    # bincount is the C fast path (np.add.at is ~20x slower); counts stay
    # exact — weighted bincount returns float64 but values are integral and
    # far below 2^53
    w = None if weights is None else np.asarray(weights, dtype=np.int64)
    for d in range(state.depth):
        idx = _row_idx(h1, h2, d, state.width)
        if w is None:
            state.counts[d] += np.bincount(idx, minlength=state.width).astype(np.int64)
        else:
            state.counts[d] += np.bincount(idx, weights=w, minlength=state.width).astype(np.int64)
    state.total += n if w is None else int(w.sum())
    return state


def update_unique_hashes(state: CmsState, uh: np.ndarray, counts: np.ndarray) -> CmsState:
    """Shared-hash fast path (multi-kind harness): ``uh`` are the batch's
    DISTINCT ``hash64`` keys, ``counts`` their multiplicities.

    Table-identical to ``update(values)``: every bucket index derives from
    (h1, h2 = splitmix64(h1)|1), and the weighted bincount adds exactly the
    per-key occurrence totals the unweighted path accumulates one by one.
    The bincounts also run over the distinct set only — on Zipfian token
    batches that is 4-15x fewer index rows per depth."""
    n = uh.size
    if n == 0:
        return state
    h1 = uh.astype(_U64, copy=False)
    h2 = splitmix64(h1) | _U64(1)
    w = np.asarray(counts, dtype=np.int64)
    for d in range(state.depth):
        idx = _row_idx(h1, h2, d, state.width)
        state.counts[d] += np.bincount(idx, weights=w, minlength=state.width).astype(np.int64)
    state.total += int(w.sum())
    return state


def query(state: CmsState, values) -> np.ndarray:
    """Vectorized point estimates: min over depth rows (never undercounts)."""
    h1, h2 = double_hash(values)
    if h1.size == 0:
        return np.empty(0, dtype=np.int64)
    est = state.counts[0][_row_idx(h1, h2, 0, state.width)]
    for d in range(1, state.depth):
        est = np.minimum(est, state.counts[d][_row_idx(h1, h2, d, state.width)])
    return est


def merge(a: CmsState, b: CmsState) -> CmsState:
    if (a.width, a.depth) != (b.width, b.depth):
        raise serde.SketchFormatError(f"cms dims mismatch: ({a.width},{a.depth}) vs ({b.width},{b.depth})")
    return CmsState(a.width, a.depth, a.counts + b.counts, a.total + b.total)


def error_bound(state: CmsState) -> float:
    """ε·N additive overcount bound with probability ≥ 1-δ."""
    return (math.e / state.width) * state.total


def serialize(state: CmsState) -> bytes:
    """Dense (depth*width i64 cells) or sparse wire form, whichever is
    smaller.  Sparse body: i64 total, u32 count, count ascending u32 flat
    cell indices (row*width+col), then count i64 cell values — chosen
    deterministically when ``12*nonzero + 12 < 8*cells``.  A (partition,
    group) partial that saw d distinct keys touches at most depth*d of the
    depth*width cells, so nearly-empty partials shrink ~width/d-fold on
    the shuffle; merge (cellwise +) and query are unchanged."""
    params = _PARAMS.pack(state.width, state.depth)
    flat = state.counts.reshape(-1)
    cells = flat.size
    # cheap gate first; the cap mirrors bloom's: corrupt sparse payloads
    # cannot force a giant allocation, and serialize applies the same cap
    # so every emitted payload round-trips
    n_set = int(np.count_nonzero(flat))
    if cells <= _MAX_SPARSE_CELLS and 12 * n_set + 12 < 8 * cells:
        nz = np.flatnonzero(flat)
        body = (
            struct.pack("<qI", state.total, nz.size)
            + np.ascontiguousarray(nz, dtype="<u4").tobytes()
            + np.ascontiguousarray(flat[nz], dtype="<i8").tobytes()
        )
        return serde.pack_header(serde.KIND_CMS, params, serde.FLAG_SPARSE) + body
    body = struct.pack("<q", state.total) + state.counts.astype("<i8").tobytes()
    return serde.pack_header(serde.KIND_CMS, params) + body


def deserialize(payload: bytes) -> CmsState:
    kind, flags, params, body = serde.unpack_header_full(payload)
    if kind != serde.KIND_CMS:
        raise serde.SketchFormatError(f"not a cms payload (kind={kind})")
    if flags & ~serde.FLAG_SPARSE:
        raise serde.SketchFormatError(f"unknown cms flags 0x{flags:04x}")
    width, depth = _PARAMS.unpack(params)
    if flags & serde.FLAG_SPARSE:
        if depth * width > _MAX_SPARSE_CELLS:
            raise serde.SketchFormatError(
                f"sparse cms cells={depth * width} above cap {_MAX_SPARSE_CELLS}"
            )
        if len(body) < 12 or (len(body) - 12) % 12:
            raise serde.SketchFormatError("sparse cms body size mismatch")
        total, n = struct.unpack_from("<qI", body, 0)
        idx = np.frombuffer(body[12 : 12 + 4 * n], dtype="<u4").astype(np.int64)
        vals = np.frombuffer(body[12 + 4 * n :], dtype="<i8")
        if idx.size != n or vals.size != n:
            raise serde.SketchFormatError("sparse cms body size mismatch")
        if idx.size and (idx[-1] >= depth * width or (np.diff(idx) <= 0).any()):
            raise serde.SketchFormatError("sparse cms indices not ascending in range")
        flat = np.zeros(depth * width, dtype=np.int64)
        flat[idx] = vals
        return CmsState(width, depth, flat.reshape(depth, width), int(total))
    (total,) = struct.unpack_from("<q", body, 0)
    counts = np.frombuffer(body[8:], dtype="<i8").astype(np.int64).reshape(depth, width)
    return CmsState(width, depth, counts, total)
