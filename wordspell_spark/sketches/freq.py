"""Mergeable Misra–Gries frequent-items (heavy hitters) kernel.

The deterministic companion to the count-min sketch (cms.py): CMS answers
point frequency queries for ANY key but never says which keys matter; this
summary carries the candidate heavy-hitter ITEMS themselves, with the
classic Misra–Gries guarantees for a k-counter summary over n items:

    f(x) - dec  <=  est(x)  <=  f(x)        for every item x
    dec         <=  n / (k + 1)             (dec = total decrement weight)

so any item with true frequency above n/(k+1) is guaranteed retained.
Merging two summaries is counter-addition followed by one trim — the
Agarwal et al. "Mergeable Summaries" (PODS'12) construction — which keeps
the same bound for any merge tree shape (property-tested over all
associations, like kll/tdigest).  The trim subtracts the (k+1)-th largest
count from every counter and drops the non-positive ones: at least k+1
counters each lose the full subtracted amount, which is what caps ``dec``.

Values may be int64-like or strings (token ids or tokens).  Updates are
batch-vectorized: one ``np.unique(return_counts=True)`` per Arrow batch,
then a dict merge over the DISTINCT items only (Zipfian batches shrink
4-10x), never per-row Python.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from . import serde
from .hashing import normalize_items as _normalize_keys

DEFAULT_K = 256

_PARAMS = struct.Struct("<I")
_BODY_HEAD = struct.Struct("<qqIB")
_VT_INT = 0
_VT_STR = 1


@dataclass
class FreqState:
    k: int
    n: int = 0  # total items processed
    dec: int = 0  # total decrement weight (the error bound)
    counters: dict = field(default_factory=dict)

    def copy(self) -> "FreqState":
        return FreqState(self.k, self.n, self.dec, dict(self.counters))


def create(k: int = DEFAULT_K) -> FreqState:
    if not 1 <= k <= (1 << 20):
        raise ValueError(f"k must be in [1, 2^20], got {k}")
    return FreqState(k)


def update(state: FreqState, values) -> FreqState:
    vals = np.asarray(values)
    if vals.size == 0:
        return state
    vals = vals[_non_null_mask(vals)]
    if vals.size == 0:
        return state
    # factorize (hash table) beats np.unique (comparison sort) ~7x on
    # Zipfian string batches; the resulting counters are identical either
    # way (trim is count-based, dict order never matters numerically)
    codes, uniq = pd.factorize(vals)
    cnts = np.bincount(codes)
    return update_counts(state, _normalize_keys(np.asarray(uniq)), cnts)


def _non_null_mask(vals: np.ndarray) -> np.ndarray:
    if vals.dtype == object:
        return np.array([v is not None and v == v for v in vals], dtype=bool)
    if vals.dtype.kind == "f":
        return ~np.isnan(vals)
    return np.ones(vals.size, dtype=bool)


def update_counts(state: FreqState, items: list, counts) -> FreqState:
    """Pre-aggregated update: DISTINCT items with their batch counts."""
    c = state.counters
    total = 0
    for it, cnt in zip(items, counts):
        cnt = int(cnt)
        total += cnt
        c[it] = c.get(it, 0) + cnt
    state.n += total
    _trim(state)
    return state


def _trim(state: FreqState) -> None:
    c = state.counters
    if len(c) <= state.k:
        return
    counts = np.fromiter(c.values(), dtype=np.int64, count=len(c))
    # m = the (k+1)-th largest count; subtracting it zeroes everything at or
    # below rank k+1, so at most k counters (those strictly above m) survive
    m = int(np.partition(counts, -(state.k + 1))[-(state.k + 1)])
    state.counters = {it: v - m for it, v in c.items() if v > m}
    state.dec += m


def merge(a: FreqState, b: FreqState) -> FreqState:
    if a.k != b.k:
        raise serde.SketchFormatError(f"freq k mismatch: {a.k} vs {b.k}")
    out = a.copy()
    c = out.counters
    for it, v in b.counters.items():
        c[it] = c.get(it, 0) + v
    out.n += b.n
    out.dec += b.dec
    _trim(out)
    return out


def _key_or_none(v):
    """Lenient query-side key normalization: unsupported/null → None."""
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, (str, np.str_)):
        return str(v)
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    return None  # None / NaN / float / anything a sketch can't hold


def query(state: FreqState, items) -> np.ndarray:
    """Estimated count per item (0 for untracked; true count <= est + dec).

    Query-side is LENIENT: nulls and non-int/str values return 0 instead
    of raising (the make_freq_count_udf column may be nullable), matching
    make_cms_count_udf's tolerate-anything behavior."""
    arr = np.asarray(items)
    if arr.dtype.kind in "US":
        arr = arr.astype(object)
    c = state.counters
    return np.fromiter(
        (c.get(_key_or_none(v), 0) for v in arr.ravel()), dtype=np.int64, count=arr.size
    )


def error_bound(state: FreqState) -> int:
    """Max undercount: f(x) - query(x) <= this, and it is <= n/(k+1)."""
    return state.dec


def top_items(state: FreqState, n: int | None = None) -> list:
    """[(item, est, upper=est+dec)] by est desc, item asc tiebreak.

    Items must be homogeneous (all int or all str — what ``serialize``
    enforces); the tiebreak is then numeric for ints, lexicographic for
    strings."""
    rows = sorted(state.counters.items(), key=lambda kv: (-kv[1], kv[0]))
    if n is not None:
        rows = rows[:n]
    return [(it, v, v + state.dec) for it, v in rows]


def serialize(state: FreqState) -> bytes:
    items = sorted(state.counters.items(), key=lambda kv: str(kv[0]))
    vtype = _VT_INT
    if items and isinstance(items[0][0], str):
        vtype = _VT_STR
    if any(isinstance(it, str) != (vtype == _VT_STR) for it, _ in items):
        raise serde.SketchFormatError("freq sketch holds mixed int/str items")
    head = _BODY_HEAD.pack(state.n, state.dec, len(items), vtype)
    counts = np.array([v for _, v in items], dtype="<i8").tobytes()
    if vtype == _VT_INT:
        vals = np.array([it for it, _ in items], dtype="<i8").tobytes()
        body = head + vals + counts
    else:
        blobs = [it.encode("utf-8") for it, _ in items]
        lens = np.array([len(b) for b in blobs], dtype="<u4").tobytes()
        body = head + lens + b"".join(blobs) + counts
    return serde.pack_header(serde.KIND_FREQ, _PARAMS.pack(state.k)) + body


def deserialize(payload: bytes) -> FreqState:
    kind, params, body = serde.unpack_header(payload)
    if kind != serde.KIND_FREQ:
        raise serde.SketchFormatError(f"not a freq payload (kind={kind})")
    (k,) = _PARAMS.unpack(params)
    if len(body) < _BODY_HEAD.size:
        raise serde.SketchFormatError("freq body too short")
    n, dec, n_entries, vtype = _BODY_HEAD.unpack_from(body, 0)
    off = _BODY_HEAD.size
    if n_entries > k:
        raise serde.SketchFormatError("freq body holds more than k entries")
    if vtype == _VT_INT:
        end = off + 8 * n_entries
        items = np.frombuffer(body[off:end], dtype="<i8")
        counts = np.frombuffer(body[end : end + 8 * n_entries], dtype="<i8")
        if items.size != n_entries or counts.size != n_entries:
            raise serde.SketchFormatError("freq body size mismatch")
        counters = {int(it): int(c) for it, c in zip(items, counts)}
    elif vtype == _VT_STR:
        end = off + 4 * n_entries
        lens = np.frombuffer(body[off:end], dtype="<u4")
        blob_len = int(lens.sum())
        blob = bytes(body[end : end + blob_len])
        counts = np.frombuffer(
            body[end + blob_len : end + blob_len + 8 * n_entries], dtype="<i8"
        )
        if lens.size != n_entries or counts.size != n_entries:
            raise serde.SketchFormatError("freq body size mismatch")
        counters, pos = {}, 0
        for ln, c in zip(lens, counts):
            counters[blob[pos : pos + int(ln)].decode("utf-8")] = int(c)
            pos += int(ln)
    else:
        raise serde.SketchFormatError(f"unknown freq value type {vtype}")
    return FreqState(k, int(n), int(dec), counters)
