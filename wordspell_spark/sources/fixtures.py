"""Deterministic synthetic fixtures (FIXTURES.md).

The primary table is ``sequences`` — the north-rule input shape
(BASELINE.json ``input_hint``):

    doc_id : string      f"doc-{i:010d}"
    tokens : array<int32>  Zipfian(s≈1.1) over vocab [0, 50_000)
    n_tok  : int32       lognormal-ish clipped to [1, 512]; == size(tokens)
    source : string      {web, books, code, wiki, forums}; web ≈ 70% (skew)

Everything is generated with numpy + pyarrow (no Spark needed, no wall-clock,
seeded) and cached as Parquet so Spark tests/benches just ``spark.read``.
The skewed ``source`` column deliberately exercises the salting /
repartitioning path (north_rule "explicit skew handling").
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 50_000
SOURCES = ["web", "books", "code", "wiki", "forums"]
SOURCE_PROBS = [0.70, 0.10, 0.08, 0.07, 0.05]
DEFAULT_SEED = 42

SEQUENCES_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.field("element", pa.int32(), nullable=False))),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)


def _zipf_tokens(rng: np.random.Generator, total: int, s: float = 1.1) -> np.ndarray:
    """Zipfian token ids over [0, VOCAB_SIZE) via inverse-CDF sampling.

    ``rng.zipf`` has unbounded support; we sample the truncated distribution
    directly so the vocabulary is exactly [0, VOCAB_SIZE).
    """
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    pmf = ranks**-s
    cdf = np.cumsum(pmf)
    cdf /= cdf[-1]
    u = rng.random(total)
    return np.searchsorted(cdf, u).astype(np.int32)


def sequences_table(n: int, seed: int = DEFAULT_SEED) -> pa.Table:
    rng = np.random.default_rng(seed)
    n_tok = np.clip(np.round(np.exp(rng.normal(3.5, 1.0, size=n))), 1, 512).astype(np.int32)
    total = int(n_tok.sum())
    flat = _zipf_tokens(rng, total)
    offsets = np.concatenate([[0], np.cumsum(n_tok)]).astype(np.int64)
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int64()),
        pa.array(flat, type=pa.int32()),
    ).cast(SEQUENCES_SCHEMA.field("tokens").type)
    source = rng.choice(len(SOURCES), size=n, p=SOURCE_PROBS)
    doc_id = pa.array([f"doc-{i:010d}" for i in range(n)], type=pa.string())
    return pa.Table.from_arrays(
        [doc_id, tokens, pa.array(n_tok, type=pa.int32()), pa.array(np.array(SOURCES, dtype=object)[source])],
        schema=SEQUENCES_SCHEMA,
    )


def ensure_sequences(path: str, n: int, seed: int = DEFAULT_SEED, row_group_size: int = 50_000) -> str:
    """Write (once) and return the cached sequences parquet path.

    Multiple row groups so Spark splits the file into several input
    partitions even at small scale.
    """
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = f"{path}.tmp-{os.getpid()}"
        pq.write_table(sequences_table(n, seed), tmp, row_group_size=row_group_size)
        os.replace(tmp, path)
    return path


def default_fixture_dir() -> str:
    return os.environ.get("WORDSPELL_FIXTURE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "data"))


def sequences_path(n: int, seed: int = DEFAULT_SEED) -> str:
    """Cached canonical fixture location for a given size."""
    return ensure_sequences(os.path.join(default_fixture_dir(), f"sequences_n{n}_s{seed}.parquet"), n, seed)
