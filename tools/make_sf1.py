"""Deterministic sf1 (10x sf0.1) bench inputs under data/sf1/.

The driver ships sf{0.001,0.01,0.1} only; the round-3 verdict asks for one
10x bench point so fixed-overhead-bound queries can be separated from
genuinely scaling ones (per-query scaling exponents in BENCH.md).  This
script synthesizes that point FROM the driver's own sf0.1 tables — no
external data, no RNG in the text path — via replica transforms chosen so
each per-query workload scales the way a real 10x corpus would:

- documents: 10 replicas; replica r > 0 applies a per-replica WORD-SUFFIX
  BIJECTION (every word gets an alphabetic suffix, e.g. "xb").  Shingle /
  token-set Jaccard is invariant under a word bijection, so the planted
  exact-dup and near-dup pair density is preserved exactly within every
  replica (10x docs -> 10x dup pairs), replicas are never near-dups of
  each other, the per-replica Zipf frequency shape is untouched, and the
  corpus vocabulary scales 10x — the "more data, more vocabulary" regime a
  real web crawl shows.  Suffixes are letters-only so the engine's word
  filter keeps them.
- lineitem / events: 10 replicas with key offsets (l_orderkey, event_id,
  user_id) — aggregation and sessionization workloads scale exactly
  linearly by construction (10x groups, same rows-per-group).
- embeddings: 10 replicas; replica r > 0 adds seeded Gaussian perturbation
  (sigma = 5% of the corpus std) so no cross-replica vector is an exact
  copy and ANN candidate structure stays realistic.

Run: python tools/make_sf1.py   (writes data/sf1/*.parquet, ~1 min)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.1")
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "sf1")
REPLICAS = 10
SUFFIXES = [""] + ["x" + c for c in "bcdefghij"]  # letters-only, replica 0 untouched


def write_parts(name: str, tables: list[pa.Table], chunks_per_part: int = 1) -> None:
    """Write a scaled table as a DIRECTORY of part files — a 10x table read
    as one 100 MB file would scan as 1-2 input splits (maxPartitionBytes),
    serializing the whole read side; a real 10x dataset ships as many
    files.  ``chunks_per_part`` further slices each replica so big fact
    tables present enough splits for 32 cores."""
    out_dir = os.path.join(DST, f"{name}.parquet")
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        os.unlink(os.path.join(out_dir, f))
    i = 0
    for t in tables:
        step = (t.num_rows + chunks_per_part - 1) // chunks_per_part
        for s in range(0, t.num_rows, step):
            pq.write_table(t.slice(s, step), os.path.join(out_dir, f"part-{i:04d}.parquet"))
            i += 1


def scale_documents() -> None:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    n = t.num_rows
    doc_id = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    lang = t.column("lang")
    source = t.column("source")
    parts = []
    for r in range(REPLICAS):
        sfx = SUFFIXES[r]
        if sfx:
            new_texts = [" ".join(w + sfx for w in s.split()) for s in texts]
        else:
            new_texts = texts
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(doc_id + r * n, type=pa.int64()),
                    "text": pa.array(new_texts, type=pa.string()),
                    "lang": lang,
                    "source": source,
                    "n_chars": pa.array(
                        np.fromiter((len(s) for s in new_texts), dtype=np.int64, count=n)
                    ),
                }
            )
        )
    write_parts("documents", parts)


def scale_embeddings() -> None:
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    n = t.num_rows
    vec_id = t.column("vec_id").to_numpy()
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    label = t.column("label")
    sigma = float(emb.std()) * 0.05
    parts = []
    for r in range(REPLICAS):
        if r:
            rng = np.random.default_rng(1_000_003 * r)
            e = emb + rng.standard_normal(emb.shape).astype(np.float32) * sigma
        else:
            e = emb
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(vec_id + r * n, type=pa.int64()),
                    "embedding": pa.array(list(e), type=pa.list_(pa.float32())),
                    "label": label,
                }
            )
        )
    write_parts("embeddings", parts)


def scale_keyed(name: str, key_cols: dict[str, int], chunks_per_part: int = 1) -> None:
    """Replicate a table with per-replica offsets on the given key columns
    (offset = replica * (max_key + 1), keys stay disjoint and dense)."""
    t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    offsets = {c: int(pc.max(t.column(c)).as_py()) + 1 for c in key_cols}
    parts = []
    for r in range(REPLICAS):
        cols = {}
        for field in t.schema.names:
            col = t.column(field)
            if r and field in offsets:
                col = pc.add(col, r * offsets[field])
            cols[field] = col
        parts.append(pa.table(cols))
    write_parts(name, parts, chunks_per_part)


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    scale_documents()
    scale_embeddings()
    scale_keyed("lineitem", {"l_orderkey": 1}, chunks_per_part=4)
    scale_keyed("events", {"event_id": 1, "user_id": 1}, chunks_per_part=2)
    for d in sorted(os.listdir(DST)):
        dp = os.path.join(DST, d)
        files = sorted(os.listdir(dp))
        rows = sum(pq.read_metadata(os.path.join(dp, f)).num_rows for f in files)
        mb = sum(os.path.getsize(os.path.join(dp, f)) for f in files) / 1e6
        print(f"{d}: {rows:,} rows, {mb:.1f} MB, {len(files)} files")


if __name__ == "__main__":
    main()
