"""Sequence packing + deterministic splits — the training-data-prep stages
between cleaning/dedup and the trainer.

``pack_sequences`` assigns documents to fixed-token-budget bins the way
production LLM pipelines do sequential packing: concatenate in a stable
order, start a new bin when the running total passes the budget.  A single
global ordering would funnel the window through one task, so the
scale-correct form buckets first (``bucket = doc_id % n_buckets``) and
packs within buckets — every bucket is an independent window partition,
shuffle-parallel at any corpus size, and the layout is fully deterministic
(reproducible training runs need byte-stable packing).

``deterministic_split`` is hash-based train/val/test assignment: a document
lands in the same split forever, on any cluster size, with no RNG state —
the property `df.randomSplit` cannot give across re-runs or re-partitions.
The multiplicative hash is plain integer arithmetic (Knuth's 2654435761
mod 2^32), so the assignment is reproducible in ANY engine — the DuckDB
oracle replicates it exactly.

Everything here is pure Catalyst (window + integer arithmetic): no UDFs,
no collect, whole-stage-codegen friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KNUTH_MULT = 2654435761  # 2^32 / golden ratio, Knuth multiplicative hashing


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(id, n_tokens) → (id, bucket, bin_id, bin_pos, cum_tokens).

    Sequential packing per bucket: docs are laid out in ``id`` order and a
    doc belongs to the bin its first token lands in
    (``bin_id = floor(cum_before / budget)``), so a doc may finish past
    the boundary — the split/truncate of the straddling tail is the
    tokenizer-side concern; the engine's job is the deterministic layout.
    ``bin_pos`` is the doc's position within its bin, ``cum_tokens`` the
    running total before it (both exactly what a packer needs to slice
    the concatenated stream).  Bins are globally unique via
    (bucket, bin_id)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = Window.partitionBy("bucket").orderBy(id_col)
    return (
        docs.select(
            F.col(id_col),
            F.col(tokens_col).cast("long").alias("n_tokens"),
            (F.col(id_col) % n_buckets).cast("int").alias("bucket"),
        )
        .withColumn(
            "cum_tokens",
            F.coalesce(
                F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        # integer `div`, not `/`: float division loses exactness past 2^53
        # cumulative tokens per bucket — real at the 100 TB design point
        .withColumn("bin_id", F.expr(f"cum_tokens div {int(budget)}"))
        .withColumn(
            "bin_pos",
            F.row_number().over(Window.partitionBy("bucket", "bin_id").orderBy(id_col)) - 1,
        )
    )


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-bin fill statistics: (bucket, bin_id, n_docs, total_tokens,
    fill_permille).  fill can exceed 1000 for the bin whose last doc
    straddles the boundary — that overflow is exactly the tail the
    tokenizer truncates or carries."""
    return (
        packed.groupBy("bucket", "bin_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        # integer div, same exactness rule as pack_sequences: float
        # division + cast would round past 2^53 token-permille
        .withColumn("fill_permille", F.expr(f"(total_tokens * 1000) div {int(budget)}"))
    )


def split_hash(id_col, mod: int = 10000):
    """The split hash as a Column: Knuth multiplicative on the id's low 31
    bits, reduced mod 2^31 then to [0, mod) — plain integer arithmetic,
    bit-identical in any engine.  The pre-reduction keeps the product
    under 2^63 ((2^31-1) * 2654435761 ≈ 5.7e18), so the arithmetic never
    overflows int64 at any id — a raw id*mult would wrap (Spark) or error
    (DuckDB) past id ≈ 3.5e9, silently corrupting split assignment exactly
    at large-corpus scale.  pmod keeps negative ids well-defined."""
    low = F.pmod(F.col(id_col), F.lit(2**31))
    return ((low * F.lit(KNUTH_MULT)) % F.lit(2**31)) % F.lit(mod)


def deterministic_split(
    docs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every row a stable split label ('train'/'val'/...) from its
    id alone.  ``fractions`` maps label → fraction (must sum to ≤ 1; any
    remainder goes to the first label).  Unlike ``randomSplit``, the
    assignment survives re-runs, re-partitioning, and engine changes."""
    if not fractions:
        raise ValueError("need at least one split")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9 or any(v < 0 for v in fractions.values()):
        raise ValueError("fractions must be non-negative and sum to <= 1")
    mod = 10000
    h = split_hash(id_col, mod)
    labels = list(fractions)
    col = None
    lo = 0
    for name, frac in fractions.items():
        hi = lo + int(round(frac * mod))
        cond = (h >= lo) & (h < hi)
        col = F.when(cond, F.lit(name)) if col is None else col.when(cond, F.lit(name))
        lo = hi
    # ids past the last bound (fractions sum < 1) fall to the first label
    return docs.withColumn("split", col.otherwise(F.lit(labels[0])))
