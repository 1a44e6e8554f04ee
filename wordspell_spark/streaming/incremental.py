"""Incremental sketch maintenance over Structured Streaming.

Sketches are mergeable by construction, so streaming increments are trivial
(SURVEY.md §2.10): each micro-batch builds per-group partial sketches with
the SAME two-level harness as the batch path, then merges them into a
persistent state table inside ``foreachBatch``.  Exactly-once comes from the
file-source checkpoint (processed-files log) + idempatent overwrite of the
state table per epoch.

At scale this is the standing analogue of the reference's weekly rebuild
(/root/reference/components/index/service.go:23-38): instead of re-scanning
the corpus, new partitions land in the lakehouse and the sketch state
absorbs them in O(new data).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..harness import build_sketches
from ..sketches import SketchSpec


def merge_into_state(
    spark: SparkSession,
    new_partials: DataFrame,
    spec: SketchSpec,
    group_cols: list[str],
    state_path: str,
) -> None:
    """Merge freshly-built partials into the persistent sketch-state table.

    Read-modify-write with an epoch-atomic overwrite; payloads are KBs per
    group so this is driver-light and safe to run per micro-batch.
    """
    try:
        old = spark.read.parquet(state_path)
        combined = old.unionByName(new_partials)
    except Exception:  # noqa: BLE001 — first epoch: no state yet
        combined = new_partials

    merge_schema = combined.schema

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = spec.merge_payloads(list(pdf["sketch"]))
        head = pdf.iloc[[0]][group_cols].reset_index(drop=True)
        head["sketch"] = [merged]
        head["rows"] = [int(pdf["rows"].sum())]
        head["items"] = [int(pdf["items"].sum())]
        return head

    merged = combined.groupBy(*group_cols).applyInPandas(merge_group, schema=merge_schema)
    # stage the new state, then atomic-swap (the reference's artifact-swap
    # pattern, index/builder.go:29-36)
    tmp = state_path.rstrip("/") + ".staging"
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(state_path)


def incremental_sketch_query(
    spark: SparkSession,
    input_path: str,
    input_schema: str,
    spec: SketchSpec,
    group_cols: list[str],
    value_col: str,
    state_path: str,
    checkpoint_path: str,
):
    """Start an availableNow streaming query maintaining the sketch state.

    Returns the StreamingQuery; call ``.awaitTermination()``.  Re-running
    with the same checkpoint only processes files not yet absorbed — the
    streaming twin of operators/checkpoint.py's bucket resume.
    """
    stream = spark.readStream.schema(input_schema).parquet(input_path)

    def absorb(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.head(1):
            return
        partials = build_sketches(batch_df, spec, group_cols, value_col)
        merge_into_state(batch_df.sparkSession, partials, spec, group_cols, state_path)

    return (
        stream.writeStream.foreachBatch(absorb)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_state(spark: SparkSession, state_path: str) -> DataFrame:
    return spark.read.parquet(state_path)
