"""BPE merge-loop scale measurement (BENCH.md "BPE training" section).

Rebuilds the deterministic hex corpus the r5 sequential numbers were
measured on (200k docs x 8 words, each word 4 hex chars => 65,536 distinct
words) and times training.  Usage:

    python tools/bpe_scale_bench.py [n_merges] [batch_k] [n_docs]

The sequential baseline (batch_k=1) at 1,000 merges is recorded in
BENCH.md (1,038.6 s, 1.01 s/merge marginal); re-run only what you need.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession

from wordspell_spark.operators import bpe as B

N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
BATCH_K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
N_DOCS = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(12345)
    hexd = np.array(list("0123456789abcdef"))
    chars = rng.integers(0, 16, size=(N_DOCS, 8, 4))
    docs = ["".join("".join(hexd[w]) + " " for w in doc)[:-1] for doc in chars]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    ).repartition(CPUS).cache()
    df.count()

    t0 = time.monotonic()
    merges = B.train_bpe(df, N_MERGES, min_count=2, batch_k=BATCH_K)
    wall = time.monotonic() - t0
    print(
        f"n_docs={N_DOCS} distinct_words<=65536 n_merges={len(merges)} "
        f"batch_k={BATCH_K} wall={wall:.1f}s ms/merge={1000 * wall / max(len(merges), 1):.0f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
