"""Standalone sketch-build job for spark-submit (north-rule launch mode).

    zip -r /tmp/wordspell_spark.zip wordspell_spark
    spark-submit --master local[8] --py-files /tmp/wordspell_spark.zip \
        tools/sketch_job.py <input_parquet> <output_parquet> [group_col]

Builds all eight sketch kinds over the input sequences table in one pass and
writes the long-format sketch table (group, kind, sketch BINARY, rows,
items).  On a cluster the same invocation works with --master yarn/k8s and
an Iceberg path; nothing here is local-mode-specific.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    inp, outp = sys.argv[1], sys.argv[2]
    group_col = sys.argv[3] if len(sys.argv) > 3 else "source"

    spark = SparkSession.builder.appName("wordspell-sketch-build").getOrCreate()
    # imports resolve from --py-files at executor side
    from wordspell_spark.harness import build_sketches_multi
    from wordspell_spark.sketches import SketchSpec

    specs = {
        "bloom": (SketchSpec("bloom", {"n_estimate": 200_000, "fpr": 0.005}), "tokens"),
        "hll": (SketchSpec("hll", {"p": 12}), "tokens"),
        "cms": (SketchSpec("cms", {"eps": 0.0005, "delta": 0.01}), "tokens"),
        "kll": (SketchSpec("kll", {"k": 200}), "n_tok"),
        "tdigest": (SketchSpec("tdigest", {"delta": 100.0}), "n_tok"),
        # r5 kinds: distinct-token set algebra, deterministic heavy hitters,
        # and a stable distinct-token sample per group
        "theta": (SketchSpec("theta", {"k": 4096}), "tokens"),
        "freq": (SketchSpec("freq", {"k": 256}), "tokens"),
        "sample": (SketchSpec("sample", {"k": 1024}), "tokens"),
    }
    seq = spark.read.parquet(inp)
    out = build_sketches_multi(seq, specs, [group_col])
    out.write.mode("overwrite").parquet(outp)
    n = spark.read.parquet(outp).count()
    print(f"WROTE {n} sketch rows to {outp}")
    spark.stop()


if __name__ == "__main__":
    main()
