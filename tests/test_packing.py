"""Sequence packing + deterministic splits: python oracles, invariants,
plan discipline (pure Catalyst, bucket-parallel windows)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wordspell_spark.operators import packing as P


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(11)
    rows = [(i, int(rng.integers(10, 900))) for i in range(500)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long"), dict(rows)


class TestPackSequences:
    def test_matches_python_oracle(self, docs):
        df, toks = docs
        budget, nb = 2048, 8
        got = {r["doc_id"]: r for r in P.pack_sequences(df, budget, n_buckets=nb).collect()}
        # python oracle: per bucket, ids ascending, cumulative layout
        for b in range(nb):
            ids = sorted(i for i in toks if i % nb == b)
            cum = 0
            pos_in_bin = {}
            for i in ids:
                r = got[i]
                assert r["bucket"] == b
                assert r["cum_tokens"] == cum
                bin_id = cum // budget
                assert r["bin_id"] == bin_id
                pos_in_bin[bin_id] = pos_in_bin.get(bin_id, -1) + 1
                assert r["bin_pos"] == pos_in_bin[bin_id]
                cum += toks[i]

    def test_every_doc_assigned_exactly_once(self, docs):
        df, toks = docs
        packed = P.pack_sequences(df, 4096)
        assert packed.count() == len(toks)
        assert packed.select("doc_id").distinct().count() == len(toks)

    def test_fill_stats(self, docs):
        df, toks = docs
        budget = 2048
        packed = P.pack_sequences(df, budget, n_buckets=4)
        stats = P.packing_stats(packed, budget).collect()
        # all bins except possibly each bucket's last are filled past start
        # of budget; totals reconcile
        assert sum(r["total_tokens"] for r in stats) == sum(toks.values())
        for r in stats:
            assert r["fill_permille"] == r["total_tokens"] * 1000 // budget

    def test_bad_budget(self, docs):
        with pytest.raises(ValueError):
            P.pack_sequences(docs[0], 0)

    def test_plan_pure_catalyst_bucket_parallel(self, docs):
        df, _ = docs
        plan = P.pack_sequences(df, 1024)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Arrow" not in plan  # no UDFs
        # window partitions by bucket — never a global single-partition sort
        assert "bucket" in plan


class TestDeterministicSplit:
    def test_matches_arithmetic_oracle(self, docs):
        df, toks = docs
        out = {r["doc_id"]: r["split"] for r in
               P.deterministic_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
        for i in toks:
            h = ((i % 2**31) * P.KNUTH_MULT) % (2**31) % 10000
            want = "train" if h < 8000 else "val" if h < 9000 else "test"
            assert out[i] == want, (i, h)

    def test_no_int64_overflow_at_huge_ids(self, spark):
        # ids past 2^33: a raw id*mult would wrap int64 — the pre-reduction
        # must keep the arithmetic exact and the python oracle must agree
        ids = [2**33 + 7, 2**40 + 123, 2**62 - 1]
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        out = {r["doc_id"]: r["split"] for r in
               P.deterministic_split(df, {"train": 0.5, "val": 0.5}).collect()}
        for i in ids:
            h = ((i % 2**31) * P.KNUTH_MULT) % (2**31) % 10000
            assert out[i] == ("train" if h < 5000 else "val"), (i, h)

    def test_stable_across_runs_and_repartition(self, docs):
        df, _ = docs
        a = {r["doc_id"]: r["split"] for r in P.deterministic_split(df, {"train": 0.9, "val": 0.1}).collect()}
        b = {r["doc_id"]: r["split"] for r in
             P.deterministic_split(df.repartition(13), {"train": 0.9, "val": 0.1}).collect()}
        assert a == b

    def test_fractions_roughly_respected(self, docs):
        df, toks = docs
        out = P.deterministic_split(df, {"train": 0.8, "val": 0.2}).groupBy("split").count().collect()
        counts = {r["split"]: r["count"] for r in out}
        assert abs(counts.get("train", 0) / len(toks) - 0.8) < 0.08

    def test_remainder_goes_to_first_label(self, spark):
        df = spark.range(1000).select(F.col("id").alias("doc_id"))
        out = P.deterministic_split(df, {"train": 0.5}).groupBy("split").count().collect()
        assert {r["split"] for r in out} == {"train"}

    def test_bad_fractions(self, docs):
        with pytest.raises(ValueError):
            P.deterministic_split(docs[0], {})
        with pytest.raises(ValueError):
            P.deterministic_split(docs[0], {"a": 0.9, "b": 0.3})
