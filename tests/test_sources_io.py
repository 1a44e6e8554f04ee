"""Sources/sinks tests (SURVEY.md §2.1).

S1-S3 (partitioned JDBC) cannot run against a live database in this sandbox
(the reference uses testcontainers Postgres, repo/catalog/catalog_test.go:12-40);
what IS testable without one — and what the reference's paging loop gets
subtly right at boundaries (index/builder.go:110-156) — is the partition
predicate arithmetic: complete, non-overlapping ranges.  The Python mirror
``jdbc_partition_predicates`` reproduces Spark's JDBCRelation.columnPartition
algorithm and these tests pin its boundary behavior.
"""

from __future__ import annotations

import re

import pytest

from wordspell_spark.sources.io import jdbc_partition_predicates

_CMP = re.compile(r"(>=|<) (-?\d+)")


def _matches(pred: str | None, value: int) -> bool:
    """Evaluate a generated predicate for one value of the column."""
    if pred is None:
        return True
    ok = True
    for op, bound in _CMP.findall(pred):
        ok &= value >= int(bound) if op == ">=" else value < int(bound)
    return ok


def _assert_partition(preds: list[str | None], domain: range) -> None:
    """Every value in the domain lands in EXACTLY one partition."""
    for v in domain:
        hits = sum(_matches(p, v) for p in preds)
        assert hits == 1, f"value {v} matched {hits} partitions: {preds}"


class TestJdbcPartitionPredicates:
    def test_even_split_complete_and_disjoint(self):
        preds = jdbc_partition_predicates("id", 0, 1000, 4)
        assert len(preds) == 4
        _assert_partition(preds, range(-50, 1051))  # incl. values outside bounds

    def test_uneven_stride_covers_remainder(self):
        # 0..10 over 3 partitions: stride 3 leaves a remainder — the last
        # partition is unbounded above, so nothing is dropped
        preds = jdbc_partition_predicates("id", 0, 10, 3)
        _assert_partition(preds, range(-5, 25))

    def test_edge_partitions_unbounded(self):
        preds = jdbc_partition_predicates("id", 100, 200, 4)
        assert "<" in preds[0] and ">=" not in preds[0]  # first: only upper
        assert ">=" in preds[-1] and "<" not in preds[-1]  # last: only lower
        _assert_partition(preds, range(0, 300))  # out-of-range rows still scanned once

    def test_negative_bounds(self):
        preds = jdbc_partition_predicates("id", -1000, 1000, 8)
        assert len(preds) == 8
        _assert_partition(preds, range(-1200, 1201))

    def test_range_narrower_than_parallelism_clamps(self):
        # 5 values cannot feed 32 partitions; Spark clamps instead of
        # emitting empty/overlapping slices
        preds = jdbc_partition_predicates("id", 0, 5, 32)
        assert len(preds) == 5
        _assert_partition(preds, range(-3, 10))

    def test_single_partition_has_no_predicate(self):
        assert jdbc_partition_predicates("id", 0, 100, 1) == [None]
        assert jdbc_partition_predicates("id", 7, 7, 8) == [None]

    @pytest.mark.parametrize("lower,upper,n", [(0, 97, 7), (13, 1777, 16), (-333, 29, 5)])
    def test_property_complete_disjoint(self, lower, upper, n):
        preds = jdbc_partition_predicates("id", lower, upper, n)
        _assert_partition(preds, range(lower - 10, upper + 11))
