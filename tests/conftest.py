from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("wordspell-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sequences_small(spark):
    """10k-row deterministic sequences fixture (FIXTURES.md §1)."""
    from wordspell_spark.sources.fixtures import sequences_path

    return spark.read.parquet(sequences_path(10_000))


@pytest.fixture(scope="session")
def testdata_dir():
    return "/root/testdata/sf0.001"
