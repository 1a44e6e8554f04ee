"""Spark aggregation harness — two-level mergeable-sketch builds.

This is the architectural core (SURVEY.md §3.2): the Spark-native
generalization of the reference's partial→final additive accumulator merge
(/root/reference/components/index/models.go:58-72) and its single shared
Bloom build loop (/root/reference/builder.go:97-119).

    Stage A  mapInPandas over input partitions: one partial sketch per
             (group key) per partition — the map-side combine.  Output is
             tiny: ≤ |groups| rows per partition, each a byte payload.
    Stage B  (optional, for very wide clusters) groupBy(keys, salt) partial
             merge — the middle level of a treeAggregate.
    Stage C  groupBy(keys) final merge → one payload per group.

Why this shape at 100 TB: the shuffle after stage A moves only
|partitions| × |groups| payloads (KBs each), never raw rows, so a skewed
``source`` (70% web in the fixture) cannot create a hot shuffle partition of
raw data — skew is absorbed map-side, and the optional salt level bounds the
final merge fan-in.  No per-row Python anywhere: kernels consume whole Arrow
batches as numpy arrays (BASELINE.json input_hint).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .sketches import SketchSpec
from .sketches.hashing import hash64

_GLOBAL_KEY = "__all__"


def _flatten_values(series: pd.Series) -> np.ndarray:
    """Column values → flat numpy array; array columns are exploded in C.

    Detects array columns from the first NON-null element — a null in row 0
    must not silently switch a list column onto the scalar path.
    """
    if series.empty:
        return np.empty(0)
    non_null = series.dropna()
    if non_null.empty:
        return np.empty(0)
    first = non_null.iloc[0]
    if isinstance(first, (np.ndarray, list)):
        chunks = [np.asarray(v) for v in non_null if len(v)]
        if not chunks:
            return np.empty(0)
        return np.concatenate(chunks)
    vals = series.to_numpy()
    if vals.dtype == object:
        return vals[pd.notna(vals)]
    return vals[~pd.isna(vals)]


def _partial_schema(df: DataFrame, group_cols: list[str]) -> StructType:
    fields = [df.schema[c] for c in group_cols]
    return StructType(
        fields
        + [
            StructField("sketch", BinaryType(), False),
            StructField("rows", LongType(), False),
            StructField("items", LongType(), False),
        ]
    )


def build_sketches(
    df: DataFrame,
    spec: SketchSpec,
    group_cols: list[str] | None,
    value_col: str,
    *,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Build one merged sketch per group over ``value_col``.

    Returns DataFrame[*group_cols, sketch BINARY, rows LONG, items LONG]
    where ``rows`` counts input rows and ``items`` counts values fed to the
    sketch (array columns contribute their element count).
    """
    group_cols = list(group_cols or [])
    if not group_cols:
        df = df.withColumn(_GLOBAL_KEY, F.lit(_GLOBAL_KEY))
        out = build_sketches(df, spec, [_GLOBAL_KEY], value_col, salt_buckets=salt_buckets)
        return out.drop(_GLOBAL_KEY)

    narrow = df.select(*group_cols, value_col)
    partial_schema = _partial_schema(narrow, group_cols)

    def partial_build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One partial sketch per group key per *partition* (not per batch):
        # states persist across the batch iterator = map-side combine.
        states: dict[tuple, list] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            for key, sub in pdf.groupby(group_cols, sort=False, dropna=False):
                key = key if isinstance(key, tuple) else (key,)
                ent = states.get(key)
                if ent is None:
                    ent = states[key] = [spec.create(), 0, 0]
                vals = _flatten_values(sub[value_col])
                spec.update(ent[0], vals)
                ent[1] += len(sub)
                ent[2] += len(vals)
        if not states:
            return
        rows = [(*k, spec.serialize(st), nrows, nitems) for k, (st, nrows, nitems) in states.items()]
        yield pd.DataFrame(rows, columns=[*group_cols, "sketch", "rows", "items"])

    partials = narrow.mapInPandas(partial_build, schema=partial_schema)

    merge_schema = partial_schema

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = spec.merge_payloads(list(pdf["sketch"]))
        head = pdf.iloc[[0]][group_cols].reset_index(drop=True)
        head["sketch"] = [merged]
        head["rows"] = [int(pdf["rows"].sum())]
        head["items"] = [int(pdf["items"].sum())]
        return head

    if salt_buckets and salt_buckets > 1:
        # middle tree level: merge within (key, salt) before the final merge
        salted = partials.withColumn("__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)))
        mid = salted.groupBy(*group_cols, "__salt").applyInPandas(
            lambda pdf: merge_group(pdf.drop(columns="__salt")).assign(__salt=pdf["__salt"].iloc[0]),
            schema=StructType(merge_schema.fields + [StructField("__salt", LongType())]),
        ).drop("__salt")
        partials = mid

    return partials.groupBy(*group_cols).applyInPandas(merge_group, schema=merge_schema)


def build_sketches_multi(
    df: DataFrame,
    specs: dict[str, tuple[SketchSpec, str]],
    group_cols: list[str],
) -> DataFrame:
    """Build SEVERAL sketch kinds per group in ONE pass over the data.

    ``specs``: {kind_name: (SketchSpec, value_col)}.  Returns a long-format
    DataFrame[*group_cols, kind STRING, sketch BINARY, rows LONG, items LONG].

    Why: at 100 TB the scan IS the cost — five separate builds read the
    input five times and pay five job/shuffle latencies.  One mapInPandas
    maintains all states per group and the single merge shuffle carries
    |partitions| x |groups| x |kinds| KB payloads.
    """
    group_cols = list(group_cols)
    value_cols = sorted({vc for _, vc in specs.values()})
    narrow = df.select(*group_cols, *value_cols)
    out_schema = StructType(
        [narrow.schema[c] for c in group_cols]
        + [
            StructField("kind", StringType(), False),
            StructField("sketch", BinaryType(), False),
            StructField("rows", LongType(), False),
            StructField("items", LongType(), False),
        ]
    )
    spec_items = sorted(specs.items())  # deterministic kind order

    def partial_build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        states: dict[tuple, dict] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            for key, sub in pdf.groupby(group_cols, sort=False, dropna=False):
                key = key if isinstance(key, tuple) else (key,)
                ent = states.get(key)
                if ent is None:
                    ent = states[key] = {
                        name: [spec.create(), 0, 0] for name, (spec, _) in spec_items
                    }
                flats = {vc: _flatten_values(sub[vc]) for vc in value_cols}
                # shared-hash fast path: every hash-keyed kind (bloom / hll /
                # cms) derives all its indices from the same h1 = hash64(v),
                # so hash each value column ONCE per batch and aggregate to
                # (distinct hashes, counts) — the kernels then scatter over
                # the distinct set only.  Bit-identical payloads (idempotent
                # kinds ignore counts; cms adds them as weights); on Zipfian
                # token batches this cuts the dominant hash + sort cost from
                # once-per-kind to once-per-column.  pd.factorize (hash
                # table) beats np.unique (sort) ~3x here, and no kernel
                # depends on the distinct order.
                hashed: dict[str, tuple[np.ndarray, np.ndarray]] = {}
                for name, (spec, vc) in spec_items:
                    st = ent[name]
                    fast = getattr(spec.module, "update_unique_hashes", None)
                    if fast is not None:
                        if vc not in hashed:
                            codes, uniq = pd.factorize(hash64(flats[vc]))
                            hashed[vc] = (
                                np.asarray(uniq, dtype=np.uint64),
                                np.bincount(codes),
                            )
                        fast(st[0], *hashed[vc])
                    else:
                        spec.update(st[0], flats[vc])
                    st[1] += len(sub)
                    st[2] += len(flats[vc])
        if not states:
            return
        rows = [
            (*k, name, specs[name][0].serialize(st), nrows, nitems)
            for k, kinds in states.items()
            for name, (st, nrows, nitems) in kinds.items()
        ]
        yield pd.DataFrame(rows, columns=[*group_cols, "kind", "sketch", "rows", "items"])

    partials = narrow.mapInPandas(partial_build, schema=out_schema)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        kind = pdf["kind"].iloc[0]
        merged = specs[kind][0].merge_payloads(list(pdf["sketch"]))
        head = pdf.iloc[[0]][group_cols + ["kind"]].reset_index(drop=True)
        head["sketch"] = [merged]
        head["rows"] = [int(pdf["rows"].sum())]
        head["items"] = [int(pdf["items"].sum())]
        return head

    return partials.groupBy(*group_cols, "kind").applyInPandas(merge_group, schema=out_schema)


def collect_sketches(result: DataFrame, spec: SketchSpec, group_cols: list[str] | None):
    """Driver-side: final payloads → {group_key: state} (cold-start load,
    parity with /root/reference/service.go:42-100)."""
    group_cols = list(group_cols or [])
    rows = result.collect()
    if not group_cols:
        assert len(rows) <= 1
        return spec.deserialize(rows[0]["sketch"]) if rows else spec.create()
    out = {}
    for r in rows:
        key = tuple(r[c] for c in group_cols)
        out[key if len(key) > 1 else key[0]] = spec.deserialize(r["sketch"])
    return out


# ---------------------------------------------------------------- query-side


def make_membership_udf(spark: SparkSession, payload: bytes):
    """Broadcast a Bloom payload; return a vectorized membership pandas UDF.

    Parity: query-time ``Test`` gate at /root/reference/service.go:224.
    """
    from .sketches import bloom

    bc = spark.sparkContext.broadcast(payload)

    @F.pandas_udf("boolean")
    def maybe_contains(values: pd.Series) -> pd.Series:
        state = bloom.deserialize(bc.value)
        return pd.Series(bloom.contains(state, values.to_numpy()))

    return maybe_contains


def make_cms_count_udf(spark: SparkSession, payload: bytes):
    """Broadcast a CMS payload; vectorized point-estimate pandas UDF."""
    from .sketches import cms

    bc = spark.sparkContext.broadcast(payload)

    @F.pandas_udf("long")
    def est_count(values: pd.Series) -> pd.Series:
        state = cms.deserialize(bc.value)
        return pd.Series(cms.query(state, values.to_numpy()))

    return est_count


def make_freq_count_udf(spark: SparkSession, payload: bytes):
    """Broadcast a Misra–Gries payload; vectorized point-estimate UDF.

    The MG dual of ``make_cms_count_udf``: CMS never undercounts, MG never
    overcounts — querying both brackets the true frequency from both sides.
    """
    from .sketches import freq

    bc = spark.sparkContext.broadcast(payload)

    @F.pandas_udf("long")
    def est_count(values: pd.Series) -> pd.Series:
        state = freq.deserialize(bc.value)
        return pd.Series(freq.query(state, values.to_numpy()))

    return est_count
