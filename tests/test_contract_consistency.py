"""Driver-contract consistency guards (no Spark session needed)."""

from __future__ import annotations

import __spark_entry__ as E

# ops that are genuinely non-SQL-expressible → rows-only by design
# (the LSH/IVF ANN queries graduated to full oracles in round 2: their
# planes/centroids are md5-derived, so DuckDB reproduces them exactly)
KNOWN_ROWS_ONLY = {
    "hll_distinct_per_source",
    "cms_top_tokens",
    "kll_nchars_quantiles",
    "tdigest_nchars_quantiles",
    "bloom_correct_queries",
}


def test_every_oracle_has_a_query():
    qs, os_ = set(E.queries()), set(E.oracle_sql())
    assert os_ <= qs, f"oracles without queries: {os_ - qs}"


def test_rows_only_set_is_exactly_the_known_one():
    qs, os_ = set(E.queries()), set(E.oracle_sql())
    rows_only = qs - os_
    assert rows_only == KNOWN_ROWS_ONLY, (
        f"unexpected rows-only queries (add an oracle or whitelist): "
        f"{rows_only ^ KNOWN_ROWS_ONLY}"
    )


def test_oracle_sql_is_syntactically_valid_duckdb():
    import duckdb

    con = duckdb.connect()
    # empty views with the production schemas are enough for a parse check
    con.execute('create view documents as select 1::bigint doc_id, \'\'::varchar as "text", \'\'::varchar lang, \'\'::varchar source, 0::bigint n_chars where 1=0')
    con.execute('create view embeddings as select 1::bigint vec_id, []::float[] embedding, 0::int as "label" where 1=0')
    con.execute('create view events as select 1::bigint event_id, now()::timestamp ts, 1::bigint user_id, \'\'::varchar event_type, 0.0::double as "value", \'\'::varchar props where 1=0')
    con.execute("create view lineitem as select 1::bigint l_orderkey, 1::bigint l_partkey, 1::bigint l_suppkey, 1::int l_linenumber, 0.0::double l_quantity, 0.0::double l_extendedprice, 0.0::double l_discount, 0.0::double l_tax, ''::varchar l_returnflag, ''::varchar l_linestatus, now()::timestamp l_shipdate where 1=0")
    con.execute("create view orders as select 1::bigint o_orderkey, 1::bigint o_custkey, ''::varchar o_orderstatus, 0.0::double o_totalprice, now()::timestamp o_orderdate, ''::varchar o_orderpriority where 1=0")
    con.execute("create view customer as select 1::bigint c_custkey, ''::varchar c_name, 1::bigint c_nationkey, 0.0::double c_acctbal, ''::varchar c_mktsegment where 1=0")
    con.execute("create view nation as select 1::bigint n_nationkey, ''::varchar n_name, 1::bigint n_regionkey where 1=0")
    for name, sql in E.oracle_sql().items():
        try:
            con.sql(sql).df()
        except Exception as ex:  # noqa: BLE001
            raise AssertionError(f"oracle {name} failed on empty views: {ex}") from ex
