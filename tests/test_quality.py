"""Corpus-conditioned bigram coherence: exact python oracle, edge docs,
ordering sanity (natural text from corpus collocations beats gibberish),
plan shape (Catalyst tokenize + joins, no per-row python)."""

from __future__ import annotations

from collections import Counter

import pytest

from wordspell_spark.operators import quality as Q

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the mat again"),
    (2, "mat the on sat cat zzz qqq"),       # rare collocations
    (3, "the cat sat on the mat the cat sat"),
    (4, "solo"),                              # one token: no pairs
    (5, ""),                                  # empty
]


def _tok(t):
    # mirror the engine's normalize pipeline closely enough for this corpus
    # (plain lowercase ascii words — no cleaning edge cases present)
    return [w for w in t.lower().split() if w]


def _py_scores(docs):
    uni = Counter()
    bi = Counter()
    pairs_by_doc = {}
    for i, t in docs:
        toks = _tok(t)
        uni.update(toks)
        ps = list(zip(toks, toks[1:]))
        pairs_by_doc[i] = ps
        bi.update(ps)
    out = {}
    for i, ps in pairs_by_doc.items():
        out[i] = (len(ps), sum((1000 * bi[p]) // uni[p[0]] for p in ps))
    return out


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


class TestBigramCoherence:
    def test_matches_python_oracle(self, df):
        got = {r["doc_id"]: (r["n_pairs"], r["coherence_sum"])
               for r in Q.bigram_coherence(df).collect()}
        want = _py_scores(DOCS)
        assert got == want

    def test_no_pair_docs_present_as_zero(self, df):
        got = {r["doc_id"]: (r["n_pairs"], r["coherence_sum"])
               for r in Q.bigram_coherence(df).collect()}
        assert got[4] == (0, 0) and got[5] == (0, 0)

    def test_natural_text_outranks_gibberish(self, df):
        got = {r["doc_id"]: r["coherence_sum"] / max(r["n_pairs"], 1)
               for r in Q.bigram_coherence(df).collect()}
        # docs built from the corpus's collocations score above the
        # shuffled/gibberish doc — the filtering property the stage exists for
        assert got[0] > got[2] and got[1] > got[2] and got[3] > got[2]

    def test_plan_no_python_past_tokenize(self, df):
        # arrow default: exactly ONE Arrow stage (the tokenize+pair twin),
        # everything downstream stays Catalyst — and the expr form's window
        # sort-shuffle of the token stream is gone (pairs are row-local)
        plan = Q.bigram_coherence(df)._jdf.queryExecution().executedPlan().toString()
        # the Arrow stage appears once per cached-branch rendering, but is
        # always read through the persisted relation → executes once
        assert "MapInPandas" in plan and "InMemoryTableScan" in plan
        assert "ArrowEvalPython" not in plan
        assert "HashAggregate" in plan  # map-side combined count tables
        assert "Window" not in plan

    def test_expr_plan_stays_pure_catalyst(self, df):
        plan = Q.bigram_coherence(df, impl="expr")._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
        assert "HashAggregate" in plan


class TestRepetitionStats:
    def test_matches_python_oracle(self, spark):
        from collections import Counter

        docs = [
            (0, "spam spam spam spam buy now buy now"),
            (1, "each word appears exactly once here"),
            (2, "aa bb aa cc aa"),
            (3, ""),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r["doc_id"]: (r["n_segments"], r["n_distinct"],
                             r["dup_seg_permille"], r["dup_char_permille"])
               for r in Q.repetition_stats(df).collect()}
        for i, t in docs:
            segs = [w for w in t.split() if w]
            c = Counter(segs)
            n, d = len(segs), len(c)
            tot = sum(len(s) * k for s, k in c.items())
            dis = sum(len(s) for s in c)
            want = (
                n, d,
                (1000 * (n - d)) // n if n else 0,
                (1000 * (tot - dis)) // tot if tot else 0,
            )
            assert got[i] == want, (i, got[i], want)

    def test_vertical_tab_splits_identically_in_both_engines(self, spark):
        # r4 ADVICE: Java \s includes \x0b, RE2 \s does not — the default
        # separator is now an explicit class shared verbatim by the oracle
        import duckdb

        from wordspell_spark.operators.quality import WHITESPACE_SEP

        text = "aa\x0baa bb\x0b\x0baa"
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        got = {r["doc_id"]: (r["n_segments"], r["n_distinct"])
               for r in Q.repetition_stats(df).collect()}
        assert got[0] == (4, 2)  # VT is a separator in Spark...
        segs = duckdb.sql(
            "select unnest(regexp_split_to_array(?, ?)) s", params=[text, WHITESPACE_SEP]
        ).df()["s"].tolist()
        assert [s for s in segs if s] == ["aa", "aa", "bb", "aa"]  # ...and in DuckDB

    def test_spam_outranks_prose(self, spark):
        df = spark.createDataFrame(
            [(0, "buy buy buy buy buy"), (1, "five distinct ordinary words here")],
            "doc_id long, text string")
        got = {r["doc_id"]: r["dup_seg_permille"] for r in Q.repetition_stats(df).collect()}
        assert got[0] == 800 and got[1] == 0


class TestRedactPii:
    def test_redaction_and_counts(self, spark):
        df = spark.createDataFrame(
            [(0, "mail me at bob.smith+x@foo-bar.org or 10.0.0.1 id 123456789"),
             (1, "clean text, short num 12345"),
             (2, "two mails a@b.io c@d.co and 192.168.1.1 255.255.255.255")],
            "doc_id long, text string")
        rows = {r["doc_id"]: r for r in Q.redact_pii(df).collect()}
        assert rows[0]["redacted"] == "mail me at <EMAIL> or <IP> id <NUM>"
        assert (rows[0]["n_email"], rows[0]["n_ipv4"], rows[0]["n_longnum"]) == (1, 1, 1)
        assert rows[1]["redacted"] == "clean text, short num 12345"
        assert (rows[1]["n_email"], rows[1]["n_ipv4"], rows[1]["n_longnum"]) == (0, 0, 0)
        assert rows[2]["n_email"] == 2 and rows[2]["n_ipv4"] == 2

    def test_email_digits_not_double_counted(self, spark):
        df = spark.createDataFrame([(0, "x123456789@example.com")], "doc_id long, text string")
        r = Q.redact_pii(df).collect()[0]
        # the digit run lives inside the email: redacted as <EMAIL>, and the
        # longnum stage sees the placeholder, not the digits
        assert r["redacted"] == "<EMAIL>" and r["n_email"] == 1 and r["n_longnum"] == 0

    def test_plan_pure_catalyst(self, spark):
        df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        plan = Q.redact_pii(df)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
