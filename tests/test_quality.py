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
        plan = Q.bigram_coherence(df)._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
        assert "HashAggregate" in plan  # map-side combined count tables
