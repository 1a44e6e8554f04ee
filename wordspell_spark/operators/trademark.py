"""Trademark longest-match lookup (J3/F1).

Parity: /root/reference/components/trademarkindex/service.go:67-119 (Find)
and /root/reference/processors/trademarks/processor.go:15-50 (leftmost scan).
Semantics: case-sensitive; the first token must equal a trademark head; among
tails registered for that head, the LONGEST one fully matching the following
tokens wins (an empty tail allows a one-word match); matched spans are
protected from spell correction; scanning resumes after the span.

Two implementations:

* ``protect_spans_batch`` — serving-path kernel over a flat token batch
  (used inside correct_queries' mapInPandas).  Matching is vectorized with a
  hash join of query n-grams against the broadcast trademark set; only the
  greedy non-overlap resolution walks match candidates (bounded by match
  count, not token count).
* ``longest_match`` — declarative DataFrame operator: explode n-grams →
  broadcast hash join → window rank, the oracle-checkable J3 shape
  (SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sketches.hashing import hash64

MAX_TM_WORDS = 6  # longest trademark phrase considered


def _tm_phrase_hashes(trademarks: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(sorted phrase hashes, their word counts)."""
    if not trademarks:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    phrases = np.array([" ".join(t.split()) for t in trademarks], dtype=object)
    lens = np.array([len(p.split()) for p in phrases], dtype=np.int64)
    h = hash64(phrases)
    order = np.argsort(h)
    return h[order], lens[order]


def protect_spans_batch(tokens: np.ndarray, qid: np.ndarray, trademarks: list[str]) -> np.ndarray:
    """Mark tokens inside greedy leftmost-longest trademark spans.

    Case-sensitive exact matching like the reference (trademark casing is
    canonical, service_test.go trademark cases).
    """
    n = len(tokens)
    protected = np.zeros(n, dtype=bool)
    if n == 0 or not trademarks:
        return protected
    hset, _ = _tm_phrase_hashes(trademarks)
    toks = np.asarray(tokens, dtype=object)
    qid = np.asarray(qid)

    # candidate (start, length) matches via vectorized n-gram hashing
    cand_start, cand_len = [], []
    grams = toks.copy()
    for ln in range(1, MAX_TM_WORDS + 1):
        if ln > n:
            break
        if ln > 1:
            nxt = np.concatenate([toks[ln - 1 :], np.array([""] * (ln - 1), dtype=object)])
            same_q = np.concatenate([qid[ln - 1 :] == qid[: n - ln + 1], np.zeros(ln - 1, dtype=bool)])
            grams = np.array([a + " " + b for a, b in zip(grams, nxt)], dtype=object)
        else:
            same_q = np.ones(n, dtype=bool)
        h = hash64(grams)
        pos = np.searchsorted(hset, h).clip(max=max(hset.size - 1, 0))
        hit = same_q & (hset.size > 0) & (hset[pos] == h)
        for s in np.flatnonzero(hit):
            cand_start.append(s)
            cand_len.append(ln)
    if not cand_start:
        return protected
    starts = np.array(cand_start)
    lens = np.array(cand_len)
    # greedy leftmost-longest non-overlapping (processor.go scan order)
    order = np.lexsort((-lens, starts))
    next_free = -1
    for i in order:
        s, ln = starts[i], lens[i]
        if s >= next_free:
            protected[s : s + ln] = True
            next_free = s + ln
        # overlapping shorter/later candidates skipped
    return protected


def longest_match(tokens_df: DataFrame, trademarks_df: DataFrame) -> DataFrame:
    """Declarative J3: per (doc, position), the longest trademark starting
    there.  tokens_df: [doc_id, pos, word]; trademarks_df: [name].

    Plan shape: n-gram generation stays narrow (lead window), the join is a
    broadcast hash join (trademark dims are small — 5000-row scan batches in
    the reference, trademarkindex/builder.go:13), and the longest-wins rule
    is a rank-1 window — no shuffle of the corpus beyond the window sort.
    """
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = tokens_df.select(
        "doc_id",
        "pos",
        F.col("word").alias("g1"),
        *[
            F.concat_ws(
                " ", *[F.lead("word", i).over(w) for i in range(ln)]
            ).alias(f"g{ln}")
            for ln in range(2, MAX_TM_WORDS + 1)
        ],
    )
    stacked = grams.selectExpr(
        "doc_id",
        "pos",
        f"stack({MAX_TM_WORDS}, "
        + ", ".join(f"{ln}, g{ln}" for ln in range(1, MAX_TM_WORDS + 1))
        + ") as (ngram_len, ngram)",
    ).filter(F.col("ngram").isNotNull())
    tm = F.broadcast(trademarks_df.select(F.col("name").alias("ngram")).distinct())
    hits = stacked.join(tm, "ngram")
    rank_w = Window.partitionBy("doc_id", "pos").orderBy(F.desc("ngram_len"))
    return (
        hits.withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "pos", F.col("ngram").alias("trademark"), "ngram_len")
    )
