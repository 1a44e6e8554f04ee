"""Distributed BPE tokenizer training + encoding.

Training a byte-pair-encoding vocabulary over the corpus is a canonical
100 TB-pipeline stage (the tokenizer itself is learned from the data the
engine cleans/dedups/packs).  The scale design is the classic one:

1. ONE pass collapses the corpus to the distinct-word frequency table
   (``explode(split)`` → groupBy — map-side combined; at web scale this is
   ~10^8 rows instead of 10^12 tokens, and it is the ONLY pass that reads
   the corpus).
2. The iterative merge loop runs over that small cached table: per
   iteration, a pure-Catalyst adjacent-pair count (``transform`` +
   ``explode`` + groupBy, map-side combined, weighted by word frequency),
   a driver-side argmax of ONE row, and one Arrow-batched merge
   application.  Driver traffic per iteration is a single (pair, count)
   row; the shuffle moves |distinct pairs| rows, never corpus rows.

Determinism: symbols are UTF-8 bytes (0-255, no OOV) plus learned ids
256, 257, ...; ties on pair count break by (a asc, b asc), so the merge
sequence is a pure function of the corpus — the property the contract
oracle exploits (see ``bpe_run_tokens``: on run-corpora the learned chain
and the encoded token counts are arithmetically predictable).

Reference parity note: the wordspell reference has no tokenizer-training
path (`/root/reference/` serves a fixed index); this is LLM-pipeline
extension surface, following the original Sennrich BPE formulation
(adjacent-pair counts incl. overlaps; merges applied left-to-right).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType, StructField, StructType

FIRST_LEARNED_ID = 256  # 0-255 are UTF-8 byte symbols


def _merge_one(seq: list[int], a: int, b: int, new_id: int) -> list[int]:
    """Apply one merge left-to-right, non-overlapping — the Sennrich rule."""
    out: list[int] = []
    i, n = 0, len(seq)
    while i < n:
        if i + 1 < n and seq[i] == a and seq[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _word_table(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus → (sym: array<int> of UTF-8 bytes, count) distinct-word table."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )

    @F.pandas_udf(ArrayType(IntegerType()))
    def to_bytes(word: pd.Series) -> pd.Series:
        return word.map(lambda w: list(w.encode("utf-8")))

    return words.select(to_bytes("word").alias("sym"), "count")


_PAIRS_EXPR = (
    "CASE WHEN size(sym) < 2 THEN array() "
    "ELSE transform(sequence(1, size(sym) - 1), i -> struct(sym[i-1] AS a, sym[i] AS b)) END"
)


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[int, int, int]]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns [(a, b, new_id), ...] in learned order (new_id = 256, 257, ...).
    Stops early when no adjacent pair reaches ``min_count``.  Each
    iteration persists the re-symbolized word table and truncates lineage
    every ``checkpoint_every`` rounds so the plan never grows unbounded.
    """
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    cur = _word_table(docs, text_col).persist()
    cur.count()
    merges: list[tuple[int, int, int]] = []
    try:
        for m in range(n_merges):
            top = (
                cur.select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"), "count")
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("count").alias("total"))
                .orderBy(F.desc("total"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["total"] < min_count:
                break
            a, b = int(top[0]["a"]), int(top[0]["b"])
            new_id = FIRST_LEARNED_ID + m
            merges.append((a, b, new_id))

            def apply(batches: Iterator[pd.DataFrame], _a=a, _b=b, _n=new_id):
                for pdf in batches:
                    pdf = pdf.copy()
                    pdf["sym"] = pdf["sym"].map(lambda s: _merge_one(list(s), _a, _b, _n))
                    yield pdf

            schema = StructType(
                [StructField("sym", ArrayType(IntegerType())), StructField("count", LongType())]
            )
            nxt = cur.mapInPandas(apply, schema=schema)
            if (m + 1) % checkpoint_every == 0:
                nxt = nxt.localCheckpoint(eager=False)  # truncate lineage
            nxt = nxt.persist()
            nxt.count()
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return merges


_ASCII_WS = re.compile(r"\s+", re.ASCII)  # Java regex \s is ASCII-only


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[int, int, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list: (id, tokens array<int>, n_tokens).

    Word splitting is the SAME convention training uses — Java-regex
    ``\\s+`` is ASCII-only, so the python twin splits with ``re.ASCII``
    (a Unicode ``str.split`` would swallow NBSP/U+2028-style separator
    bytes that training kept inside words).  Merges are applied per word
    in learned order — exactly the training symbolization, so
    ``encode(train_corpus)`` reproduces the final word table.  NULL text
    encodes to zero tokens.  Row-local mapInPandas; the merge list ships
    in the closure (KBs)."""
    mseq = [(int(a), int(b), int(n)) for a, b, n in merges]
    id_type = docs.schema[id_col].dataType

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def enc(text) -> list[int]:
            if text is None:
                return []
            out: list[int] = []
            for w in _ASCII_WS.split(text):
                if not w:
                    continue
                seq = list(w.encode("utf-8"))
                for a, b, n in mseq:
                    if len(seq) < 2:
                        break
                    seq = _merge_one(seq, a, b, n)
                out.extend(seq)
            return out

        for pdf in batches:
            toks = pdf[text_col].map(enc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_tokens": toks.map(len).astype("int64"),
                }
            )

    schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("tokens", ArrayType(IntegerType())),
            StructField("n_tokens", LongType()),
        ]
    )
    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)


def vocab_bytes(merges: list[tuple[int, int, int]]) -> dict[int, bytes]:
    """id → byte string for every symbol (256 base bytes + learned)."""
    vocab = {i: bytes([i]) for i in range(256)}
    for a, b, n in merges:
        vocab[n] = vocab[a] + vocab[b]
    return vocab
