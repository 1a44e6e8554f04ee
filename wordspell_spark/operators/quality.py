"""Corpus-conditioned quality scoring — the CCNet-style filtering stage.

``functions/text.py``'s quality signals are row-local (length, punctuation,
stopword ratios); web-corpus pipelines additionally score each document
against a language model TRAINED ON THE CORPUS ITSELF (CCNet's
perplexity-bucket filter).  ``bigram_coherence`` is that stage with integer
arithmetic instead of log-space floats, so the score is bit-exactly
reproducible in any engine (the DuckDB oracle replicates it):

    coherence(doc) = Σ over adjacent token pairs (a, b) of
                     (1000 * corpus_count(a, b)) div corpus_count(a)

— the sum of empirical conditional next-token probabilities in permille.
Gibberish and boilerplate-free spam score low (their bigrams are rare);
natural text built from the corpus's own collocations scores high.  Rank
order matches the log-likelihood filter for the decisions that matter
(low-tail cutoffs), while staying exact.

Scale shape: one pass to tokenize (Catalyst posexplode), two map-side
combined groupBys for the corpus unigram/bigram tables, then two joins that
re-attach the counts to the per-doc pair stream.  The n-gram tables are the
small side at web scale (vocab² bounded, heavy-tailed) — AQE broadcasts
them when they fit; nothing here is per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import index_build as IB


def bigram_coherence(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_pairs, coherence_sum) — corpus-trained bigram coherence.

    Tokenization is the engine's standard normalize pipeline
    (``index_build.tokenized_words``); pairs are adjacent tokens within a
    doc regardless of language (the LM sees the document as the corpus
    wrote it).  ``coherence_sum`` is the integer permille sum defined in
    the module docstring; callers threshold on ``coherence_sum div
    n_pairs`` (mean conditional probability) or on the sum directly.
    Docs with fewer than 2 tokens get (0, 0) — present, never dropped."""
    words = IB.tokenized_words(docs, text_col, [id_col])
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = (
        words.withColumn("next_word", F.lead("word").over(w))
        .filter(F.col("next_word").isNotNull())
        .select(id_col, F.col("word").alias("a"), F.col("next_word").alias("b"))
    )
    uni = words.groupBy(F.col("word").alias("a")).agg(F.count("*").alias("c_a"))
    bi = pairs.groupBy("a", "b").agg(F.count("*").alias("c_ab"))
    scored = (
        pairs.join(bi, ["a", "b"])
        .join(uni, "a")
        .withColumn("permille", F.expr("(1000 * c_ab) div c_a"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("permille").cast("long").alias("coherence_sum"),
    )
    # docs without a single pair still appear, scored (0, 0)
    all_ids = docs.select(id_col).distinct()
    return (
        all_ids.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("coherence_sum", F.lit(0)).alias("coherence_sum"),
        )
    )
