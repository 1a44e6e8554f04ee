"""Frequency-index build operators — the offline pipeline (SURVEY.md §3.2).

Spark-first re-expression of the reference's ``Builder.Build()``
(/root/reference/builder.go:60-95, components/index/builder.go:58-108):

    scan → normalize/tokenize → unigram + bigram hash-agg → threshold
    filter → union → freq-desc index

Every step is a declarative DataFrame op: Catalyst gives partial+final hash
aggregation (the reference's hand-rolled accumulator merge,
index/models.go:58-72), predicate pushdown for thresholds, and AQE-coalesced
shuffles.  At 100 TB the only shuffles are the two groupBys on (lang, word) —
pre-aggregated map-side, so skew in raw documents never reaches the wire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T

# Reference thresholds (components/index/builder.go:24-26).
DEFAULT_THRESHOLDS = {"ru": 23, "en": 10}
DEFAULT_PAIR_THRESHOLD = 50
NUM_WEIGHT = 1000  # index/models.go:8, service.go:95-97


def tokenized_words(df: DataFrame, text_col: str, doc_cols: list[str]) -> DataFrame:
    """posexplode of the normalized word array → (doc_cols..., pos, word, lang).

    Position is kept so bigram formation can window over it (W1).
    """
    words = df.select(*doc_cols, F.posexplode(T.normalize_words(F.col(text_col))).alias("pos", "word"))
    return words.withColumn("lang", T.lang_of_token(F.col("word")))


def word_counts(words: DataFrame) -> DataFrame:
    """Unigram frequency agg (A1, index/builder.go:224-246)."""
    return (
        words.filter(F.col("lang").isin("ru", "en"))
        .groupBy("lang", "word")
        .agg(F.count("*").alias("freq"))
    )


def bigram_counts(words: DataFrame, doc_cols: list[str]) -> DataFrame:
    """Adjacent same-language pair counts (A2/W1/J4).

    ``lead(word) over (partition by doc order by pos)`` forms the 2-wide
    frame the reference iterates imperatively (index/builder.go:224-243);
    only same-language adjacent pairs count (langdetect ParseWordPair,
    component.go:90-129).
    """
    w = Window.partitionBy(*doc_cols).orderBy("pos")
    paired = words.withColumn("next_word", F.lead("word").over(w)).withColumn(
        "next_lang", F.lead("lang").over(w)
    )
    return (
        paired.filter(
            (F.col("next_word").isNotNull())
            & (F.col("lang") == F.col("next_lang"))
            & F.col("lang").isin("ru", "en")
        )
        .select("lang", F.concat_ws(" ", "word", "next_word").alias("word"))
        .groupBy("lang", "word")
        .agg(F.count("*").alias("freq"))
    )


def threshold_filter(freq_df: DataFrame, thresholds: dict[str, int]) -> DataFrame:
    """HAVING freq >= per-lang threshold (P7, index/builder.go:71-93)."""
    cond = None
    for lang, t in thresholds.items():
        c = (F.col("lang") == lang) & (F.col("freq") >= t)
        cond = c if cond is None else cond | c
    return freq_df.filter(cond)


def build_frequency_index(
    df: DataFrame,
    text_col: str,
    doc_cols: list[str],
    thresholds: dict[str, int] | None = None,
    pair_threshold: int = DEFAULT_PAIR_THRESHOLD,
    include_pairs: bool = True,
) -> DataFrame:
    """Full index build: unigrams ∪ bigrams after thresholds (U1).

    Returns DataFrame[lang, word, freq] — the Spark equivalent of
    ru.index/en.index content (index/builder.go:191-217).
    """
    thresholds = thresholds or DEFAULT_THRESHOLDS
    words = tokenized_words(df, text_col, doc_cols)
    uni = threshold_filter(word_counts(words), thresholds)
    if not include_pairs:
        return uni
    pairs = threshold_filter(
        bigram_counts(words, doc_cols), {lang: pair_threshold for lang in thresholds}
    )
    # unionByName + key-wise sum = wordCollection.merge (index/models.go:58-72)
    return (
        uni.unionByName(pairs)
        .groupBy("lang", "word")
        .agg(F.sum("freq").alias("freq"))
    )


def weight_lookup(tokens_df: DataFrame, index_df: DataFrame, token_col: str = "word") -> DataFrame:
    """Exact index probe with weight ranking (J1, index/service.go:84-110).

    Broadcast hash join — the index after thresholds is small relative to the
    corpus (this is why the reference can hold it in RAM).  Numbers get the
    fixed pseudo-weight 1000; misses get 0.
    """
    idx = F.broadcast(index_df.select(F.col("lang").alias("__ilang"), F.col("word").alias("__iword"), "freq"))
    joined = tokens_df.join(
        idx,
        (F.col(token_col) == F.col("__iword")) & (F.col("lang") == F.col("__ilang")),
        "left",
    ).drop("__ilang", "__iword")
    weight = (
        F.when(F.col("lang") == "num", F.lit(NUM_WEIGHT))
        .otherwise(F.coalesce(F.col("freq"), F.lit(0)))
        .cast("long")
    )
    return joined.withColumn("weight", weight).drop("freq")


def save_index(index_df: DataFrame, path: str) -> None:
    """Index text-format sink (S6): word\\tfreq, freq desc, one dir per lang."""
    (
        index_df.repartition("lang")
        .sortWithinPartitions(F.desc("freq"))
        .write.mode("overwrite")
        .partitionBy("lang")
        .option("sep", "\t")
        .csv(path)
    )


def load_index(spark, path: str) -> DataFrame:
    """Index text-format source (S7, index/service.go:176-245); duplicate
    keys are summed exactly as the reference does on load."""
    df = (
        spark.read.option("sep", "\t")
        .schema("word STRING, freq LONG")
        .csv(path)
    )
    # partition dir lang=... is recovered automatically by Spark
    return df.groupBy("lang", "word").agg(F.sum("freq").alias("freq"))
