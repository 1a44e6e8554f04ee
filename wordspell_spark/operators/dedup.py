"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup over a text corpus,
plus embedding-cosine near-dup.  These generalize the reference's
fingerprint-style index keys (wordspell dedups queries with a hash set,
/root/reference/examples/speller/main.go:61-75) to corpus scale.

Design rules for 100 TB:

* Every candidate-pair generator is *bucketed* (LSH bands, simhash bands,
  same-source blocking) so the only shuffles are groupBys on small bucket
  keys — never an all-pairs crossJoin on the full corpus.
* All hashes are md5-derived (`h64`) so results are deterministic across
  engines — the DuckDB oracles in __spark_entry__.py reproduce them
  bit-for-bit. xxhash64 would be faster but is Spark-private; md5 keeps the
  correctness gate honest and is still JVM-side codegen.  In a production
  deployment where no cross-engine oracle is needed, substituting
  ``F.xxhash64`` into ``h64`` (one line) roughly halves signature cost.
* No per-row Python anywhere: relational parts are Catalyst expressions;
  the signature folds (minhash xor/min, simhash bit votes) are Arrow-batched
  numpy UDFs operating on flattened arrays via ``ufunc.reduceat``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ------------------------------------------------------------------ hashing


def h64(col: Column) -> Column:
    """Deterministic 60-bit positive int64 from md5 — engine-portable.

    DuckDB equivalent: cast(('0x' || substr(md5(x),1,15)) as bigint).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def words_of(text: Column) -> Column:
    """Lowercased whitespace tokens (empty-safe)."""
    return F.filter(F.split(F.trim(F.lower(text)), r"\s+"), lambda t: t != F.lit(""))


def shingles_of(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a document (sorted for determinism)."""
    w = words_of(text)
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(w, i, n)),
    )
    return F.array_sort(F.array_distinct(sh))


# ------------------------------------------------------------------- exact


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on a canonical fingerprint: md5 of the sorted word multiset.

    Whitespace/case-insensitive.  Returns one row per distinct fingerprint
    with the kept (min-id) doc and the duplicate count.  One groupBy shuffle
    on the 64-bit fingerprint — partial-aggregated map-side, skew-free.
    """
    fp = h64(F.concat_ws(" ", F.array_sort(words_of(F.col(text_col)))))
    return (
        docs.select(F.col(id_col), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


# ----------------------------------------------------------------- jaccard


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "source",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Same-block doc pairs with n-gram-shingle Jaccard ≥ threshold.

    Blocking on ``block_col`` bounds the pair explosion (at 100 TB you block
    on a partition-grain key; full-corpus near-dup goes through
    ``minhash_lsh_pairs`` below, which needs no block).  Jaccard computed
    with array_intersect/array_union on distinct shingle sets — JVM-side.
    """
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        shingles_of(F.col(text_col), n).alias("sh"),
    ).filter(F.size("sh") > 0)
    a = base.select(F.col("id").alias("id_a"), "blk", F.col("sh").alias("sh_a"))
    b = base.select(F.col("id").alias("id_b"), "blk", F.col("sh").alias("sh_b"))
    pairs = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.round(inter / union, 6)
    return (
        pairs.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------------ minhash

DEFAULT_NUM_PERM = 16
DEFAULT_BAND_ROWS = 4


def _seed_masks(num_perm: int) -> list[int]:
    """Per-permutation xor masks, h64 of the seed index — computed driver-side
    so both Spark and the DuckDB oracle embed the same constants."""
    import hashlib

    return [
        int(hashlib.md5(f"minhash-seed-{s}".encode()).hexdigest()[:15], 16)
        for s in range(num_perm)
    ]


def minhash_signature(text: Column, num_perm: int = DEFAULT_NUM_PERM, n: int = 3) -> Column:
    """MinHash signature: per seed s, min over shingles of (h64(shingle) XOR mask_s).

    One md5 per shingle (the expensive part), then cheap xor re-permutations
    per seed — the classic xor-mask MinHash family.  Entirely row-local (no
    shuffle).  Empty docs get an empty signature.

    NOTE: as a single expression the md5 subtree would be copied into all
    num_perm array slots; use ``minhash_signatures_df`` (staged projections)
    on the hot path so hashes are computed once per row.
    """
    sh = shingles_of(text, n)
    hashes = F.transform(sh, lambda x: h64(x))
    sig = F.array(
        *[
            F.array_min(F.transform(hashes, lambda h: h.bitwiseXOR(F.lit(mask))))
            for mask in _seed_masks(num_perm)
        ]
    )
    return F.when(F.size(sh) > 0, sig).otherwise(F.array().cast("array<bigint>"))


def minhash_signatures_df(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
    n: int = 3,
) -> DataFrame:
    """(id, sig) with the md5 shingle hashes materialized ONCE per row.

    Shingle hashing stays JVM-side (md5, oracle-portable); the per-seed
    xor/min fold runs as an Arrow-batched numpy UDF — flatten all row
    arrays, one ``minimum.reduceat`` per seed — instead of num_perm
    interpreted higher-order-function passes (~20x on the signature stage).
    Values are bit-identical to the expression form (min over xor of
    non-negative < 2^60 ints never touches the sign bit).
    """
    base = docs.select(
        F.col(id_col).alias("id"), shingles_of(F.col(text_col), n).alias("__sh")
    ).filter(F.size("__sh") > 0)
    hashed = base.select("id", F.transform("__sh", lambda x: h64(x)).alias("__hs"))
    masks = np.array(_seed_masks(num_perm), dtype=np.int64)

    @F.pandas_udf("array<bigint>")
    def sig_udf(hs: pd.Series) -> pd.Series:
        lens = hs.str.len().to_numpy(dtype=np.int64)
        if len(lens) == 0:
            return pd.Series([], dtype=object)
        flat = np.concatenate([np.asarray(v, dtype=np.int64) for v in hs])
        offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
        sigs = np.empty((len(masks), len(lens)), dtype=np.int64)
        for i, m in enumerate(masks):
            sigs[i] = np.minimum.reduceat(flat ^ m, offsets)
        return pd.Series(list(sigs.T))

    return hashed.select("id", sig_udf("__hs").alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
    band_rows: int = DEFAULT_BAND_ROWS,
    n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    bands = num_perm/band_rows; two docs are candidates if any band of their
    signatures agrees exactly.  The only shuffle is the self-join on
    (band_idx, band_hash) — bucket sizes follow true duplicate clusters, so
    a pathological cluster (e.g. boilerplate pages) is the data's skew, not
    the algorithm's; cap cluster fan-out upstream with exact_dedup first.
    Returns distinct (id_a, id_b) with id_a < id_b.
    """
    assert num_perm % band_rows == 0
    n_bands = num_perm // band_rows
    base = minhash_signatures_df(docs, text_col, id_col, num_perm, n)
    banded = base.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: h64(F.concat_ws(",", F.transform(F.slice(F.col("sig"), b * band_rows + 1, band_rows), lambda v: v.cast("string")))),
            )
        ).alias("band_idx", "band_hash"),
    )
    # persist: both sides of the self-join share this subplan; without it the
    # md5 shingle hashing runs twice (MLlib's approxSimilarityJoin caches the
    # same way).  Rows are (id, band, hash) — tiny relative to the corpus.
    banded = banded.persist()
    a = banded.select(F.col("id").alias("id_a"), "band_idx", "band_hash")
    b = banded.select(F.col("id").alias("id_b"), "band_idx", "band_hash")
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# ------------------------------------------------------------------ simhash

SIMHASH_BITS = 32


def simhash32(text: Column) -> Column:
    """32-bit SimHash over words: per-word md5 hash, ±1 vote per bit, sign.

    Pure Catalyst: one aggregate per bit over the word-hash array.  32 bits
    (not 64) keeps the expression tree — and the DuckDB oracle — tractable
    while Hamming-band dedup stays meaningful.
    """
    hashes = F.transform(words_of(text), lambda w: h64(w))
    out = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        vote = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        out = out + F.when(vote > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def simhash32_df(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, sh) — same values as ``simhash32``, computed with one JVM md5
    pass plus an Arrow-batched numpy bit-vote fold (add.reduceat per bit)
    instead of 32 interpreted aggregate passes."""
    hashed = docs.select(
        F.col(id_col).alias("id"),
        F.transform(words_of(F.col(text_col)), lambda w: h64(w)).alias("__hs"),
    )

    @F.pandas_udf("long")
    def sh_udf(hs: pd.Series) -> pd.Series:
        m = len(hs)
        if m == 0:
            return pd.Series([], dtype=np.int64)
        lens = hs.str.len().to_numpy(dtype=np.int64)
        sh = np.zeros(m, dtype=np.int64)
        nz = lens > 0
        if nz.any():
            chunks = [np.asarray(v, dtype=np.int64) for v in hs[nz]]
            flat = np.concatenate(chunks)
            nzlens = lens[nz]
            offsets = np.concatenate([[0], np.cumsum(nzlens)[:-1]])
            acc = np.zeros(nz.sum(), dtype=np.int64)
            for b in range(SIMHASH_BITS):
                ones = np.add.reduceat((flat >> b) & 1, offsets)
                # vote = ones - (len - ones); bit set iff vote > 0
                acc += ((2 * ones - nzlens) > 0).astype(np.int64) << b
            sh[nz] = acc
        return pd.Series(sh)

    return hashed.select("id", sh_udf("__hs").alias("sh"))


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    Pigeonhole banding: with n_bands > max_hamming, any pair within the
    Hamming budget agrees exactly on ≥1 band — so the self-join runs on
    (band_idx, band_bits) buckets, never all-pairs.  Exact distance is then
    verified with bit_count(xor) on the candidates only.
    """
    assert n_bands > max_hamming, "pigeonhole requires n_bands > max_hamming"
    assert SIMHASH_BITS % n_bands == 0
    w = SIMHASH_BITS // n_bands
    # persist: the (id, simhash) relation feeds both sides of the band join
    base = simhash32_df(docs, text_col, id_col).persist()
    bands = base.select(
        "id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sh"), b * w).bitwiseAND(F.lit((1 << w) - 1))
                    for b in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_bits"),
    )
    a = bands.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "band_idx", "band_bits")
    b = bands.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "band_idx", "band_bits")
    cand = (
        a.join(b, ["band_idx", "band_bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
