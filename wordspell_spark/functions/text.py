"""Text normalization / analysis as Catalyst column expressions.

Everything here is built from ``pyspark.sql.functions`` only — JVM-side,
whole-stage-codegen-friendly, no Python in the hot path.  Parity targets are
the reference's scalar string processors (SURVEY.md §2.2, §2.7):

* clean_text      — domain/common.go:20  (CleanTextRE)
* clean_index_text— domain/common.go:21  (CleanIndexRE)
* strip_html      — index/builder.go:248-271 (htmlAddSpacesRE + sanitize)
* tokenize        — strings.Fields split (service.go:103, builder.go:264)
* word_filter     — builder.go:286-299 (runeLen<2, hyphen/quote edges)
* lang_of_token   — langdetect/component.go:21-88
* dim/paper/unit regex canonicalizers — processors/{dimsuffix,papersizes,units}

plus training-data text analysis ops (quality scoring, token counting,
fingerprinting, n-gram language id) that a 100 TB pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Parity with CleanTextRE (domain/common.go:20): anything outside the allowed
# alphabet becomes a space; lone " - " also removed.
_CLEAN_TEXT_BAD = r"[^0-9a-zA-Zа-яА-ЯёЁ\s\-.,+=`'*%]"
# Parity with CleanIndexRE (domain/common.go:21): stricter corpus alphabet —
# note digits are NOT allowed on the index side.
_CLEAN_INDEX_BAD = r"[^a-zA-Zа-яА-ЯёЁ\s\-`']"


def clean_text(col: Column) -> Column:
    c = F.regexp_replace(col, _CLEAN_TEXT_BAD, " ")
    return F.regexp_replace(c, r"\s-\s", " ")


def clean_index_text(col: Column) -> Column:
    c = F.regexp_replace(col, _CLEAN_INDEX_BAD, " ")
    return F.regexp_replace(c, r"\s-\s", " ")


def strip_html(col: Column) -> Column:
    """Insert spaces at tag boundaries, drop tags, then unescape the five
    standard entities (builder.go:248-271).

    Deliberate divergence from bluemonday StrictPolicy, documented for the
    parity record: bluemonday re-escapes text nodes (``&`` → ``&amp;``),
    which the reference's downstream alphabet regex then shreds into an
    ``amp`` token; here entities decode to their characters and the
    alphabet filter simply drops them.  Unclosed tags (``<foo`` with no
    ``>``) survive to the alphabet filter rather than swallowing the rest
    of the line.  ``&amp;`` decodes LAST so ``&amp;lt;`` yields the
    literal ``&lt;`` (no double-unescape)."""
    c = F.regexp_replace(col, r"<[^>]*>", " ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def tokenize(col: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped (strings.Fields parity)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != F.lit(""))


def is_valid_word(tok: Column) -> Column:
    """Word filter parity (index/builder.go:286-299): ≥2 chars, no leading or
    trailing '-', no leading backtick/apostrophe."""
    return (
        (F.length(tok) >= 2)
        & ~tok.startswith("-")
        & ~tok.endswith("-")
        & ~tok.startswith("`")
        & ~tok.startswith("'")
    )


def normalize_words(col: Column) -> Column:
    """Lowercased, filtered token array from raw text — the index-build
    tokenization path (P2→P4→P5→P6)."""
    toks = tokenize(clean_index_text(F.lower(col)))
    return F.filter(toks, is_valid_word)


# ------------------------------------------------- Python twin (hot path)
#
# normalize_words evaluates as INTERPRETED higher-order functions (filter
# with a lambda never enters whole-stage codegen), which dominates every
# operator that tokenizes the full corpus.  The twin below reproduces it
# bit-for-bit in plain Python for Arrow-batched hot paths (the same parity
# discipline as dedup._py_words, property-tested in
# tests/test_vectorized_parity.py):
#
# * Java regex \s is ASCII-only ([ \t\n\x0b\f\r]) — spelled explicitly so
#   Python's Unicode \s (which adds \x1c-\x1f, \x85, \xa0, …) can't diverge.
# * Spark lower() and Python str.lower() both apply Unicode default case
#   mappings; the locale-sensitive divergences (final sigma, dotted I) map
#   outside the [a-zа-яё\-`'] alphabet and are erased by the clean regex
#   either way.
# * F.length / startswith / endswith count code points, as Python does.

import re as _re

_CLEAN_INDEX_BAD_PY = _re.compile(r"[^a-zA-Zа-яА-ЯёЁ \t\n\x0b\f\r\-`']")
_DASH_PY = _re.compile(r"[ \t\n\x0b\f\r]-[ \t\n\x0b\f\r]")
_WS_PY = _re.compile(r"\s+", _re.ASCII)


def py_normalize_words(text: str | None) -> list[str]:
    """Python twin of ``normalize_words`` — bit-identical token lists."""
    if text is None:
        return []
    t = _DASH_PY.sub(" ", _CLEAN_INDEX_BAD_PY.sub(" ", text.lower()))
    return [
        w
        for w in _WS_PY.split(t)
        if len(w) >= 2
        and not w.startswith(("-", "`", "'"))
        and not w.endswith("-")
    ]


_NUM_RE = r"^[0-9]+([.,][0-9]+)?$"
_RU_RE = r"^[а-яё\-`']+$"
_EN_RE = r"^[a-z\-`']+$"


def lang_of_token(tok: Column) -> Column:
    """Language tag of a lowercase token: num / ru / en / unknown.

    Column-expression analogue of LangByWord (langdetect/component.go:21-88).
    The reference tolerates ≤2 illegal runes by majority vote; we classify on
    the clean alphabet (inputs come pre-cleaned by clean_* above), which
    matches its behavior on all golden test words
    (langdetect/component_test.go:10-101).
    """
    return (
        F.when(tok.rlike(_NUM_RE), F.lit("num"))
        .when(tok.rlike(_RU_RE), F.lit("ru"))
        .when(tok.rlike(_EN_RE), F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


# ------------------------------------------------------- regex canonicalizers


def canon_dim_suffix(col: Column) -> Column:
    """'4 д'/'3d' → '4Д'-style canonical dimension suffix
    (processors/dimsuffix/processor.go:16-34; run twice for adjacency)."""
    pat = r"([2-5])\s?[dDдД]"
    c = F.regexp_replace(col, pat, r"$1D")
    return F.regexp_replace(c, pat, r"$1D")


def canon_paper_size(col: Column) -> Column:
    """'a 5'/'а5' → 'A5' (processors/papersizes/processor.go:16-48),
    Cyrillic А/В mapped to Latin A/B."""
    c = F.regexp_replace(col, r"[aAаА]\s?([0-6])(?![0-9])", r"A$1")
    return F.regexp_replace(c, r"[bBВв]\s?([0-6])(?![0-9])", r"B$1")


def canon_dimensions(col: Column) -> Column:
    """'333 x 44x 55' → '333*44*55' (processors/dimensions/processor.go:18-43)."""
    c = F.regexp_replace(col, r"(\d)\s?[xXхХ*/]\s?(?=\d)", r"$1*")
    return c


# ------------------------------------------------------- analysis (pipeline ops)

_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on",
    "with", "as", "at", "by", "from", "that", "this", "be", "are", "was",
]


def token_count(text: Column) -> Column:
    """Whitespace token count — cheap size estimate for budget planning."""
    return F.size(tokenize(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-style subword count estimate: words + punctuation clusters, long
    words weighted by ceil(len/4) (common ~4 chars/token heuristic)."""
    words = tokenize(F.regexp_replace(text, r"([^\w\s])", r" $1 "))
    return F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int"),
    )


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: alpha ratio, stopword presence,
    mean word length sanity, punctuation ratio.  All Catalyst expressions."""
    n_chars = F.greatest(F.length(text), F.lit(1))
    alpha_ratio = (F.length(F.regexp_replace(text, r"[^A-Za-zа-яА-Я ]", "")) / n_chars)
    punct_ratio = (F.length(F.regexp_replace(text, r"[^!?.,;:*%#@$^&]", "")) / n_chars)
    words = tokenize(F.lower(text))
    n_words = F.greatest(F.size(words), F.lit(1))
    stop_hits = F.size(F.array_intersect(words, F.array(*[F.lit(s) for s in _STOPWORDS])))
    stop_score = F.least(stop_hits / F.lit(3.0), F.lit(1.0))
    mean_wlen = F.length(text) / n_words
    wlen_score = F.when((mean_wlen >= 3) & (mean_wlen <= 12), F.lit(1.0)).otherwise(F.lit(0.3))
    raw = alpha_ratio * 0.4 + stop_score * 0.3 + wlen_score * 0.2 + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.1
    return F.round(raw, 4)


def fingerprint(text: Column) -> Column:
    """64-bit document fingerprint: xxhash64 of the sorted normalized word
    multiset — whitespace/casing/punctuation-insensitive exact-dup key."""
    words = F.array_sort(normalize_words(text))
    return F.xxhash64(F.concat_ws(" ", words))


def simhash(text: Column, bits: int = 64) -> Column:
    """SimHash over normalized words, pure Catalyst: per-word xxhash64, sum
    ±1 per bit position, sign → bit.  near-dup fingerprint for Hamming
    bucketing."""
    words = normalize_words(text)
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    bit_cols = []
    for b in range(bits):
        contrib = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        # shiftleft stays JVM-side: a python literal 1<<63 overflows int64
        bit_cols.append(
            F.when(contrib > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out.bitwiseOR(c)
    return out
