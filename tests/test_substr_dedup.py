"""ExactSubstr dedup (llmdata.dedup.exact_substring_dedup).

Arbitrary-offset repeated-substring masking: the re-expression of the
suffix-array treatment (Lee et al. 2022) as stride-1 window hashing +
keep-first rank + position anti-join. Planted fixtures pin the exact
keep/mask contract the docstring promises.
"""

from __future__ import annotations

import pytest

from stock_indicators_etl_spark.llmdata.dedup import exact_substring_dedup


def _rows(out):
    return {r.doc_id: r for r in out.orderBy("doc_id").collect()}


class TestExactSubstringDedup:
    def test_cross_doc_repeat_masks_later_doc_only(self, spark):
        # 12-word phrase at offset 0 in doc 1, offset 3 in doc 2:
        # doc 1 keeps everything, doc 2 loses exactly the phrase.
        phrase = " ".join(f"w{i}" for i in range(12))
        d1 = phrase + " tail1 tail2"
        d2 = "a b c " + phrase + " z1 z2"
        df = spark.createDataFrame(
            [(1, d1), (2, d2)], "doc_id bigint, text string"
        )
        out = _rows(exact_substring_dedup(df, min_words=12))
        assert out[1].clean_text == d1
        assert out[1].n_words_kept == out[1].n_words == 14
        assert out[2].clean_text == "a b c z1 z2"
        assert out[2].n_words == 17 and out[2].n_words_kept == 5

    def test_long_repeat_fully_masked(self, spark):
        # A 20-word repeat is covered by its 9 overlapping 12-windows:
        # ALL 20 words of the later occurrence must go, not just 12.
        phrase = " ".join(f"p{i}" for i in range(20))
        df = spark.createDataFrame(
            [(1, phrase), (2, "x1 x2 " + phrase + " y1")],
            "doc_id bigint, text string",
        )
        out = _rows(exact_substring_dedup(df, min_words=12))
        assert out[1].clean_text == phrase
        assert out[2].clean_text == "x1 x2 y1"

    def test_within_doc_self_repeat(self, spark):
        # The same 12-word phrase twice in ONE doc: first occurrence
        # survives, second is masked (global (doc_id, pos) order).
        phrase = " ".join(f"s{i}" for i in range(12))
        df = spark.createDataFrame(
            [(1, phrase + " mid " + phrase)], "doc_id bigint, text string"
        )
        out = _rows(exact_substring_dedup(df, min_words=12))
        assert out[1].clean_text == phrase + " mid"
        assert out[1].n_words == 25 and out[1].n_words_kept == 13

    def test_short_docs_and_empty_untouched(self, spark):
        # Docs under min_words emit no windows and survive verbatim,
        # even when they are exact duplicates of each other.
        df = spark.createDataFrame(
            [(1, "dup dup dup"), (2, "dup dup dup"), (3, "")],
            "doc_id bigint, text string",
        )
        out = _rows(exact_substring_dedup(df, min_words=12))
        assert out[1].clean_text == out[2].clean_text == "dup dup dup"
        assert out[3].clean_text == "" and out[3].n_words == 0

    def test_eleven_word_overlap_not_masked(self, spark):
        # Sharing only min_words-1 consecutive words is NOT a repeat.
        share = " ".join(f"c{i}" for i in range(11))
        df = spark.createDataFrame(
            [(1, share + " only1"), (2, share + " only2")],
            "doc_id bigint, text string",
        )
        out = _rows(exact_substring_dedup(df, min_words=12))
        assert out[1].n_words_kept == 12
        assert out[2].n_words_kept == 12

    def test_keep_first_is_position_ordered_within_doc(self, spark):
        # Two distinct repeats interleaved: each masks independently.
        a = " ".join(f"a{i}" for i in range(12))
        b = " ".join(f"b{i}" for i in range(12))
        df = spark.createDataFrame(
            [(1, a), (2, b), (3, a + " " + b)],
            "doc_id bigint, text string",
        )
        out = _rows(exact_substring_dedup(df, min_words=12))
        assert out[3].clean_text == ""
        assert out[3].n_words == 24 and out[3].n_words_kept == 0

    def test_normalization_case_and_whitespace(self, spark):
        # Matching happens on normalized text (lower + collapsed ws).
        phrase = " ".join(f"n{i}" for i in range(12))
        df = spark.createDataFrame(
            [(1, phrase), (2, "  " + phrase.upper().replace(" ", "   ") + " ")],
            "doc_id bigint, text string",
        )
        out = _rows(exact_substring_dedup(df, min_words=12))
        assert out[2].clean_text == "" and out[2].n_words_kept == 0
