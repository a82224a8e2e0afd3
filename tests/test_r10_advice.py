"""Round-10 ADVICE regression tests: idempotent streaming sink,
unigram_lm text_col / vocab-clamp / n_rounds=0, zero-frame AVI skip,
blocklist term normalization."""

from __future__ import annotations

import numpy as np
import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestIdempotentSink:
    def test_replayed_batch_does_not_duplicate(self, spark, tmp_path):
        """foreachBatch is at-least-once: a batch replayed after a
        failure between write and checkpoint commit must OVERWRITE
        its own batch_id partition, not append a second copy."""
        from stock_indicators_etl_spark.streaming.sink import (
            write_batch_idempotent,
        )

        out = spark.createDataFrame(
            [(1, "a"), (2, "b")], "doc_id long, v string"
        )
        path = str(tmp_path / "sink")
        write_batch_idempotent(out, path, batch_id=0)
        write_batch_idempotent(out, path, batch_id=0)  # the replay
        got = spark.read.parquet(path)
        assert got.count() == 2
        assert sorted(r["doc_id"] for r in got.collect()) == [1, 2]

    def test_distinct_batches_accumulate(self, spark, tmp_path):
        from stock_indicators_etl_spark.streaming.sink import (
            write_batch_idempotent,
        )

        a = spark.createDataFrame([(1, "a")], "doc_id long, v string")
        b = spark.createDataFrame([(2, "b")], "doc_id long, v string")
        path = str(tmp_path / "sink2")
        write_batch_idempotent(a, path, batch_id=0)
        write_batch_idempotent(b, path, batch_id=1)
        got = spark.read.parquet(path)
        assert got.count() == 2
        # batch_id survives as an audit partition column
        assert sorted(r["batch_id"] for r in got.collect()) == [0, 1]


class TestUnigramAdviceFixes:
    def test_encode_custom_text_col(self, spark):
        """unigram_encode(text_col='body') must read the selected
        column, not hard-code b['text'] (KeyError in the executor)."""
        from stock_indicators_etl_spark.llmdata.unigram_lm import (
            train_unigram_lm,
            unigram_encode,
        )

        docs = _docs(spark, [(1, "data pipe data"), (2, "pipe data")])
        vocab = train_unigram_lm(docs, vocab_size=24, n_rounds=1)
        renamed = spark.createDataFrame(
            [(1, "data pipe data"), (2, "pipe data")],
            "doc_id long, body string",
        )
        got = {
            r["doc_id"]: r["tokens"]
            for r in unigram_encode(renamed, vocab, text_col="body").collect()
        }
        want = {
            r["doc_id"]: r["tokens"]
            for r in unigram_encode(docs, vocab).collect()
        }
        assert got == want and got[1]

    def test_vocab_size_below_singles_clamps(self, spark):
        """More distinct single chars than vocab_size: keep ONLY the
        singles (coverage floor) — never a negative-stop slice that
        overshoots vocab_size with the wrong multi-char pieces."""
        from stock_indicators_etl_spark.llmdata.unigram_lm import (
            train_unigram_lm,
        )

        # 12 distinct chars, vocab_size=8 < 12
        docs = _docs(spark, [(1, "abcdef ghijkl abcdef abcdef")])
        vocab = train_unigram_lm(docs, vocab_size=8, n_rounds=1)
        pieces = list(vocab["piece"])
        assert all(len(p) == 1 for p in pieces)
        assert sorted(pieces) == sorted(set("abcdefghijkl"))

    def test_n_rounds_zero_returns_seed_vocab(self, spark):
        """n_rounds=0 must not NameError on last_ec — it returns the
        seed vocabulary with zero expected counts."""
        from stock_indicators_etl_spark.llmdata.unigram_lm import (
            train_unigram_lm,
        )

        docs = _docs(spark, [(1, "data pipe data pipe")])
        vocab = train_unigram_lm(docs, vocab_size=16, n_rounds=0)
        assert len(vocab) > 0
        assert (vocab["ec_micro"] == 0).all()


class TestAviZeroFrames:
    def _empty_movi_avi(self) -> bytes:
        """Structurally valid AVI whose movi list has zero frame
        chunks (decode_avi returns an empty frames list, no error)."""
        from stock_indicators_etl_spark.llmdata.avi import encode_avi

        rng = np.random.default_rng(7)
        payload = bytearray(
            encode_avi([rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)])
        )
        i = payload.find(b"movi")
        payload[i - 4 : i] = (4).to_bytes(4, "little")  # list body = fourcc only
        payload = payload[: i + 4]
        payload[4:8] = (len(payload) - 8).to_bytes(4, "little")
        return bytes(payload)

    def test_decode_returns_empty(self):
        from stock_indicators_etl_spark.llmdata.avi import decode_avi

        frames, usec = decode_avi(self._empty_movi_avi())
        assert frames == [] and usec == 40_000

    def test_sampler_skips_zero_frame_media(self, spark):
        """sample_avi_frames must skip the media row, not IndexError
        on frames[0] via the picked=[(0, 0)] fallback."""
        from stock_indicators_etl_spark.llmdata.avi import (
            encode_avi,
            sample_avi_frames,
        )

        rng = np.random.default_rng(3)
        good = encode_avi(
            [rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)] * 2,
            usec_per_frame=100_000,
        )
        media = spark.createDataFrame(
            [(1, bytearray(self._empty_movi_avi())), (2, bytearray(good))],
            "media_id long, payload binary",
        )
        out = sample_avi_frames(media, every_ms=100, max_frames=2).collect()
        assert {r["media_id"] for r in out} == {2}


class TestBlocklistNormalization:
    def test_uppercase_terms_match(self, spark):
        """words() lowercases tokens; an uppercase blocklist entry
        must be normalized to match, not silently never-match."""
        from stock_indicators_etl_spark.llmdata.text import blocklist_filter

        docs = _docs(spark, [(1, "the Rap sheet"), (2, "clean text")])
        rows = {
            r["doc_id"]: r
            for r in blocklist_filter(docs, ("RAP", " Rap ", "rap")).collect()
        }
        assert rows[1]["matched_terms"] == ["rap"]  # deduped, normalized
        assert rows[1]["n_hits"] == 1 and not rows[1]["keep"]
        assert rows[2]["keep"]
