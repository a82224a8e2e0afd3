"""JSONL corpus source + sharded parquet sink round trips
(`sources/corpus.py`)."""

from __future__ import annotations

import json

from stock_indicators_etl_spark.sources.corpus import (
    corrupt_line_count,
    ingest_qa_counts,
    read_documents_jsonl,
    write_corpus_shards,
)


def _write_jsonl(path, rows, junk_lines=()):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        for j in junk_lines:
            f.write(j + "\n")


def test_jsonl_reads_well_formed_rows(spark, tmp_path):
    p = str(tmp_path / "docs.jsonl")
    rows = [
        {"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0", "n_chars": 11},
        {"doc_id": 2, "text": "hola", "lang": "es", "source": "s1", "n_chars": 4},
    ]
    _write_jsonl(p, rows)
    out = read_documents_jsonl(spark, p).toPandas().sort_values("doc_id")
    assert list(out.doc_id) == [1, 2]
    assert list(out.columns) == ["doc_id", "text", "lang", "source", "n_chars"]
    assert out.iloc[0].text == "hello world"


def test_jsonl_malformed_lines_are_counted_not_dropped_silently(spark, tmp_path):
    p = str(tmp_path / "bad.jsonl")
    rows = [{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}]
    _write_jsonl(p, rows, junk_lines=['{"doc_id": 2, "text": trunca', "not json at all"])
    assert corrupt_line_count(spark, p) == 2
    good = read_documents_jsonl(spark, p).toPandas()
    assert list(good.doc_id) == [1]
    kept = read_documents_jsonl(spark, p, keep_corrupt=True).toPandas()
    assert len(kept) == 3
    assert kept._corrupt_record.notna().sum() == 2


def test_ingest_qa_counts_partition_every_line(spark, tmp_path):
    """ingested + malformed + missing_key == line count: parseable
    rows with a null/absent doc_id (dropped by the default reader)
    show up as missing_key, not in neither bucket (ADVICE r5)."""
    p = str(tmp_path / "qa.jsonl")
    rows = [
        {"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2},
        {"doc_id": 2, "text": "ok2", "lang": "en", "source": "s", "n_chars": 3},
        # parseable but no doc_id — NOT corrupt, but dropped by default
        {"text": "orphan", "lang": "en", "source": "s", "n_chars": 6},
        {"doc_id": None, "text": "null-key", "lang": "en", "source": "s", "n_chars": 8},
    ]
    _write_jsonl(p, rows, junk_lines=["not json at all", '{"doc_id": 9, "text": trunc'])
    counts = ingest_qa_counts(spark, p)
    assert counts == {"ingested": 2, "malformed": 2, "missing_key": 2}
    assert sum(counts.values()) == 6
    # the default reader's output matches the ingested count
    assert read_documents_jsonl(spark, p).count() == counts["ingested"]


def test_type_mismatch_rows_are_corrupt(spark, tmp_path):
    p = str(tmp_path / "types.jsonl")
    _write_jsonl(
        p,
        [
            {"doc_id": "not-a-number", "text": "x", "lang": "en", "source": "s", "n_chars": 1},
            {"doc_id": 7, "text": "y", "lang": "en", "source": "s", "n_chars": 1},
        ],
    )
    assert corrupt_line_count(spark, p) == 1
    assert list(read_documents_jsonl(spark, p).toPandas().doc_id) == [7]


def test_shard_sink_round_trip_partitions_by_shard(spark, tmp_path):
    import pandas as pd

    base = str(tmp_path / "shards")
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3, 4], "text": list("abcd"), "shard": [0, 0, 1, 1]}
        )
    )
    write_corpus_shards(df, base)
    import os

    assert sorted(
        d for d in os.listdir(base) if d.startswith("shard=")
    ) == ["shard=0", "shard=1"]
    back = spark.read.parquet(base)
    assert back.count() == 4
    # partition pruning: a shard filter reads one directory
    plan = back.filter("shard = 1")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or back.filter("shard = 1").count() == 2


def test_streaming_corpus_ingest_gates_and_dedups(spark, tmp_path):
    from stock_indicators_etl_spark.sources.corpus import (
        stream_documents_jsonl,
        streaming_corpus_ingest,
    )

    src = tmp_path / "stream_src"
    src.mkdir()
    rows = [
        # well-formed, above min_words
        {"doc_id": 1, "text": "one two three four five six", "lang": "en",
         "source": "s", "n_chars": 27},
        # exact content dup of doc 1 (normalization collapses case/ws)
        {"doc_id": 2, "text": "ONE  two three four five six", "lang": "en",
         "source": "s", "n_chars": 28},
        # too short -> gated out
        {"doc_id": 3, "text": "tiny", "lang": "en", "source": "s", "n_chars": 4},
    ]
    _write_jsonl(str(src / "a.jsonl"), rows, junk_lines=["{broken"])

    stream = stream_documents_jsonl(spark, str(src))
    out = streaming_corpus_ingest(stream, min_words=5)
    q = (
        out.writeStream.format("memory")
        .queryName("scorpus")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.table("scorpus").toPandas()
    # one survivor for the duplicated content, short + broken dropped
    assert len(got) == 1
    assert got.iloc[0].doc_id in (1, 2)
    assert got.iloc[0].content_md5 is not None


def test_streaming_ingest_watermark_evicts_dedup_state(spark, tmp_path):
    """DESIGN §6 promise: with an event-time column the content-dedup
    state is WATERMARK-BOUNDED, not grow-forever. Three micro-batches
    (maxFilesPerTrigger=1) of the SAME content:

    - batch 1 (docs 1, 2): two copies 5 min apart → within the 10-min
      watermark, deduped to one survivor;
    - batch 2 (doc 3, 2 h later): state evicts only at batch END, so
      the entry is still present during this batch and the copy is
      deduped — but afterwards the advanced watermark passes the
      entry's expiry and it is EVICTED;
    - batch 3 (doc 4): the entry survives Spark's end-of-previous-
      batch bookkeeping one batch longer in the dedup check, so this
      copy is still dropped while the store empties;
    - batch 4 (doc 5): state is empty → the same content is
      RE-ADMITTED.

    An unbounded dropDuplicates would emit exactly one row ever; the
    re-admission in the last batch is the observable proof of
    eviction.
    """
    import os
    import time

    from stock_indicators_etl_spark.sources.corpus import (
        DOCUMENTS_SCHEMA,
        streaming_corpus_ingest,
    )

    schema = f"{DOCUMENTS_SCHEMA}, fetch_ts timestamp"
    body = "the same syndicated article body repeated across the crawl"

    def doc(i, ts):
        return {"doc_id": i, "text": body, "lang": "en", "source": "s",
                "n_chars": len(body), "fetch_ts": ts}

    src = tmp_path / "wm_src"
    src.mkdir()
    _write_jsonl(str(src / "a.jsonl"),
                 [doc(1, "2024-01-01 10:00:00"), doc(2, "2024-01-01 10:05:00")])
    _write_jsonl(str(src / "b.jsonl"), [doc(3, "2024-01-01 12:00:00")])
    _write_jsonl(str(src / "c.jsonl"), [doc(4, "2024-01-01 12:30:00")])
    _write_jsonl(str(src / "d.jsonl"), [doc(5, "2024-01-01 12:45:00")])
    now = time.time()
    for i, f in enumerate(("a.jsonl", "b.jsonl", "c.jsonl", "d.jsonl")):
        os.utime(src / f, (now + i, now + i))  # file-source batch order

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(
        str(src)
    )
    out = streaming_corpus_ingest(
        stream, min_words=5, ts_col="fetch_ts", watermark="10 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("wmcorpus")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("wmcorpus").toPandas().sort_values("doc_id")
    # batch-1 survivor + the post-eviction re-admission; docs 2-4
    # deduped while the state entry was alive
    assert list(got.doc_id) == [1, 5], list(got.doc_id)


def test_corpus_pipeline_end_to_end(spark, tmp_path):
    """The examples/corpus_pipeline.py curation chain on synthetic
    JSONL: ingest -> quality -> exact+near dedup -> shards."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from corpus_pipeline import curate

    body = " ".join(f"tok{i}" for i in range(40))
    alt = " ".join(f"tok{i}" for i in range(39)) + " other"
    rows = [
        {"doc_id": 1, "text": body, "lang": "en", "source": "s", "n_chars": len(body)},
        # exact dup of 1 (normalization)
        {"doc_id": 2, "text": body.upper(), "lang": "en", "source": "s",
         "n_chars": len(body)},
        # near dup of 1 (39/41 shingles shared)
        {"doc_id": 3, "text": alt, "lang": "en", "source": "s", "n_chars": len(alt)},
        # too short
        {"doc_id": 4, "text": "short doc", "lang": "en", "source": "s", "n_chars": 9},
        # repetitive
        {"doc_id": 5, "text": "spam " * 40, "lang": "en", "source": "s", "n_chars": 200},
        # distinct survivor
        {"doc_id": 6, "text": " ".join(f"w{i}" for i in range(45)), "lang": "fr",
         "source": "s", "n_chars": 100},
    ]
    src = str(tmp_path / "corpus.jsonl")
    _write_jsonl(src, rows, junk_lines=["{bad line"])
    out_dir = str(tmp_path / "out")

    counts = curate(spark, src, out_dir, token_budget=64, min_words=30)
    assert counts["malformed_lines"] == 1
    assert counts["missing_key_lines"] == 0
    assert counts["ingested"] == 6
    assert counts["after_quality"] == 4          # 4 too short, 5 repetitive
    assert counts["after_exact_dedup"] == 3      # 2 collapses into 1
    assert counts["after_near_dedup"] == 2       # 3 collapses into 1
    assert counts["shipped"] == 2
    back = spark.read.parquet(out_dir).toPandas()
    assert sorted(back.doc_id) == [1, 6]
    assert set(back.columns) >= {"doc_id", "text", "lang", "shard", "split"}
    assert set(back.split) <= {"train", "val", "test"}


def test_corpus_profiling_example(spark, tmp_path):
    """examples/corpus_profiling.py: volume + KMV/HLL cardinality +
    pairwise overlap reports on a corpus with a planted duplicate
    source."""
    import sys
    from pathlib import Path

    import pandas as pd

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from corpus_profiling import profile

    uniq = [" ".join(f"a{i}_{j}" for j in range(30)) for i in range(20)]
    shared = [" ".join(f"s{i}_{j}" for j in range(30)) for i in range(20)]
    rows = (
        [{"doc_id": i, "source": "A", "text": t} for i, t in enumerate(shared)]
        + [{"doc_id": 100 + i, "source": "B", "text": t} for i, t in enumerate(shared)]
        + [{"doc_id": 200 + i, "source": "C", "text": t} for i, t in enumerate(uniq)]
    )
    src = str(tmp_path / "docs.parquet")
    pd.DataFrame(rows).to_parquet(src)

    reports = profile(spark, src, k=32, ngram=3)
    vol = reports["volume"].toPandas().set_index("source")
    assert int(vol.loc["A"].n_docs) == 20

    kmv = reports["kmv"].toPandas().set_index("source")
    hll = reports["hll"].toPandas().set_index("source")
    # A and B are the same content: identical sketch rows
    assert kmv.loc["A"].est_distinct == kmv.loc["B"].est_distinct
    assert hll.loc["A"].register_sum == hll.loc["B"].register_sum

    ov = reports["overlap"].toPandas().set_index(["grp_a", "grp_b"])
    ab = ov.loc[("A", "B")]
    assert ab.jaccard_est == 1.0 and bool(ab.dedup_before_mix)
    ac = ov.loc[("A", "C")]
    assert ac.jaccard_est == 0.0 and not bool(ac.dedup_before_mix)
