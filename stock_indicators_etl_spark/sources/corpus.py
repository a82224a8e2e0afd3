"""Document-corpus sources/sinks (JSONL + sharded parquet).

LLM training corpora interchange as JSON-Lines (one document object
per line, gzip-friendly, append-only); this module reads them into
the same ``documents`` schema the parquet testdata uses, with the
malformed-line accounting a 100 TB crawl ingest needs, and writes
curated corpora back out as shard-partitioned parquet.

Scale notes:

- JSON-Lines is line-splittable, so Spark parallelizes a single huge
  file by byte ranges — no repartition needed after the scan (unlike
  small local parquet). With an explicit schema the reader does ONE
  pass (schema inference would scan twice) and prunes unused fields
  at parse time.
- ``PERMISSIVE`` mode + ``columnNameOfCorruptRecord`` keeps bad lines
  as rows instead of failing the job: at crawl scale some fraction of
  lines is always truncated/mis-encoded, and dropping them silently
  (``DROPMALFORMED``) hides data loss — the reader surfaces the count
  so the pipeline can alert on it.
- The sharded sink partitions by a bounded ``shard`` column (e.g.
  from :func:`..llmdata.sampling.token_shards`), giving downstream
  training jobs one directory per shard and bounded files per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: documents-table schema (TESTDATA.md) + corrupt-record capture.
DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)

CORRUPT_COL = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
    keep_corrupt: bool = False,
) -> DataFrame:
    """JSONL corpus scan with malformed-line capture.

    Returns well-formed rows in the given schema; with
    ``keep_corrupt=True`` the raw text of malformed lines is kept in
    ``_corrupt_record`` (NULL for good rows) so callers can count,
    sample, or quarantine them instead of losing them silently.
    """
    if keep_corrupt:
        return (
            spark.read.schema(f"{schema}, {CORRUPT_COL} string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    # default path: no corrupt column in the schema at all — malformed
    # lines parse to all-NULL rows and are dropped by the required-key
    # gate. Filtering on a REAL column sidesteps Spark's
    # corrupt-column-only query restriction for every downstream shape
    # (including bare count()), and the scan never retains raw line
    # text it would immediately throw away.
    df = spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)
    return df.filter(F.col("doc_id").isNotNull())


def corrupt_line_count(spark: SparkSession, path: str) -> int:
    """Number of malformed lines in a JSONL corpus (ingest QA gate).

    Thin wrapper over :func:`ingest_qa_counts` (one aggregate pass,
    no cache — see there for why).
    """
    return ingest_qa_counts(spark, path)["malformed"]


def ingest_qa_counts(spark: SparkSession, path: str) -> dict[str, int]:
    """Full ingest QA accounting for a JSONL corpus, in ONE pass.

    Every line lands in exactly one bucket, so the three counts sum to
    the corpus line count — nothing is silently lost:

    - ``ingested``: parseable AND has a ``doc_id`` (what the default
      :func:`read_documents_jsonl` path returns);
    - ``malformed``: unparseable lines (captured in the corrupt-record
      column);
    - ``missing_key``: parseable JSON but ``doc_id`` is null/absent —
      rows the default path drops that are NOT malformed. Counting
      them separately closes the gap where dropped-but-parseable rows
      appeared in neither metric.

    Implementation note: Spark refuses queries whose referenced
    columns are ONLY the internal corrupt-record column
    (``UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN``); this
    aggregate also references ``doc_id``, so it runs as a single
    uncached scan — at crawl scale that matters: no full-corpus
    ``cache()``, one job, three counters from the same map-side pass.
    """
    df = read_documents_jsonl(spark, path, keep_corrupt=True)
    bad = F.col(CORRUPT_COL).isNotNull()
    row = df.agg(
        F.count(F.when(~bad & F.col("doc_id").isNotNull(), 1)).alias("ingested"),
        F.count(F.when(bad, 1)).alias("malformed"),
        F.count(F.when(~bad & F.col("doc_id").isNull(), 1)).alias("missing_key"),
    ).collect()[0]
    return {
        "ingested": int(row["ingested"]),
        "malformed": int(row["malformed"]),
        "missing_key": int(row["missing_key"]),
    }


def stream_documents_jsonl(
    spark: SparkSession, path: str, schema: str = DOCUMENTS_SCHEMA
) -> DataFrame:
    """Streaming JSONL corpus source (Structured Streaming file
    source): new files under ``path`` become micro-batches;
    ``trigger(availableNow=True)`` reproduces a batch ingest exactly.
    Malformed lines parse to all-NULL rows under the explicit schema
    and are dropped by the ``doc_id IS NOT NULL`` gate in
    :func:`streaming_corpus_ingest`."""
    return spark.readStream.schema(schema).json(path)


def streaming_corpus_ingest(
    docs: DataFrame,
    min_words: int = 5,
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming ingest gate: drop unparseable rows, enforce a minimum
    word count, fingerprint the normalized content, and deduplicate on
    it — the streaming twin of the ``corpus_prep`` batch front end.

    Dedup state: with ``ts_col`` (e.g. a crawl fetch timestamp) the
    stream watermarks and uses ``dropDuplicatesWithinWatermark`` so
    state is bounded and the job runs indefinitely; without one it
    falls back to ``dropDuplicates`` on the fingerprint, whose state
    grows with distinct-content count — fine for
    ``availableNow`` backfills, documented as unbounded for true
    always-on streams.
    """
    from stock_indicators_etl_spark.llmdata.text import norm_text, words

    gated = docs.filter(F.col("doc_id").isNotNull()).withColumn(
        "content_md5", F.md5(norm_text(F.col("text")))
    )
    gated = gated.filter(F.size(words(F.col("text"))) >= min_words)
    if ts_col is not None:
        return gated.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["content_md5"]
        )
    return gated.dropDuplicates(["content_md5"])


def write_corpus_shards(
    df: DataFrame,
    base: str,
    shard_col: str = "shard",
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """Shard-partitioned parquet sink for curated corpora:
    ``{base}/shard=N/part-*.parquet``; pair with
    :func:`..llmdata.sampling.token_shards` for token-budget shards."""
    (
        df.write.mode(mode)
        .partitionBy(shard_col)
        .option("compression", compression)
        .parquet(base)
    )


def write_bucketed_corpus(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 256,
    id_col: str = "doc_id",
) -> None:
    """Bucketed corpus table: hash-bucket documents by id so the
    dedup-family's doc-keyed joins run WITHOUT an exchange on the
    corpus side — the materialization of DESIGN's "both sides
    bucketable on doc_id" claim (leakage-safe splits, component
    joins, survivor semi-joins, incremental-dedup verification all
    equi-join on the id).

    At 100 TB the point is structural: the corpus is written once,
    bucketed; every later curation pass that joins per-doc state
    (components, token counts, quality scores — themselves written
    bucketed with the same ``n_buckets``) is co-partitioned by layout
    and Catalyst drops both shuffles (asserted in tests/test_plans.py).
    """
    (
        df.write.bucketBy(n_buckets, id_col)
        .sortBy(id_col)
        .mode("overwrite")
        .option("path", path)
        .saveAsTable(table)
    )
