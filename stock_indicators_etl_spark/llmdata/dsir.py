"""Data Selection via Importance Resampling (DSIR, Xie et al. 2023).

Select raw-corpus documents whose hashed-n-gram distribution looks
most like a small TARGET corpus — the published recipe behind many
"domain-match" pretraining mixes: featurize every document as a bag
of hashed unigrams+bigrams over ``n_buckets`` buckets, estimate the
target (p) and raw (q) bucket distributions with add-1 smoothing,
score each raw document by its log importance weight
``sum_b c_d[b] * ln(p[b]/q[b])``, then resample with Gumbel top-k.

Scale shape (the reason the hashed formulation wins at 100 TB):

- The feature space is FIXED at ``n_buckets`` regardless of corpus
  size, so both distribution estimates are ONE map-side-combinable
  groupBy each, producing bounded-by-construction frames (≤ a few
  thousand rows) that are legitimately broadcastable under the
  DESIGN §4.23 rule.
- Per-doc scoring is explode → broadcast join on the bucket id →
  BIGINT sum per doc: one corpus shuffle, no per-doc state, no
  Python.
- Selection is deterministic Gumbel top-k: the Gumbel noise is
  derived from the low 46 bits of ``h56(doc_id)`` (u = (h%2^46 +
  0.5)/2^46, g = -ln(-ln u)), so resampling is reproducible across
  runs AND engines; top-k compiles to TakeOrderedAndProject — no
  global sort materializes.

Cross-engine determinism: the log-ratio table and the Gumbel noise
are quantized to integer micro-nats (floor(x*1e6 + 0.5) as BIGINT)
the moment they leave ``ln``; every downstream sum/compare is exact
BIGINT arithmetic, immune to fold order. The ratio fed to ``ln`` is
one IEEE-exact expression of exact integer counts, identical in
Spark and DuckDB.

Reference parity: sasmi825/stock-indicators-etl has no data-selection
surface (850 LoC of per-ticker TA indicators); this is extension
surface for the LLM-training-data pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stock_indicators_etl_spark.llmdata.hashing import h56
from stock_indicators_etl_spark.llmdata.text import spread, words

#: default hashed-feature space (buckets), bounded by construction.
DSIR_BUCKETS = 1024


def _unats(c: Column) -> Column:
    """Quantize a double to integer micro-nats (round-half-up)."""
    return F.floor(c * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")


def _doc_buckets(df: DataFrame, text_col: str, n_buckets: int) -> DataFrame:
    """(doc_id, bucket) per unigram+bigram occurrence.

    The words array is materialized before the gram lambdas (HOF
    lambdas are not CSE'd — see text.repetition_score), and the
    bigram stream is built by zipping the array with its own tail,
    all scan-local.
    """
    pre = spread(df).select("doc_id", words(F.col(text_col)).alias("_w"))
    w = F.col("_w")
    n = F.size(w)
    bigrams = F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.slice(w, 1, n - 1), F.slice(w, 2, n - 1), lambda a, b: F.concat_ws(" ", a, b)
        )
    )
    grams = F.concat(w, bigrams)
    return pre.select(
        "doc_id", F.explode_outer(grams).alias("gram")
    ).select(
        "doc_id",
        F.when(
            F.col("gram").isNull(), F.lit(None).cast("long")
        ).otherwise(F.pmod(h56(F.col("gram")), F.lit(n_buckets))).alias("bucket"),
    )


def dsir_model(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """The importance MODEL: the ≤``n_buckets``-row quantized
    log-ratio table ``(bucket, lr_unats)`` — built once from the
    static raw+target corpora, then served to any number of
    :func:`dsir_score` calls (batch or per micro-batch: the
    model/score split is the same build-once-serve-many shape as
    ``multiprobe_lsh_index`` / ``multiprobe_lsh_probe``)."""
    raw_b = _doc_buckets(raw, text_col, n_buckets)
    tgt_b = _doc_buckets(target, text_col, n_buckets)

    # bucket distributions: one combinable groupBy each, ≤ n_buckets
    # output rows. Totals ride a grand-total window over that bounded
    # frame (cheap: the frame is the aggregate, not the corpus).
    def dist(b: DataFrame, cname: str) -> DataFrame:
        return (
            b.filter(F.col("bucket").isNotNull())
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(cname))
        )

    q_cnt = dist(raw_b, "q_cnt")
    p_cnt = dist(tgt_b, "p_cnt")
    # full outer on the two ≤n_buckets frames, then the add-1 smoothed
    # log ratio: ln( (p_b+1)*(Q+B) / ((q_b+1)*(P+B)) ), quantized.
    joined = q_cnt.join(p_cnt, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("q_cnt", F.lit(0)).alias("q_cnt"),
        F.coalesce("p_cnt", F.lit(0)).alias("p_cnt"),
    )
    tot = joined.agg(
        F.sum("q_cnt").alias("q_tot"), F.sum("p_cnt").alias("p_tot")
    )
    lr = (
        joined.crossJoin(F.broadcast(tot))  # 1-row totals frame
        .select(
            "bucket",
            _unats(
                F.log(
                    (
                        (F.col("p_cnt") + F.lit(1)).cast("double")
                        * (F.col("q_tot") + F.lit(n_buckets)).cast("double")
                    )
                    / (
                        (F.col("q_cnt") + F.lit(1)).cast("double")
                        * (F.col("p_tot") + F.lit(n_buckets)).cast("double")
                    )
                )
            ).alias("lr_unats"),
        )
    )
    return lr


def dsir_score(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Score any document frame against a prebuilt :func:`dsir_model`.

    Returns ``(doc_id, n_grams, w_unats)`` — ``w_unats = sum over
    gram occurrences of the quantized ln(p[bucket]/q[bucket])``;
    gram-less documents get weight 0. One corpus shuffle (the per-doc
    groupBy); the ≤n_buckets model frame is broadcast — bounded BY
    CONSTRUCTION (DESIGN §4.23), not by a cardinality guess. Pure
    function of (docs batch, static model), so it runs unchanged per
    micro-batch in ``streaming.dsir_stream``.
    """
    doc_b = _doc_buckets(docs, text_col, n_buckets)
    return (
        doc_b.join(F.broadcast(model), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.col("bucket")).alias("n_grams"),
            F.coalesce(F.sum("lr_unats"), F.lit(0)).alias("w_unats"),
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-document log importance weight of the raw corpus against
    its own target subset: :func:`dsir_model` + :func:`dsir_score`
    composed (the one-shot batch form)."""
    model = dsir_model(raw, target, text_col=text_col, n_buckets=n_buckets)
    return dsir_score(raw, model, text_col=text_col, n_buckets=n_buckets)


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int = 50,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Gumbel top-k resample of the raw corpus by DSIR weight.

    ``key_unats = w_unats + g_unats`` with g the doc's deterministic
    Gumbel(0,1) noise in micro-nats; returns the k selected docs
    ordered by the key (ties broken by doc_id). ``sort().limit(k)``
    compiles to TakeOrderedAndProject — only k rows ever leave the
    executors.
    """
    w = dsir_weights(raw, target, text_col=text_col, n_buckets=n_buckets)
    # u from the LOW 46 hash bits only: 2^46 < 2^53, so the BIGINT ->
    # DOUBLE cast is exact in both engines and u is strictly inside
    # (0,1) — the full 56-bit value rounds to 2^56 at the double cast
    # for the top ulp of the domain, which would make u exactly 1.0
    # and the Gumbel infinite.
    h_red = F.pmod(h56(F.col("doc_id").cast("string")), F.lit(1 << 46))
    u = (h_red.cast("double") + F.lit(0.5)) / F.lit(float(1 << 46))
    g = _unats(-F.log(-F.log(u)))
    keyed = w.withColumn("g_unats", g).withColumn(
        "key_unats", F.col("w_unats") + F.col("g_unats")
    )
    return (
        keyed.orderBy(F.desc("key_unats"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "n_grams", "w_unats", "g_unats", "key_unats")
    )
