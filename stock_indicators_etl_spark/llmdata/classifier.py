"""Distributed linear-classifier training with a bit-exact oracle.

Batch perceptron over int8 scalar-quantized embedding codes: the one
classical trainer whose every update is INTEGER arithmetic —
``margin_i = y_i·Σ_j w_j·x_ij`` (BIGINT), epoch update
``w_j += Σ_{margin ≤ 0} y_i·x_ij`` — so a fixed number of epochs
replays bit-exactly in SQL (the pagerank/k-means unrolled-oracle
strategy), where float logistic regression would drift on ``exp``
in the last ulp.

Shape per epoch (r12): ONE scan of the pinned (y, code-array) stream
— margins are scan-local folds against the weight LITERAL, the
update is one combinable 64-group aggregate, and the only collect is
dim-bounded (64 rows/epoch; the weight state is 64 exact Python ints,
the same bounded-driver-state class as centroids and BPE argmaxes).
At 100 TB the per-epoch cost is exactly one scan of the (quantized,
4× smaller than float) code stream with nothing corpus-sized ever
shuffled — the old shape broadcast-joined a weight table and shuffled
N margin rows per epoch. Quantization reuses the ``sq_topk`` code
expression, so codes here rank-match the ANN family's.

The batch perceptron is not logistic regression — it is the honest
integer-exact member of the linear-classifier family, converging on
separable data and oscillating boundedly otherwise; fixed-epoch
training is deterministic either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_indicators_etl_spark.llmdata.text import spread, words


def sq_codes(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """(id, j, x) int8 code stream: ``floor(v_j/‖v‖·127 + 0.5)`` —
    the ``sq_topk`` quantizer, exploded to one row per dimension.

    ``dim`` is VALIDATED per row (scan-local ``raise_error``, no extra
    pass): a vector whose length differs from ``dim`` fails loudly.
    Without the check, ``perceptron_train``'s inner join against the
    ``dim``-row weight table would silently DROP dimensions ``j ≥
    dim`` and train a plausible-looking but wrong model (mirrors
    ``perceptron_score``'s driver-side count check).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(
            F.zip_with(v, v, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    code = F.transform(
        v,
        lambda x: F.when(nrm == 0, F.lit(0).cast("long")).otherwise(
            F.floor(x / nrm * 127.0 + F.lit(0.5)).cast("long")
        ),
    )
    checked = F.when(
        F.size(F.col(vec_col)) != F.lit(int(dim)),
        F.raise_error(
            F.format_string(
                f"sq_codes: expected {int(dim)}-dim vectors, got %s",
                F.size(F.col(vec_col)).cast("string"),
            )
        ).cast("array<long>"),
    ).otherwise(code)
    return (
        embeddings.select(F.col(id_col).alias("id"), checked.alias("_c"))
        .select("id", F.posexplode("_c").alias("j", "x"))
        .withColumn("j", F.col("j").cast("long"))
    )


def perceptron_train(
    embeddings: DataFrame,
    label_col: str = "label",
    positive_min: int = 5,
    epochs: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    _stats: dict | None = None,
) -> DataFrame:
    """Train up to ``epochs`` of the batch perceptron; returns the
    final (j, w) weight table with ``n_mis`` (final-epoch
    misclassified count) attached to every row.

    Labels: ``y = +1`` where ``label ≥ positive_min`` else ``−1``.
    Zero-initialized weights: epoch 1's margins are all 0 (≤ 0 ⇒
    every row misclassified), so ``w¹ = Σ y_i·x_i`` — the class-mean
    direction — and later epochs correct it. All-BIGINT state.

    CONVERGENCE EARLY-EXIT (VERDICT r8 next #5): the per-epoch
    misclassified count rides the delta aggregate (each mis id
    contributes exactly one row per dimension, so ``count(*)`` per
    ``j`` IS the mis count — no extra job), read off the 64-row
    checkpoint. When it hits 0 the update is a no-op and every later
    epoch is bit-identical, so stopping early returns EXACTLY the
    fixed-epoch result — the unrolled SQL oracle needs no mode flag.
    The same carried count replaces the old final ``mis_count``
    aggregate, which re-ran the last epoch's margins — one full
    corpus pass saved per training call.

    ``_stats``: test hook — when a dict is passed, ``epochs_run`` is
    filled in (the separable-fixture test asserts the early exit).
    """
    spark = embeddings.sparkSession
    # r12 epoch shape (guide §1.2 step 1 + §2.3 "aggregate before you
    # shuffle"): codes stay ONE ARRAY ROW PER DOC — (y, cv) — instead
    # of the exploded (id, j, x) stream, and the weight state lives on
    # the driver as 64 exact Python ints (the perceptron_score /
    # centroid / BPE-argmax bounded-state precedent). Each epoch is
    # then a single job over the pinned code stream:
    #   margin_i = Σ_j w_j·cv_ij  — scan-local fold against the w
    #     LITERAL (no broadcast-join of a weight table, no groupBy(id)
    #     shuffle of N margin rows — the old shape's per-epoch
    #     corpus-sized exchange);
    #   delta_j  = Σ_{mis} y_i·cv_ij — posexplode of ONLY the
    #     misclassified rows into one combinable 64-group aggregate,
    #     collected dim-bounded (64 rows/epoch).
    # Every quantity is BIGINT and integer addition is associative, so
    # the regrouping is BIT-IDENTICAL to the old join shape (the
    # unrolled SQL oracle is unchanged and stays hash-green).
    # Job accounting at sf0.1: 46 stage-jobs → ~7 (one per epoch +
    # the pin), 7.4 s → see OPTIMIZATION_r12.md.
    y = F.when(F.col(label_col) >= positive_min, 1).otherwise(-1)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(
            F.zip_with(v, v, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    code = F.transform(
        v,
        lambda x: F.when(nrm == 0, F.lit(0).cast("long")).otherwise(
            F.floor(x / nrm * 127.0 + F.lit(0.5)).cast("long")
        ),
    )
    checked = F.when(
        F.size(F.col(vec_col)) != F.lit(int(dim)),
        F.raise_error(
            F.format_string(
                f"perceptron_train: expected {int(dim)}-dim vectors, got %s",
                F.size(F.col(vec_col)).cast("string"),
            )
        ).cast("array<long>"),
    ).otherwise(code)
    # persist() (MEMORY_AND_DISK): the code stream is 4× smaller than
    # the float vectors and spills rather than OOMs; epoch 1's job is
    # the materializing action, so no extra job is spent pinning.
    base = embeddings.select(
        y.cast("long").alias("y"), checked.alias("cv")
    ).persist()

    w = [0] * dim
    n_mis_val = 0
    epochs_run = 0
    for _it in range(epochs):
        if _it == 0:
            # Zero-initialized weights make epoch 1 degenerate BY
            # CONSTRUCTION: every margin is y·0 = 0 ≤ 0, so the
            # misclassified set IS the corpus and w¹ = Σ y_i·x_i.
            mis = base
        else:
            w_lit = F.array(*[F.lit(int(x)).cast("long") for x in w])
            dot = F.aggregate(
                F.zip_with(F.col("cv"), w_lit, lambda c, ww: c * ww),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            mis = base.filter(F.col("y") * dot <= 0)
        rows = (
            mis.select("y", F.posexplode("cv").alias("j", "x"))
            .groupBy("j")
            .agg(
                F.sum(F.col("y") * F.col("x")).alias("_d"),
                F.count(F.lit(1)).alias("_nm"),
            )
            .collect()
        )
        # every mis doc contributes exactly one row per dimension, so
        # _nm is the mis count (identical across j)
        n_mis_val = int(rows[0]["_nm"]) if rows else 0
        for r in rows:
            w[int(r["j"])] += int(r["_d"])
        epochs_run += 1
        if n_mis_val == 0:
            break
    if _stats is not None:
        _stats["epochs_run"] = epochs_run
    base.unpersist()
    return spark.createDataFrame(
        [(j, w[j], n_mis_val) for j in range(dim)],
        "j long, w long, n_mis long",
    )


def perceptron_score(
    embeddings: DataFrame,
    weights: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Score rows with a trained weight table: (id, margin, pred)
    where ``margin = Σ_j w_j·x_ij`` (BIGINT) over the same int8
    codes the trainer saw, ``pred = margin > 0``.

    The weight table is dim-bounded (64 rows), so it collapses to a
    literal array and inference becomes a PURE SCAN — one codegen'd
    fold per row, no join, no shuffle, no aggregation. That is also
    what makes the same call work unchanged on a ``readStream``
    frame (no watermark needed — there is no stateful operator),
    which is the deployment shape. The collect here is the k-row
    bounded kind (centroid/codebook precedent), never corpus-sized.
    """
    rows = sorted(
        weights.select("j", "w").collect(), key=lambda r: r["j"]
    )
    if len(rows) != dim:
        raise ValueError(f"expected {dim} weights, got {len(rows)}")
    w_lit = F.array(*[F.lit(int(r["w"])).cast("long") for r in rows])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(
            F.zip_with(v, v, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    code = F.transform(
        v,
        lambda x: F.when(nrm == 0, F.lit(0).cast("long")).otherwise(
            F.floor(x / nrm * 127.0 + F.lit(0.5)).cast("long")
        ),
    )
    margin = F.aggregate(
        F.zip_with(code, w_lit, lambda c, w: c * w),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return embeddings.select(
        F.col(id_col).alias("id"),
        margin.alias("margin"),
        (margin > 0).alias("pred"),
    )


# ---------------------------------------------------------------------------
# multinomial Naive Bayes (one-pass counting trainer)
# ---------------------------------------------------------------------------


def nb_train(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    alpha: int = 1,
) -> tuple[list, DataFrame, DataFrame]:
    """Multinomial Naive Bayes trained in ONE counting pass — the
    fastText-style quality/domain classifier shape, and the
    complement to :func:`perceptron_train`: the perceptron needs an
    epoch LOOP over the corpus; NB's sufficient statistics are plain
    (label, word) counts, so training is a single combinable groupBy
    at any corpus size.

    Float discipline (the dsir/unigram_surprisal convention): each
    log-probability quantizes to integer MICRO-NATS —
    ``floor(ln((c+α)/(T_c+α·V))·10⁶ + 0.5)`` where the division is
    ONE IEEE op over exact integers — so per-document scores are
    BIGINT sums, immune to fold order, bit-replayable in SQL.

    Only class-bounded scalars are collected (k class token totals +
    the vocab size — the 64-row-collect precedent); the (vocab × k)
    weight table stays a DataFrame, DENSE per word (absent (word,
    class) pairs get the smoothing floor), one row per word carrying
    the k-array of weights.

    Returns ``(classes, priors, weights)``: the sorted class list,
    a k-row ``(idx, prior)`` DataFrame (micro-nat log priors,
    in-plan ``ln`` so the oracle replays it), and the per-word
    ``(word, w: array<long>)`` weight table.
    """
    toks = spread(docs).select(
        F.col(label_col).alias("_lab"),
        F.explode(words(F.col(text_col))).alias("word"),
    )
    cwc = toks.groupBy("_lab", "word").agg(F.count(F.lit(1)).alias("_c"))
    # class-bounded scalars: k token totals + vocab size
    totals = {
        r["_lab"]: r["t"]
        for r in toks.groupBy("_lab").agg(F.count(F.lit(1)).alias("t")).collect()
    }
    v = toks.select("word").distinct().count()
    # classes from the DOCUMENT labels (a class whose docs are all
    # empty-text still needs a prior + the smoothing-floor weights)
    classes = sorted(
        r["_lab"] for r in docs.select(F.col(label_col).alias("_lab")).distinct().collect()
    )
    totals = {c: totals.get(c, 0) for c in classes}
    per_class = [
        F.max(F.when(F.col("_lab") == c, F.col("_c"))).alias(f"_c{i}")
        for i, c in enumerate(classes)
    ]
    piv = cwc.groupBy("word").agg(*per_class)
    w_arr = F.array(
        *[
            F.floor(
                F.log(
                    (F.coalesce(F.col(f"_c{i}"), F.lit(0)) + F.lit(alpha)).cast(
                        "double"
                    )
                    / F.lit(float(totals[c] + alpha * v))
                )
                * F.lit(1_000_000.0)
                + F.lit(0.5)
            ).cast("long")
            for i, c in enumerate(classes)
        ]
    )
    weights = piv.select("word", w_arr.alias("w"))
    n_docs = docs.groupBy(F.col(label_col).alias("_lab")).agg(
        F.count(F.lit(1)).alias("_nd")
    )
    total_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    cls_idx = F.array(*[F.lit(c) for c in classes])
    priors = (
        n_docs.crossJoin(F.broadcast(total_docs))
        .select(
            (F.array_position(cls_idx, F.col("_lab")) - 1).cast("int").alias("idx"),
            F.floor(
                F.log(F.col("_nd").cast("double") / F.col("_n").cast("double"))
                * F.lit(1_000_000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("prior"),
        )
    )
    return classes, priors, weights


def nb_score(
    docs: DataFrame,
    classes: list,
    priors: DataFrame,
    weights: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents against a trained NB model: per doc the
    argmax-class of ``prior_c + Σ_w tf·weight(w,c)`` — all BIGINT
    micro-nats, deterministic smallest-class-index ties.

    Plan: one (doc, word) tf shuffle, one word equi-join onto the
    vocab-sized weight table (NOT broadcast-forced — vocab is
    corpus-derived, AQE decides), a k-wide posexplode, one combinable
    (doc, class) sum, a k-bounded argmax struct-max, and a broadcast
    of the k-row prior frame. Words outside the model vocabulary are
    dropped (inner join) — the standard unseen-token convention.

    Output: ``(doc_id, actual, predicted, score, correct)``; docs
    with no in-vocab words fall back to the max-prior class.
    """
    tf = (
        spread(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(label_col).alias("actual"),
            F.explode(words(F.col(text_col))).alias("word"),
        )
        .groupBy("doc_id", "actual", "word")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    contrib = (
        tf.join(weights, "word")
        .select(
            "doc_id",
            "actual",
            F.col("_tf"),
            F.posexplode(F.col("w")).alias("idx", "_wt"),
        )
        .groupBy("doc_id", "actual", "idx")
        .agg(F.sum(F.col("_tf") * F.col("_wt")).alias("_s"))
    )
    scored = contrib.join(F.broadcast(priors), "idx").withColumn(
        "_score", F.col("_s") + F.col("prior")
    )
    # argmax by (score desc, idx asc) as a combinable struct max
    best = scored.groupBy("doc_id", "actual").agg(
        F.max(F.struct(F.col("_score"), (-F.col("idx")).alias("_ni"))).alias("_b")
    )
    cls_arr = F.array(*[F.lit(c) for c in classes])
    # prior-argmax fallback for docs with no in-vocab words
    fallback = priors.agg(
        F.max(F.struct(F.col("prior"), (-F.col("idx")).alias("_ni"))).alias("_pb")
    ).select(
        (-F.col("_pb._ni")).cast("int").alias("_fb_idx"),
        F.col("_pb.prior").alias("_fb_score"),
    )
    out = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(label_col).alias("actual")
        )
        .join(best, ["doc_id", "actual"], "left")
        .crossJoin(F.broadcast(fallback))
        .select(
            "doc_id",
            "actual",
            F.element_at(
                cls_arr,
                F.coalesce((-F.col("_b._ni")).cast("int"), F.col("_fb_idx")) + 1,
            ).alias("predicted"),
            F.coalesce(F.col("_b._score"), F.col("_fb_score"))
            .cast("long")
            .alias("score"),
        )
        .withColumn("correct", F.col("predicted") == F.col("actual"))
    )
    return out
