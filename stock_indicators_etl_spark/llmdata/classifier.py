"""Distributed linear-classifier training with a bit-exact oracle.

Batch perceptron over int8 scalar-quantized embedding codes: the one
classical trainer whose every update is INTEGER arithmetic —
``margin_i = y_i·Σ_j w_j·x_ij`` (BIGINT), epoch update
``w_j += Σ_{margin ≤ 0} y_i·x_ij`` — so a fixed number of epochs
replays bit-exactly in SQL (the pagerank/k-means unrolled-oracle
strategy), where float logistic regression would drift on ``exp``
in the last ulp.

Shape per epoch: one broadcast join of the (dim)-row weight table
against the exploded code stream + one combinable groupBy(j) — the
classic data-parallel full-batch update. Nothing is collected: the
weight state stays a 64-row DataFrame, and at 100 TB the per-epoch
cost is exactly two scans of the (quantized, 4× smaller than float)
code stream. Quantization reuses the ``sq_topk`` code expression, so
codes here rank-match the ANN family's.

The batch perceptron is not logistic regression — it is the honest
integer-exact member of the linear-classifier family, converging on
separable data and oscillating boundedly otherwise; fixed-epoch
training is deterministic either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    codes = sq_codes(embeddings, vec_col, id_col, dim)
    y = F.when(F.col(label_col) >= positive_min, 1).otherwise(-1)
    labels = embeddings.select(
        F.col(id_col).alias("id"), y.cast("long").alias("y")
    )
    xy = codes.join(labels, "id")

    w = spark.range(dim).select(
        F.col("id").alias("j"), F.lit(0).cast("long").alias("w")
    )
    n_mis_val = 0
    epochs_run = 0
    for _ in range(epochs):
        margins = (
            xy.join(F.broadcast(w), "j")
            .groupBy("id", "y")
            .agg(F.sum(F.col("w") * F.col("x")).alias("_dot"))
            .withColumn("_mis", (F.col("y") * F.col("_dot") <= 0))
        )
        mis = margins.filter(F.col("_mis")).select("id", "y")
        # plain equi-join on id — the misclassified set can be
        # corpus-sized (epoch 1 it IS the corpus), so never broadcast
        # it; AQE picks the strategy
        delta = (
            xy.drop("y")
            .join(mis, "id")
            .groupBy("j")
            .agg(
                F.sum(F.col("y") * F.col("x")).alias("_d"),
                F.count(F.lit(1)).alias("_nm"),
            )
        )
        w = (
            w.join(delta, "j", "left")
            .select(
                "j",
                (F.col("w") + F.coalesce(F.col("_d"), F.lit(0))).alias("w"),
                F.coalesce(F.col("_nm"), F.lit(0)).alias("_nm"),
            )
        )
        # 64-row state: pin it so the next epoch's lineage does not
        # replay every earlier epoch's joins
        w = w.localCheckpoint(eager=True)
        epochs_run += 1
        # 64-row checkpoint read, no recompute (_nm is identical on
        # every row; max is just the null-safe reduction)
        n_mis_val = int(w.agg(F.max("_nm")).collect()[0][0] or 0)
        w = w.select("j", "w")
        if n_mis_val == 0:
            break
    if _stats is not None:
        _stats["epochs_run"] = epochs_run
    return w.select(
        "j", "w", F.lit(n_mis_val).cast("long").alias("n_mis")
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
