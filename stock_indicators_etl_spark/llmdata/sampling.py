"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-and-partitioning dependent — re-running it on
a repartitioned 100 TB corpus yields a different subset, which poisons
reproducibility and incremental joins against previously-sampled data.
These operators key every decision off a content-stable hash of the
row id instead:

- :func:`hash_sample` — Bernoulli sampling by md5-uniform threshold.
  Scan-local (no shuffle, pushes nothing but a filter), stable under
  repartitioning, composable across runs (the same row is always in
  or out for a given rate).
- :func:`stratified_sample` — exact top-n per stratum by hash order —
  balanced class quotas (e.g. per-language caps) with one shuffle on
  the stratum key.

Hashing convention matches the dedup family (md5 hex → BIGINT via the
first 14 hex digits = 56 bits, exact in both Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from stock_indicators_etl_spark.llmdata.hashing import HASH_DOMAIN, h56


def _id_hash56(id_col: Column) -> Column:
    """56-bit uniform hash of an id (shared llmdata convention)."""
    return h56(id_col.cast("string"))


def hash_sample(df: DataFrame, rate: float, id_col: str = "doc_id") -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose id-hash falls
    below ``rate`` of the hash domain.

    The comparison is exact integer arithmetic (hash < ⌊rate·2^56⌋),
    so both engines agree bit-for-bit and the sample is a pure filter
    — no shuffle, no state, stable across runs and repartitioning.
    """
    threshold = int(rate * HASH_DOMAIN)
    return df.filter(_id_hash56(F.col(id_col)) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    n_per_stratum: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact per-stratum quota: the ``n_per_stratum`` rows with the
    smallest ``(id_hash, id)`` in each stratum — a deterministic
    "uniform n per class" draw.

    One shuffle on the stratum key; the rank is a combinable window
    (each partition pre-sorts its stratum slice). Skewed strata cost
    what any per-key top-n costs — at extreme skew, pre-filter with
    :func:`hash_sample` at a safe over-sampling rate first, then rank
    the survivors.
    """
    h = _id_hash56(F.col(id_col))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def token_shards(
    df: DataFrame,
    tokens_df: DataFrame,
    budget: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "n_subtokens",
    missing: str = "drop",
) -> DataFrame:
    """Pack documents into training shards of ~``budget`` tokens each,
    per stratum: docs are laid out in deterministic (id_hash, id)
    order and a doc lands in the shard containing its first token —
    ``shard_id = (running_total_before_doc) div budget``.

    ``tokens_df``: (id, token count) — e.g. ``text.token_counts``
    output. The layout order is content-stable (same hash family as
    :func:`hash_sample`), so re-running on a grown corpus only
    appends/perturbs locally rather than reshuffling every shard.

    ``missing`` sets the contract for docs in ``df`` absent from
    ``tokens_df`` (ADVICE r2: the silent inner join could quietly
    shrink shards on a partial tokens table):

    - ``"drop"`` (default): inner join — such docs are excluded.
    - ``"zero"``: keep them with a token count of 0 (they consume no
      budget but land in a shard).
    - ``"error"``: raise ``ValueError`` if any doc lacks a count (one
      extra anti-join count job at call time — eager, use in batch
      pipelines, not lazy query composition).

    One shuffle on the stratum key; the running sum is a combinable
    window. Strata are independent, so a skewed giant stratum can be
    split upstream (e.g. sub-stratify by hash prefix) without touching
    this operator.
    """
    if missing not in ("drop", "zero", "error"):
        raise ValueError(f"missing must be drop|zero|error, got {missing!r}")
    toks = tokens_df.select(id_col, tokens_col)
    if missing == "error":
        n_missing = df.select(id_col).join(toks, id_col, "left_anti").count()
        if n_missing:
            raise ValueError(
                f"token_shards: {n_missing} docs have no token count in "
                f"tokens_df (pass missing='drop' or 'zero' to accept)"
            )
    if missing == "zero":
        j = (
            df.select(id_col, strata_col)
            .join(toks, id_col, "left")
            .withColumn(tokens_col, F.coalesce(F.col(tokens_col), F.lit(0)))
        )
    else:
        j = df.select(id_col, strata_col).join(toks, id_col)
    h = _id_hash56(F.col(id_col))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    cum_before = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return j.select(
        id_col,
        strata_col,
        tokens_col,
        # double divide + truncate == integer DIV for non-negative
        # running totals below 2^53 tokens per stratum (a 100 T-token
        # corpus is ~1e14 — inside that); matches the oracle's `//`
        (cum_before / F.lit(budget)).cast("long").alias("shard_id"),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-Res): each row gets key ``ln(u) / w`` with
    ``u`` a content-stable uniform from the id hash and ``w`` its
    positive weight; the ``n`` LARGEST keys are the sample — exactly
    the distribution of sequential weighted draws without replacement.

    Why this shape at scale: the key is a scan-local expression (no
    shuffle, no state, no RNG), and top-n-by-key is a combinable
    TakeOrdered — each partition keeps its local n, the driver merges
    heaps. Re-running on a grown corpus preserves every prior row's
    key, so the sample only changes where the data did (same
    reproducibility contract as :func:`hash_sample`).

    Zero/negative weights are excluded (a zero-weight row can never
    be drawn). ``u`` is centered off 0 (``(h + 0.5) / 2^56``) so
    ``ln`` never sees 0.
    """
    u = (_id_hash56(F.col(id_col)) + F.lit(0.5)) / F.lit(float(HASH_DOMAIN))
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w
    return (
        df.filter(w > 0)
        .withColumn("sample_key", key)
        .orderBy(F.col("sample_key").desc(), F.col(id_col))
        .limit(n)
    )


def leakage_safe_split(
    df: DataFrame,
    components: DataFrame,
    fractions: tuple[float, float] = (0.8, 0.1),
    id_col: str = "doc_id",
    component_col: str = "component",
) -> DataFrame:
    """Train/val/test assignment that can never leak near-duplicates
    across splits: the split decision hashes the dedup COMPONENT (e.g.
    :func:`..dedup.neardup_components` output), so every member of a
    duplicate group lands in the same split — a doc-level hash split
    would put two near-identical docs in train and test and quietly
    inflate eval numbers.

    ``fractions`` = (train, val); test gets the remainder. The
    assignment is the same exact-integer hash-threshold arithmetic as
    :func:`hash_sample` (bit-identical across engines, stable under
    repartitioning and corpus growth — a component keeps its split
    forever unless dedup merges it into another, which is exactly
    when its members must move together anyway).

    One equi-join on the id (both sides can be bucketed on it at
    scale); the split itself is a scan-local expression.
    """
    f_train, f_val = fractions
    if not (0 < f_train and 0 <= f_val and f_train + f_val <= 1):
        raise ValueError(f"bad fractions {fractions!r}")
    t1 = int(f_train * HASH_DOMAIN)
    t2 = int((f_train + f_val) * HASH_DOMAIN)
    h = _id_hash56(F.col(component_col))
    split = (
        F.when(h < t1, F.lit("train"))
        .when(h < t2, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.join(
        components.select(id_col, component_col), id_col
    ).withColumn("split", split)


def mix_domains(
    df: DataFrame,
    weights: dict[str, int],
    total_out: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic dataset mixing: down-sample each domain so the
    output approximates the target mixture ``weights`` (integer
    ratios) at ~``total_out`` rows — the "60% web / 30% books / 10%
    code" recipe step of a training-data pipeline. Domains not in
    ``weights`` are dropped; a domain with fewer rows than its quota
    contributes everything it has (availability-capped, like real
    mixing runs).

    Every keep decision is the content-stable 56-bit id hash against
    a per-domain integer threshold: quota ``q_s = total·w_s DIV Σw``,
    threshold ``min(DOMAIN, (DOMAIN DIV n_s)·q_s)`` — all BIGINT, no
    float rates, so the subset is engine-exact and stable under
    repartitioning (same contract as :func:`hash_sample`).

    Plan: one tiny per-domain count aggregate, broadcast back; the
    filter itself is scan-local. The corpus is never shuffled.
    """
    wsum = sum(weights.values())
    quota_expr = None
    for name, w in weights.items():
        q = F.lit(total_out * w // wsum)
        quota_expr = (
            F.when(F.col(strata_col) == name, q)
            if quota_expr is None
            else quota_expr.when(F.col(strata_col) == name, q)
        )
    counts = (
        df.filter(F.col(strata_col).isin(*weights))
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_quota", quota_expr.cast("long"))
        .select(
            strata_col,
            F.when(F.col("_quota") >= F.col("_n"), F.lit(HASH_DOMAIN))
            .otherwise(
                F.expr(f"CAST({HASH_DOMAIN} AS BIGINT) DIV _n") * F.col("_quota")
            )
            .alias("_thr"),
        )
    )
    return (
        df.join(F.broadcast(counts), strata_col)
        .filter(_id_hash56(F.col(id_col)) < F.col("_thr"))
        .drop("_thr")
    )


def balanced_sample(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    per_class: int | None = None,
) -> DataFrame:
    """Class-rebalancing draw: the SAME number of rows from every
    class — ``per_class``, or the minimum class size when omitted —
    each class contributing its rows with the smallest ``(id_hash,
    id)``, the deterministic "balanced training subset" a classifier
    fine-tune wants.

    The min-size reduction is a classes-count aggregate collapsed to
    one broadcast row; selection is :func:`stratified_sample`'s single
    label-key shuffle + combinable rank. Majority-class skew costs
    what any per-key top-n costs; at extreme skew pre-thin the
    majority classes with :func:`hash_sample` first (over-sampling
    rate ≥ expected quota), then rank the survivors.
    """
    if per_class is not None:
        return stratified_sample(df, label_col, per_class, id_col)
    sizes = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("_n"))
    m = sizes.agg(F.min("_n").alias("_m"))
    h = _id_hash56(F.col(id_col))
    w = Window.partitionBy(label_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .crossJoin(F.broadcast(m))
        .filter(F.col("_rk") <= F.col("_m"))
        .drop("_rk", "_m")
    )


def temperature_mix(
    df: DataFrame,
    total_out: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    w_scale: int = 1000,
) -> DataFrame:
    """Temperature-balanced dataset mixing at α = 1/2 — the
    multilingual sampling-temperature recipe (domain weight ∝ n_s^α,
    mT5/XLM-R style): head domains are down-weighted toward the tail
    without anyone pinning hand-written ratios. Weights are computed
    IN-PLAN from the per-domain counts (``floor(sqrt(n)·w_scale)``),
    so nothing is collected and the operator stays one tiny aggregate
    + a broadcast threshold join + a scan-local filter, exactly like
    :func:`mix_domains`.

    α is FIXED at 1/2: IEEE-754 requires ``sqrt`` to be correctly
    rounded, so Spark and DuckDB compute the identical double and the
    integer weights are engine-exact — a general ``pow(n, α)`` has no
    such guarantee and would break the oracle contract (same reason
    the repo quantizes ``ln`` at birth). Keep decisions are the same
    content-stable hash thresholds as :func:`hash_sample`.
    """
    counts = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_w",
            F.floor(
                F.sqrt(F.col("_n").cast("double")) * F.lit(float(w_scale))
            ).cast("long"),
        )
    )
    tot = counts.agg(F.sum("_w").alias("_wsum"))
    thr = (
        counts.crossJoin(F.broadcast(tot))  # 1-row total frame
        .withColumn(
            "_quota",
            F.expr(f"CAST({total_out} AS BIGINT) * _w DIV _wsum"),
        )
        .select(
            strata_col,
            F.when(F.col("_quota") >= F.col("_n"), F.lit(HASH_DOMAIN))
            .otherwise(
                F.expr(f"CAST({HASH_DOMAIN} AS BIGINT) DIV _n")
                * F.col("_quota")
            )
            .alias("_thr"),
        )
    )
    return (
        df.join(F.broadcast(thr), strata_col)
        .filter(_id_hash56(F.col(id_col)) < F.col("_thr"))
        .drop("_thr")
    )


def temporal_split(
    df: DataFrame,
    ts_ns_col: str,
    train_end_ns: int,
    embargo_ns: int = 0,
) -> DataFrame:
    """Purged time-based train/test split — the temporal counterpart
    of :func:`leakage_safe_split` (which guards CONTENT leakage via
    dedup components; this guards TEMPORAL leakage): rows strictly
    before ``train_end_ns`` are ``train``; rows inside the embargo
    window ``[train_end, train_end + embargo)`` are tagged
    ``embargo`` and DROPPED from both sides (autocorrelated
    features straddling the boundary would leak future information
    into training — the purged-split rule from financial ML); the
    rest are ``test``.

    Integer-ns comparisons only (floats would ulp-flip rows at the
    boundary), a PURE SCAN — zero shuffles, runs unchanged on a
    stream, and the split is stable under corpus growth (a row's tag
    is a function of its own timestamp alone).

    Output: the input rows + ``split`` ∈ {train, embargo, test}.
    """
    ts = F.col(ts_ns_col).cast("long")
    split = (
        F.when(ts < F.lit(int(train_end_ns)), F.lit("train"))
        .when(
            ts < F.lit(int(train_end_ns) + int(embargo_ns)), F.lit("embargo")
        )
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)
