"""Data-quality expectation checks (great-expectations-lite).

North-star relational-ETL surface (reference N/A — the reference
trusts yfinance output; a 100 TB ingest cannot). Two shapes:

- :func:`dq_summary` — N rule conditions evaluated in ONE pass over
  the table (each rule is a Column predicate; violations are
  conditional sums inside a single aggregate — adding a rule adds an
  expression, not a scan), then unpivoted to one row per rule so the
  result is append-able to a QA history table.
- :func:`referential_violations` — orphan foreign keys via LEFT ANTI
  join (the plan Spark gives NOT EXISTS), counted per child table.

Both are exact counting — oracle-checkable bit-exactly — and both
are combinable aggregates: map-side partial sums, no wide rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_summary(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """(rule, n_rows, n_violations, violation_rate_ppm) — one row per
    rule, ONE scan for all rules. A rule's Column is the VIOLATION
    predicate (true = bad row); nulls count as violations (an
    unevaluable expectation is a failed one)."""
    if not rules:
        raise ValueError("need at least one rule")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(F.coalesce(cond.cast("long"), F.lit(1))).alias(name)
        )
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{n}', `{n}`" for n in rules)
    return wide.selectExpr(
        "_n", f"stack({len(rules)}, {stack}) AS (rule, n_violations)"
    ).select(
        "rule",
        F.col("_n").alias("n_rows"),
        "n_violations",
        # ppm in integer arithmetic: exact cross-engine
        F.expr("n_violations * 1000000 div _n").alias("violation_rate_ppm"),
    )


def referential_violations(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Count child rows whose ``fk`` has no matching ``pk`` (LEFT
    ANTI join — null fks count as orphans, matching SQL NOT EXISTS
    with a null-rejecting equality)."""
    orphans = child.join(
        parent.select(F.col(pk).alias("_pk")),
        child[fk] == F.col("_pk"),
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_orphans"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two table snapshots — the validation
    step every incremental pipeline needs ("what did this batch
    actually change?"). Returns ``(key, change)`` with change in
    {added, removed, changed, unchanged}.

    Plan: each side reduces to ``(key, md5(content))`` scan-locally
    (only ``compare_cols`` are read — column pruning reaches the
    scan), then ONE full-outer equi-join on the key decides the
    change class from null-ness + hash equality. Content hashing uses
    the same md5 convention as the dedup family, so the classification
    is engine-exact and the shuffle carries 2 narrow columns, never
    the row payload."""
    cols = compare_cols or [c for c in old.columns if c != key_col]

    def side(df: DataFrame, name: str) -> DataFrame:
        # unit-separator between columns: without one, ("ab","c") and
        # ("a","bc") would hash identically and a changed row could
        # classify as unchanged
        h = F.md5(
            F.concat_ws(
                "\x1f",
                *[F.coalesce(F.col(c).cast("string"), F.lit("\x01")) for c in cols],
            )
        )
        return df.select(F.col(key_col).alias("_k"), h.alias(name))

    j = side(old, "_ho").join(side(new, "_hn"), "_k", "full_outer")
    change = (
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") == F.col("_hn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col("_k").alias(key_col), change.alias("change"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """One row per change class with counts — the QA gate an
    orchestrator asserts on ("this daily batch may not remove rows")."""
    return (
        snapshot_diff(old, new, key_col, compare_cols)
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    n_bins: int = 16,
) -> DataFrame:
    """Per-key distribution drift between two snapshots as EXACT
    total-variation distance over an equi-width histogram — the
    monitor a feature pipeline runs between yesterday's and today's
    data before trusting a model with it.

    Exactness trick: TVD = ½·Σ|ca/na − cb/nb| has a float sum whose
    order differs across engines, so it is computed as the INTEGER
    statistic ``Σ_bins |ca·nb − cb·na|`` (associative, order-free,
    exact BIGINT) followed by ONE IEEE division by ``2·na·nb`` — the
    same single-division discipline as the sketch estimators. Bins
    are integer arithmetic over shared per-key min/max cents from
    the UNION of both snapshots (1-row-per-key broadcast), so bin
    boundaries cannot drift between engines either.

    Plan: one combinable bounds pass + one combinable (key, bin,
    side) count + a per-key fold over ≤ n_bins rows. Keys absent
    from one side get TVD 1.0 (all mass moved) via the same formula.
    """
    keys = list(key_cols)
    a = df_a.select(*keys, F.col(value_col).alias("_v")).withColumn(
        "_side", F.lit("a")
    )
    b = df_b.select(*keys, F.col(value_col).alias("_v")).withColumn(
        "_side", F.lit("b")
    )
    u = a.unionByName(b).withColumn(
        "_cents", F.floor(F.col("_v") * 100 + F.lit(0.5)).cast("long")
    )
    bounds = u.groupBy(*keys).agg(
        F.min("_cents").alias("_mn"), F.max("_cents").alias("_mx")
    )
    binned = u.join(F.broadcast(bounds), keys).withColumn(
        "_bin",
        F.expr(f"(_cents - _mn) * {int(n_bins)} div (_mx - _mn + 1)"),
    )
    counts = (
        binned.groupBy(*keys, "_bin")
        .agg(
            F.sum((F.col("_side") == "a").cast("long")).alias("ca"),
            F.sum((F.col("_side") == "b").cast("long")).alias("cb"),
        )
    )
    totals = counts.groupBy(*keys).agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    return (
        counts.join(F.broadcast(totals), keys)
        .groupBy(*keys, "n_a", "n_b")
        .agg(
            F.count(F.lit(1)).alias("n_bins_used"),
            F.sum(
                F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a"))
            ).alias("l1_scaled"),
        )
        .select(
            *keys,
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_bins_used").cast("long").alias("n_bins_used"),
            F.col("l1_scaled").cast("long").alias("l1_scaled"),
            F.when(
                (F.col("n_a") == 0) | (F.col("n_b") == 0), F.lit(1.0)
            )
            .otherwise(
                F.col("l1_scaled").cast("double")
                / (F.lit(2.0) * F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            )
            .alias("tvd"),
        )
    )


def kl_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    n_bins: int = 16,
) -> DataFrame:
    """Per-key Kullback–Leibler drift ``KL(P_b ‖ P_a)`` between two
    snapshots over the shared equi-width histogram — the asymmetric
    companion to :func:`histogram_drift`'s TVD (KL weights tail
    surprises exponentially, TVD counts moved mass linearly; a
    monitoring stack wants both).

    Float discipline: a KL sum has no integer closed form (it needs
    ``ln``), so instead of a GROUP-BY float sum (engine-order-
    dependent) each key's bins are collected into a bin-ORDERED array
    and folded left with a 0.0 seed — the ``aggregate``/``list_reduce``
    sequence both engines replay identically. Add-one (Laplace)
    smoothing over all ``n_bins`` bins keeps every log argument
    finite and makes absent-side keys well-defined (uniform vs
    observed). Bins are materialized densely per key (keys × n_bins
    rows — a shuffle-sized frame, never driver-side).
    """
    keys = list(key_cols)
    a = df_a.select(*keys, F.col(value_col).alias("_v")).withColumn(
        "_side", F.lit("a")
    )
    b = df_b.select(*keys, F.col(value_col).alias("_v")).withColumn(
        "_side", F.lit("b")
    )
    u = a.unionByName(b).withColumn(
        "_cents", F.floor(F.col("_v") * 100 + F.lit(0.5)).cast("long")
    )
    bounds = u.groupBy(*keys).agg(
        F.min("_cents").alias("_mn"), F.max("_cents").alias("_mx")
    )
    binned = u.join(F.broadcast(bounds), keys).withColumn(
        "_bin",
        F.expr(f"(_cents - _mn) * {int(n_bins)} div (_mx - _mn + 1)"),
    )
    counts = binned.groupBy(*keys, "_bin").agg(
        F.sum((F.col("_side") == "a").cast("long")).alias("ca"),
        F.sum((F.col("_side") == "b").cast("long")).alias("cb"),
    )
    spark = df_a.sparkSession
    bins = spark.range(n_bins).select(F.col("id").alias("_bin"))
    frame = (
        counts.select(*keys).distinct().crossJoin(F.broadcast(bins))
        .join(counts, [*keys, "_bin"], "left")
        .select(
            *keys,
            "_bin",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    totals = frame.groupBy(*keys).agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    packed = (
        frame.join(F.broadcast(totals), keys)
        .groupBy(*keys, "n_a", "n_b")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_bin", "ca", "cb"))
            ).alias("_arr")
        )
    )
    na_k = F.col("n_a").cast("double") + F.lit(float(n_bins))
    nb_k = F.col("n_b").cast("double") + F.lit(float(n_bins))
    kl = F.aggregate(
        F.col("_arr"),
        F.lit(0.0),
        lambda acc, s: acc
        + ((s.getField("cb").cast("double") + F.lit(1.0)) / nb_k)
        * F.log(
            ((s.getField("cb").cast("double") + F.lit(1.0)) / nb_k)
            / ((s.getField("ca").cast("double") + F.lit(1.0)) / na_k)
        ),
    )
    return packed.select(
        *keys,
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        kl.alias("kl"),
    )


def ks_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Per-key EXACT two-sample Kolmogorov–Smirnov statistic between
    two snapshots — the bin-free member of the drift family
    (:func:`histogram_drift` = binned TVD, :func:`kl_drift` = binned
    KL): ``D = max_x |F_a(x) − F_b(x)|`` over the empirical CDFs,
    sensitive to location/shape shifts a coarse histogram can smear
    away, with the classical distribution-free critical values.

    Exactness: the float CDF difference ``|cum_a/n_a − cum_b/n_b|``
    is engine-order-fragile, so the statistic is the INTEGER
    ``max |cum_a·n_b − cum_b·n_a|`` over the merged distinct values
    followed by ONE division — the TVD cross-multiplication
    discipline. Cross products accumulate in DECIMAL(38,0): at
    ~10¹² rows/side per key the BIGINT product ``cum·n`` wraps (the
    ols_by_key overflow class); DuckDB's HUGEINT is already exact.
    Values quantize to integer cents so group keys are exact.

    Plan: one combinable (key, cents) count carrying both sides, one
    per-key running-sum window over the DISTINCT-value frame (rows =
    distinct values per key, not observations), one combinable max.
    A key with ~billions of distinct values makes the per-key sort
    the cost — that is inherent to exact KS; cap value cardinality
    upstream (quantization already does) or fall back to the binned
    TVD monitor when distinct values ≫ memory.

    Output: ``(keys…, n_a, n_b, n_values, d_num, ks)`` — ``d_num``
    the exact integer numerator (double after one exact-int cast),
    ``ks = d_num/(n_a·n_b)``; absent-side keys report 1.0.
    """
    from pyspark.sql.window import Window

    keys = list(key_cols)
    a = df_a.select(*keys, F.col(value_col).alias("_v")).withColumn(
        "_side", F.lit("a")
    )
    b = df_b.select(*keys, F.col(value_col).alias("_v")).withColumn(
        "_side", F.lit("b")
    )
    u = a.unionByName(b).withColumn(
        "_cents", F.floor(F.col("_v") * 100 + F.lit(0.5)).cast("long")
    )
    counts = u.groupBy(*keys, "_cents").agg(
        F.sum((F.col("_side") == "a").cast("long")).alias("ca"),
        F.sum((F.col("_side") == "b").cast("long")).alias("cb"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn(
        "_cuma", F.sum("ca").over(w).cast("decimal(19,0)")
    ).withColumn("_cumb", F.sum("cb").over(w).cast("decimal(19,0)"))
    totals = counts.groupBy(*keys).agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    nad = F.col("n_a").cast("decimal(19,0)")
    nbd = F.col("n_b").cast("decimal(19,0)")
    stat = (
        cum.join(F.broadcast(totals), keys)
        .groupBy(*keys, "n_a", "n_b")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.max(
                F.abs(F.col("_cuma") * nbd - F.col("_cumb") * nad)
            ).alias("_dnum"),
        )
    )
    ks = F.when(
        (F.col("n_a") == 0) | (F.col("n_b") == 0), F.lit(1.0)
    ).otherwise(
        F.col("_dnum").cast("double") / (nad * nbd).cast("double")
    )
    return stat.select(
        *keys,
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("n_values").cast("long").alias("n_values"),
        F.col("_dnum").cast("double").alias("d_num"),
        ks.alias("ks"),
    )


def skew_report(
    df: DataFrame,
    key_cols: tuple[str, ...],
    top_n: int = 10,
) -> DataFrame:
    """Join/aggregation-key skew diagnostic — the pre-flight a 100 TB
    job runs BEFORE shuffling on a key: per-key row counts reduced to
    (a) the ``top_n`` heaviest keys with their share in ppm, and (b)
    one summary row with the key count, row count, max/mean key ratio
    (in ppm of a uniform share) and the exact Gini coefficient of the
    key distribution in ppm — the single number that says "salt this
    key" (Gini → 0 uniform, → 1 one hot key).

    Exactness: Gini over counts ``x₁ ≤ … ≤ xₖ`` is
    ``Σ(2i − k − 1)·xᵢ / (k·Σx)`` — the numerator is an exact BIGINT
    over a rank window (DECIMAL(38,0) for the rows² product class),
    the ppm report is integer DIV. The whole report is integers.

    Plan: one combinable (key) count (the thing being diagnosed costs
    this anyway), then all further work happens on the KEY-count
    frame — bounded by key cardinality, not rows: a k-row rank
    window + one combinable aggregate + a TakeOrdered top_n.

    Output rows: ``kind='top'`` (rank, key string, n_rows, share_ppm)
    and one ``kind='summary'`` (n_keys, n_rows, max_over_mean_ppm,
    gini_ppm).
    """
    from pyspark.sql.window import Window

    keys = list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    key_str = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    kc = counts.select(key_str.alias("key"), F.col("n").cast("long").alias("n"))
    totals = kc.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
    )
    top = (
        kc.crossJoin(F.broadcast(totals))
        .orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(top_n)
    )
    wr = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    top_rows = top.withColumn("rank", F.row_number().over(wr)).select(
        F.lit("top").alias("kind"),
        F.col("rank").cast("long").alias("rank"),
        "key",
        F.col("n").alias("n_rows"),
        F.expr("n * 1000000 div n_rows").cast("long").alias("share_ppm"),
        F.lit(None).cast("long").alias("n_keys"),
        F.lit(None).cast("long").alias("max_over_mean_ppm"),
        F.lit(None).cast("long").alias("gini_ppm"),
    )
    # Gini numerator over ascending counts (ties broken by key for a
    # deterministic-but-irrelevant order: the numerator value is
    # tie-order-invariant because tied x contribute linearly in i)
    wg = Window.orderBy(F.col("n").asc(), F.col("key").asc())
    ranked = kc.withColumn("_i", F.row_number().over(wg))
    gsum = ranked.crossJoin(F.broadcast(totals)).agg(
        F.sum(
            (
                F.lit(2).cast("decimal(19,0)") * F.col("_i").cast("decimal(19,0)")
                - F.col("n_keys").cast("decimal(19,0)")
                - F.lit(1).cast("decimal(19,0)")
            )
            * F.col("n").cast("decimal(19,0)")
        ).alias("_gnum"),
        F.max("n").alias("_mx"),
        F.max("n_keys").alias("n_keys"),
        F.max("n_rows").alias("n_rows"),
    )
    # ratio outputs go through ONE cast-to-double per exact-integer
    # operand + one division + floor — a fixed correctly-rounded IEEE
    # sequence, engine-exact at any magnitude (decimal-quotient
    # rounding would HALF_UP at the result scale before a floor)
    mom = F.floor(
        (F.col("_mx").cast("decimal(19,0)") * F.col("n_keys").cast("decimal(19,0)"))
        .cast("double")
        * F.lit(1_000_000.0)
        / F.col("n_rows").cast("double")
    )
    gini = F.floor(
        F.col("_gnum").cast("double")
        * F.lit(1_000_000.0)
        / (
            F.col("n_keys").cast("decimal(19,0)")
            * F.col("n_rows").cast("decimal(19,0)")
        ).cast("double")
    )
    summary = gsum.select(
        F.lit("summary").alias("kind"),
        F.lit(None).cast("long").alias("rank"),
        F.lit(None).cast("string").alias("key"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.lit(None).cast("long").alias("share_ppm"),
        F.col("n_keys").cast("long").alias("n_keys"),
        mom.cast("long").alias("max_over_mean_ppm"),
        gini.cast("long").alias("gini_ppm"),
    )
    return top_rows.unionByName(summary)


#: quantile marks for the profiler's numeric leg, in parts-per-million
#: (0 = min, 1000000 = max — one selection rule covers the extremes)
PROFILE_Q_PPM = (0, 250_000, 500_000, 750_000, 1_000_000)


def column_profile(
    df: DataFrame,
    cols: tuple[str, ...],
    top_n: int = 5,
    num_cols: tuple[str, ...] = (),
    q_ppm: tuple[int, ...] = PROFILE_Q_PPM,
) -> DataFrame:
    """One-pass column profiler — per column the row count, null
    count, distinct count, the ``top_n`` most frequent values, and
    (for ``num_cols``) exact discrete quantiles: the first look a
    data engineer takes at an unknown table, and the ops artifact a
    pipeline publishes next to a new dataset.

    Plan: ONE ``stack`` unpivot (N columns → N rows per input row,
    scan-local) + one combinable (column, value) count; everything
    after — the per-column top window, the distinct/null summary,
    the quantile selection — operates on the VALUE-COUNT frame,
    bounded by Σ per-column cardinalities, never the table. Adding a
    column adds an unpivot arm, not a scan; adding the quantile leg
    adds one cardinality-bounded window, not a second pass (r9
    VERDICT next #8 — at 100 TB a numeric column wants its quantiles
    from the same pass that counted it).

    Quantiles are EXACT discrete (type-1) order statistics computed
    from the value counts by running-sum rank containment: for each
    mark q the target rank is ``max(1, ⌈q·n/10⁶⌉)`` (pure integer
    ceiling-division — engine-exact) and the emitted value is the one
    whose cumulative count first covers that rank. q=0 is the min and
    q=10⁶ the max under the same rule. Values order numerically
    (string casts would rank "10" < "2").

    Output rows: ``kind='top'`` (col, rank, value, n), one
    ``kind='summary'`` per column (n_rows, n_null, n_distinct), and
    ``kind='quantile'`` per (numeric col, mark) with ``rank`` holding
    the mark in ppm and ``value`` the selected element.
    """
    from pyspark.sql.window import Window

    n_rows = df.count()  # one cheap count job; reused as a literal
    arms = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
    unpiv = df.selectExpr(f"stack({len(cols)}, {arms}) AS (col, val)")
    counts = (
        unpiv.filter(F.col("val").isNotNull())
        .groupBy("col", "val")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("col").orderBy(F.col("n").desc(), F.col("val").asc())
    top = (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            F.lit("top").alias("kind"),
            "col",
            F.col("rank").cast("long").alias("rank"),
            F.col("val").alias("value"),
            F.col("n").cast("long").alias("n"),
            F.lit(None).cast("long").alias("n_rows"),
            F.lit(None).cast("long").alias("n_null"),
            F.lit(None).cast("long").alias("n_distinct"),
        )
    )
    summary = counts.groupBy("col").agg(
        F.sum("n").alias("_nn"), F.count(F.lit(1)).alias("_nd")
    ).select(
        F.lit("summary").alias("kind"),
        "col",
        F.lit(None).cast("long").alias("rank"),
        F.lit(None).cast("string").alias("value"),
        F.lit(None).cast("long").alias("n"),
        F.lit(int(n_rows)).alias("n_rows"),
        (F.lit(int(n_rows)) - F.col("_nn")).cast("long").alias("n_null"),
        F.col("_nd").cast("long").alias("n_distinct"),
    )
    out = top.unionByName(summary)
    if not num_cols:
        return out
    # quantile leg: running count over the numerically-ordered value
    # counts; the mark's value is the row whose cumulative count
    # first covers the target rank (cum−n < t ≤ cum). Everything is
    # BIGINT (ceiling division via (q·nn + 10⁶−1) div 10⁶), so both
    # engines select the identical element. Unparseable values are
    # EXCLUDED before ranking via try_cast (ADVICE r10): a plain cast
    # either throws (ANSI mode, Spark 4 default) or yields NULLs that
    # sort first — both diverge from a strict-SQL oracle; instead both
    # sides drop non-castable rows and compute nn over the castable
    # population only.
    wq = Window.partitionBy("col").orderBy(
        F.col("val").try_cast("double").asc(), F.col("val").asc()
    )
    castable = counts.filter(
        F.col("col").isin(list(num_cols))
        & F.col("val").try_cast("double").isNotNull()
    )
    nums = (
        castable.withColumn("cum", F.sum("n").over(wq))
        .join(
            castable.groupBy("col").agg(F.sum("n").alias("_nn")),
            "col",
        )
    )
    marks = F.explode(
        F.array(*[F.lit(int(q)).cast("long") for q in q_ppm])
    ).alias("q")
    t = F.greatest(
        F.lit(1).cast("long"),
        F.expr("(q * _nn + 999999) div 1000000"),
    )
    quant = (
        nums.select("col", "val", "n", "cum", "_nn", marks)
        .withColumn("_t", t)
        .filter((F.col("cum") >= F.col("_t")) & (F.col("cum") - F.col("n") < F.col("_t")))
        .select(
            F.lit("quantile").alias("kind"),
            "col",
            F.col("q").alias("rank"),
            F.col("val").alias("value"),
            F.lit(None).cast("long").alias("n"),
            F.lit(None).cast("long").alias("n_rows"),
            F.lit(None).cast("long").alias("n_null"),
            F.lit(None).cast("long").alias("n_distinct"),
        )
    )
    return out.unionByName(quant)
