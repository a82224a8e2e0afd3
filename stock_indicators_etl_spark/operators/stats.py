"""Group-wise statistical aggregates (OLS regression / correlation).

North-star analytics surface (reference N/A — the reference computes
per-ticker indicators; the natural next ask is "slope of this metric
per group"). The scale-and-exactness trick mirrors the TPC-H revenue
idiom: quantize inputs to INTEGERS (y to ``1/y_scale`` units), reduce
with BIGINT sums — associative, order-free, exact at any group size —
and form slope/intercept/correlation as double expressions over those
exact integers. Two engines computing the same IEEE expression over
identical integers produce identical doubles (sqrt is correctly
rounded per IEEE 754), so the operator is oracle-checkable bit-exact
without any collect_list fold.

One combinable groupBy; everything else scan-local.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ols_by_key(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    y_scale: int = 100,
) -> DataFrame:
    """Per-key least-squares fit of ``y ~ x``: (key, n, slope,
    intercept, r). ``x`` must be integer-valued; ``y`` is quantized
    to 1/y_scale units first (slope/intercept are reported in the
    quantized y units per x unit). Degenerate groups (zero x or y
    variance) get null slope/r.

    The product sums accumulate in DECIMAL(38,0) — Spark's exact
    128-bit integer — NOT BIGINT: x is a raw id-scale integer, so
    Σx² is ~(max_id)²·n and blows through 2^63 long before the data
    is big (the sf1 decade caught exactly this: 9×10⁷ ids × 2×10⁵
    rows/key ≈ 1.6×10²¹). DuckDB already sums BIGINT into HUGEINT,
    so the oracle was always exact — this makes the Spark side match
    (both convert the same exact integer to double once, at the
    end)."""
    x = F.col(x_col).cast("long")
    y = F.floor(F.col(y_col) * y_scale + F.lit(0.5)).cast("long")
    # decimal(19,0) holds any BIGINT; the product promotes to
    # decimal(38,0), which holds (2^63)² — the full pairwise range
    xd = x.cast("decimal(19,0)")
    yd = y.cast("decimal(19,0)")
    agg = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    cov_n = nd * sxy - sx * sy
    var_x = nd * sxx - sx * sx
    var_y = nd * syy - sy * sy
    slope = F.when(var_x > 0, cov_n / var_x)
    return agg.select(
        key_col,
        "n",
        slope.alias("slope"),
        F.when(var_x > 0, (sy - (cov_n / var_x) * sx) / nd).alias("intercept"),
        F.when(
            (var_x > 0) & (var_y > 0), cov_n / F.sqrt(var_x * var_y)
        ).alias("r"),
    )


def winsorize_stats(
    df: DataFrame,
    key_col: str,
    val_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    y_scale: int = 100,
) -> DataFrame:
    """Per-key winsorization summary: exact quantile bounds at
    ``lo``/``hi`` (Spark ``percentile`` ≡ DuckDB ``quantile_cont``,
    both linear interpolation at rank (n−1)·q, 6dp-rounded), then a
    second pass counts and re-sums the clipped distribution —
    ``sum_clipped`` in exact integer 1/y_scale units so the hash gate
    needs no float-sum tolerance.

    Plan: one combinable quantile aggregate per key, broadcast the
    tiny per-key bounds frame back onto the scan, one combinable
    final aggregate. The outlier-capping pass every feature pipeline
    runs before normalization.
    """
    return _winsorize_with_bounds(
        df,
        key_col,
        val_col,
        _exact_bounds(df, key_col, val_col, lo, hi),
        y_scale,
    )


def winsorize_stats_approx(
    df: DataFrame,
    key_col: str,
    val_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    y_scale: int = 100,
    accuracy: int = 10_000,
) -> DataFrame:
    """Production-scale winsorization: identical plan shape to
    :func:`winsorize_stats` but bounds come from ``approx_percentile``
    (Greenwald–Khanna sketch) — a COMBINABLE map-side aggregate whose
    per-key state is O(accuracy·log n), where exact ``percentile``
    buffers and sorts every group value (the steepest non-ANN sweep
    exponent at sf0.1: 2.29 s exact vs 0.09 s DuckDB). At 100 TB the
    exact form is a per-key full sort; the sketch is the right
    default, with rank error ≤ 1/accuracy (quantile rank, not value).

    The exact twin stays as the DuckDB hash-harness oracle; this
    variant is threshold-tested instead (bounds within the observed
    value range, clipped counts within the rank-error envelope).
    """
    bounds = df.groupBy(key_col).agg(
        F.expr(
            f"approx_percentile(CAST({val_col} AS DOUBLE), "
            f"array({lo}, {hi}), {accuracy})"
        ).alias("_b")
    ).select(
        key_col,
        F.col("_b")[0].alias("lo_bound"),
        F.col("_b")[1].alias("hi_bound"),
    )
    return _winsorize_with_bounds(df, key_col, val_col, bounds, y_scale)


def _exact_bounds(
    df: DataFrame, key_col: str, val_col: str, lo: float, hi: float
) -> DataFrame:
    return df.groupBy(key_col).agg(
        F.floor(
            F.expr(f"percentile(CAST({val_col} AS DOUBLE), {lo})") * 1e6
            + F.lit(0.5)
        ).cast("double").alias("_lo6"),
        F.floor(
            F.expr(f"percentile(CAST({val_col} AS DOUBLE), {hi})") * 1e6
            + F.lit(0.5)
        ).cast("double").alias("_hi6"),
    ).select(
        key_col,
        (F.col("_lo6") / 1e6).alias("lo_bound"),
        (F.col("_hi6") / 1e6).alias("hi_bound"),
    )


def _winsorize_with_bounds(
    df: DataFrame,
    key_col: str,
    val_col: str,
    bounds: DataFrame,
    y_scale: int,
) -> DataFrame:
    v = F.col(val_col).cast("double")
    joined = df.join(F.broadcast(bounds), key_col)
    clipped = F.greatest(F.least(v, F.col("hi_bound")), F.col("lo_bound"))
    cents = F.floor(clipped * y_scale + F.lit(0.5)).cast("long")
    return joined.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((v < F.col("lo_bound")).cast("long")).alias("n_clipped_lo"),
        F.sum((v > F.col("hi_bound")).cast("long")).alias("n_clipped_hi"),
        F.min("lo_bound").alias("lo_bound"),
        F.min("hi_bound").alias("hi_bound"),
        F.sum(cents).alias("sum_clipped_cents"),
    )


def _r6(c):
    return (
        F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("double") / F.lit(1e6)
    )


def mad_outliers(
    df: DataFrame,
    key_col: str,
    val_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Per-key robust outlier summary via median absolute deviation:
    (key, n, med, mad, n_outliers) where a row is an outlier when
    ``|v − med| > k·mad``. The robust twin of z-score filtering — the
    profiling pass a feature pipeline runs where means/stddevs would
    be dragged by the very outliers being hunted.

    Plan: two exact-percentile aggregates (median, then median of
    deviations over the median-joined scan), each joined back by
    BROADCAST (the per-key frame is |keys| rows), one final
    combinable aggregate — the base table is scanned, never shuffled.
    Exactness: both medians are 6dp-floor-rounded after the quantile
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``, same (n−1)·q
    linear interpolation); every downstream op (abs, subtract, k·mad,
    compare) is a fixed sequence of correctly-rounded IEEE ops, so
    the outlier set is bit-exact cross-engine."""
    v = F.col(val_col).cast("double")
    med = df.groupBy(key_col).agg(
        _r6(F.percentile(v, F.lit(0.5))).alias("med")
    )
    j = df.join(F.broadcast(med), key_col).withColumn(
        "_dev", F.abs(v - F.col("med"))
    )
    mad = j.groupBy(key_col).agg(
        _r6(F.percentile(F.col("_dev"), F.lit(0.5))).alias("mad")
    )
    return (
        j.join(F.broadcast(mad), key_col)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(
                (F.col("_dev") > F.lit(k) * F.col("mad")).cast("long")
            ).alias("n_outliers"),
        )
    )


def equi_width_histogram(
    df: DataFrame,
    val_col: str,
    nbins: int = 16,
    scale: int = 100,
) -> DataFrame:
    """Equi-width histogram of a numeric column: (bucket, n, lo, hi,
    sum_cents). The data-profiling primitive (skew inspection, bounds
    sanity) run before choosing partition counts at scale.

    Plan: one combinable min/max aggregate produces a 1-row bounds
    frame, broadcast back via crossJoin; the bucket index is computed
    per row in EXACT integer arithmetic — values quantized to
    1/scale units, ``(c − min)·nbins DIV (max − min + 1)`` — so no
    float boundary can put a row in different buckets cross-engine
    (operands are non-negative, so truncating DIV ≡ floor ÷).
    One final combinable aggregate; two passes over the scan, zero
    shuffles of the base data."""
    cents = F.floor(F.col(val_col) * scale + F.lit(0.5)).cast("long")
    bounds = df.agg(
        F.min(cents).alias("_minc"), F.max(cents).alias("_maxc")
    )
    j = (
        df.select(cents.alias("_c"), F.col(val_col).alias("_v"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "_c",
            "_v",
            ((F.col("_c") - F.col("_minc")) * F.lit(nbins)).alias("_num"),
            (F.col("_maxc") - F.col("_minc") + F.lit(1)).alias("_den"),
        )
        .withColumn("bucket", F.expr("_num DIV _den"))
    )
    return j.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("_v").alias("lo"),
        F.max("_v").alias("hi"),
        F.sum("_c").alias("sum_cents"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    scale: int = 100,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-key time-weighted average (TWAP) over an IRREGULAR series:
    each observation holds until the next one, so its weight is the
    gap to the successor (the final observation carries no weight —
    its holding interval is open). The right mean for unevenly
    sampled prices, where the arithmetic mean over-weights bursts.

    ``ts_col`` must be integer epoch-ns. Plan: ONE window pass (lead
    over the per-key time sort — same shuffle the indicator kernels
    ride) and one combinable aggregate. Exactness: value quantized to
    integer 1/scale units, gaps to whole seconds (non-negative, so
    truncating DIV ≡ floor), both summed as BIGINT; the final
    ``(num/den)/scale`` is two correctly-rounded IEEE divisions in a
    fixed order — bit-exact cross-engine. Keys with a single
    observation report null twap (zero holding time).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, *tiebreak_cols)
    cents = F.floor(F.col(val_col) * scale + F.lit(0.5)).cast("long")
    g = (
        df.select(
            key_col,
            cents.alias("_c"),
            (F.lead(ts_col).over(w) - F.col(ts_col)).alias("_dt_ns"),
        )
        .withColumn("_dt_s", F.expr("_dt_ns DIV 1000000000"))
    )
    agg = g.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_dt_s").alias("span_s"),
        F.sum(F.col("_c") * F.col("_dt_s")).alias("_num"),
    )
    return agg.select(
        key_col,
        "n",
        "span_s",
        F.when(
            F.col("span_s") > 0,
            F.col("_num").cast("double")
            / F.col("span_s").cast("double")
            / F.lit(float(scale)),
        ).alias("twap"),
    )


def exact_median_hist(
    df: DataFrame,
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    bin_width: int = 100,
) -> DataFrame:
    """EXACT per-key lower-median of integer cents via the two-pass
    histogram algorithm — the 100 TB replacement for sort-based
    ``percentile``: a per-key sort shuffles and orders every row of
    every group (the winsorize cost cliff), while this plan is two
    COMBINABLE aggregations plus a selection over one bin.

    Pass 1: ``groupBy(key, cents div bin_width)`` counts (map-side
    partial, ≤ value_range/bin_width rows per key); a key-local
    cumulative window over those few bin rows locates the bin holding
    rank ``(n+1) div 2`` (the lower median). Pass 2: only rows
    landing in each key's target bin are re-examined — a broadcast
    semi-restriction of the scan — and the within-bin rank is picked
    by one bounded sorted-list selection. Result: BIGINT cents,
    identical to ``quantile_disc(0.5)`` (lower-median discrete
    quantile), which is the whole oracle.

    ``bin_width`` trades pass-1 histogram size against pass-2 bin
    population; both stay bounded for any fixed value range, and no
    full group is ever sorted.
    """
    keys = [F.col(k) for k in key_cols]
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    base = df.select(*keys, cents.alias("_cents")).withColumn(
        "_bin", F.expr(f"_cents div {int(bin_width)}")
    )
    hist = base.groupBy(*key_cols, "_bin").agg(F.count(F.lit(1)).alias("bc"))
    wcum = Window.partitionBy(*key_cols).orderBy("_bin")
    cum = hist.withColumn("cum", F.sum("bc").over(wcum)).withColumn(
        "before", F.col("cum") - F.col("bc")
    )
    totals = base.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    ranked = cum.join(totals, list(key_cols)).withColumn(
        "target_rank", F.expr("(n + 1) div 2")
    )
    target = ranked.filter(
        (F.col("before") < F.col("target_rank"))
        & (F.col("cum") >= F.col("target_rank"))
    ).select(*key_cols, "_bin", "before", "target_rank", "n")
    in_bin = base.join(F.broadcast(target), [*key_cols, "_bin"])
    return (
        in_bin.groupBy(*key_cols, "before", "target_rank", "n")
        .agg(F.array_sort(F.collect_list("_cents")).alias("_arr"))
        .select(
            *key_cols,
            F.col("n").cast("long").alias("n"),
            F.element_at(
                "_arr", F.expr("CAST(target_rank - before AS INT)")
            ).alias("median_cents"),
        )
    )


def exact_quantiles_hist(
    df: DataFrame,
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    probs: Sequence[tuple[int, int]] = ((1, 4), (1, 2), (3, 4)),
    bin_width: int = 100,
) -> DataFrame:
    """EXACT per-key discrete quantiles at several probabilities with
    the same two-pass histogram plan as :func:`exact_median_hist` —
    one combinable (key, bin) count, then a selection restricted to
    the union of rank-holding bins. NO per-key sort at any group
    size, which makes this the exact-at-scale alternative to the
    sort-based ``percentile`` bounds in :func:`winsorize_stats`.

    ``probs`` are exact rationals ``(num, den)``; each rank is
    DuckDB's ``quantile_disc`` convention ``ceil(n·p)`` (probed
    empirically — NOT floor((n-1)p)+1, which only coincides at
    p=1/2) in pure integer arithmetic ``(n·num + den - 1) div den``,
    so every
    output is a BIGINT cent value actually present in the group and
    the oracle is one ``quantile_disc`` call per prob. Output: one
    row per key with ``n`` and a ``q{num}_{den}_cents`` column per
    prob.
    """
    keys = list(key_cols)
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    base = df.select(*[F.col(k) for k in keys], cents.alias("_cents")).withColumn(
        "_bin", F.expr(f"_cents div {int(bin_width)}")
    )
    hist = base.groupBy(*keys, "_bin").agg(F.count(F.lit(1)).alias("bc"))
    wcum = Window.partitionBy(*keys).orderBy("_bin")
    cum = hist.withColumn("cum", F.sum("bc").over(wcum)).withColumn(
        "before", F.col("cum") - F.col("bc")
    )
    totals = base.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    ranked = cum.join(totals, keys)

    targets = None
    for num, den in probs:
        t = (
            ranked.withColumn(
                "target_rank", F.expr(f"(n * {num} + {den} - 1) div {den}")
            )
            .filter(
                (F.col("before") < F.col("target_rank"))
                & (F.col("cum") >= F.col("target_rank"))
            )
            .select(
                *keys,
                "_bin",
                "before",
                "target_rank",
                "n",
                F.lit(f"q{num}_{den}").alias("_tag"),
            )
        )
        targets = t if targets is None else targets.unionByName(t)

    in_bin = base.join(F.broadcast(targets), [*keys, "_bin"])
    per_tag = (
        in_bin.groupBy(*keys, "_tag", "before", "target_rank", "n")
        .agg(F.array_sort(F.collect_list("_cents")).alias("_arr"))
        .select(
            *keys,
            "n",
            "_tag",
            F.element_at(
                "_arr", F.expr("CAST(target_rank - before AS INT)")
            ).alias("_q"),
        )
    )
    aggs = [
        F.max(F.when(F.col("_tag") == f"q{num}_{den}", F.col("_q"))).alias(
            f"q{num}_{den}_cents"
        )
        for num, den in probs
    ]
    return per_tag.groupBy(*keys, "n").agg(*aggs).withColumn(
        "n", F.col("n").cast("long")
    )


def winsorize_stats_hist(
    df: DataFrame,
    key_col: str,
    val_col: str,
    lo: tuple[int, int] = (1, 20),
    hi: tuple[int, int] = (19, 20),
    y_scale: int = 100,
    bin_width: int = 100,
) -> DataFrame:
    """Winsorization with EXACT bounds at any group size: the clip
    thresholds are the two-pass-histogram discrete quantiles
    (:func:`exact_quantiles_hist` — combinable passes, no per-key
    sort), so unlike :func:`winsorize_stats_approx` there is no rank
    error to reason about, and unlike :func:`winsorize_stats` no
    group is ever buffered or sorted. Discrete (quantile_disc)
    bounds — actual data values — rather than the exact twin's
    interpolated quantile_cont ones; both conventions are standard,
    this one is also exactly replayable, so the operator keeps a full
    bit-exact oracle at production scale.
    """
    ln, ld = lo
    hn, hd = hi
    q = exact_quantiles_hist(
        df, key_cols=(key_col,), value_col=val_col,
        probs=(lo, hi), bin_width=bin_width,
    )
    bounds = q.select(
        key_col,
        (F.col(f"q{ln}_{ld}_cents").cast("double") / 100.0).alias("lo_bound"),
        (F.col(f"q{hn}_{hd}_cents").cast("double") / 100.0).alias("hi_bound"),
    )
    return _winsorize_with_bounds(df, key_col, val_col, bounds, y_scale)


def corr_matrix(
    df: DataFrame,
    key_col: str,
    feats: dict[str, tuple[str, int]],
) -> DataFrame:
    """Per-key Pearson correlation MATRIX over k features in ONE
    combinable aggregate — the feature-redundancy screen run before
    model training. ``feats`` maps output name → (column, integer
    scale); every feature is quantized to integers first. The linear
    sums are exact BIGINTs; the k(k+1)/2 PRODUCT sums accumulate in
    DECIMAL(38,0) — Spark's exact 128-bit integer, the twin of the
    HUGEINT DuckDB already sums into — so the operator is exact at
    ANY group size with no caller-managed scale budget (r8: the same
    overflow class the sf1 decade caught in ``ols_by_key``; products
    of two quantized BIGINTs times corpus-scale row counts clear 2⁶³
    long before the data is big). Each correlation is the same fixed
    IEEE expression over identical exact integers in both engines —
    bit-exact, including the sqrt (correctly rounded per IEEE 754).

    Returns long format ``(key, feat_a, feat_b, n, corr)`` for the
    k(k-1)/2 unordered pairs; degenerate (zero-variance) pairs get
    NULL.
    """
    names = list(feats)
    q = {n: F.floor(F.col(c) * s + F.lit(0.5)).cast("long") for n, (c, s) in feats.items()}
    qd = {n: q[n].cast("decimal(19,0)") for n in names}
    aggs = [F.count(F.lit(1)).alias("n")]
    for n in names:
        aggs.append(F.sum(q[n]).alias(f"s_{n}"))
        aggs.append(F.sum(qd[n] * qd[n]).alias(f"s_{n}_{n}"))
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            aggs.append(F.sum(qd[a] * qd[b]).alias(f"s_{a}_{b}"))
    agg = df.groupBy(key_col).agg(*aggs)

    outs = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            nd = F.col("n").cast("double")
            sa = F.col(f"s_{a}").cast("double")
            sb = F.col(f"s_{b}").cast("double")
            saa = F.col(f"s_{a}_{a}").cast("double")
            sbb = F.col(f"s_{b}_{b}").cast("double")
            sab = F.col(f"s_{a}_{b}").cast("double")
            cov = nd * sab - sa * sb
            va = nd * saa - sa * sa
            vb = nd * sbb - sb * sb
            outs.append(
                agg.select(
                    key_col,
                    F.lit(a).alias("feat_a"),
                    F.lit(b).alias("feat_b"),
                    F.col("n").cast("long").alias("n"),
                    F.when((va > 0) & (vb > 0), cov / F.sqrt(va * vb)).alias(
                        "corr"
                    ),
                )
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def cusum(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    x_col: str,
    k: int,
    h: int,
    tiebreak_cols: Sequence[str] = (),
    out_col: str = "cusum",
    alarm_col: str = "alarm",
) -> DataFrame:
    """One-sided positive CUSUM change detector over an integer series.

    The textbook recurrence ``s_t = max(0, s_{t−1} + x_t − k)`` (Page
    1954) looks inherently sequential, but it has a prefix-sum closed
    form: with ``S_t = Σ_{j≤t}(x_j − k)``,

        ``s_t = S_t − min(0, min_{j≤t} S_j)``

    (the floor-at-zero only ever resets to the running-minimum prefix).
    That turns the stateful scan into TWO plain window aggregates —
    cumulative sum + cumulative min — so it runs as one shuffle per
    key inside whole-stage codegen, no recursion, no Python, and
    parallelizes per key at any scale. ``x``/``k``/``h`` are integers
    (cents), so every value is BIGINT-exact.

    ``alarm`` marks rows where ``s_t > h`` (drift above the reference
    level ``k`` has accumulated past the decision threshold).
    """
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
        ts_col, *tiebreak_cols
    )
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    out = df.withColumn("_cd", F.col(x_col).cast("long") - F.lit(int(k)))
    out = out.withColumn("_cS", F.sum("_cd").over(cum))
    s = F.col("_cS") - F.least(F.lit(0).cast("long"), F.min("_cS").over(cum))
    return (
        out.withColumn(out_col, s)
        .withColumn(alarm_col, (s > F.lit(int(h))))
        .drop("_cd", "_cS")
    )


def auc_by_key(
    df: DataFrame,
    label_col: str,
    score_col: str,
    key_cols: tuple[str, ...] = (),
    score_scale: int = 1,
) -> DataFrame:
    """EXACT ROC-AUC (≡ normalized Mann–Whitney U with midrank tie
    handling) of a score against a boolean label, per key — the
    standard ranking-quality gate for every scorer this engine
    produces (classifier scores, DSIR importance weights, quality
    signals): ``AUC = P(score_pos > score_neg) + ½·P(tie)``.

    Exactness: scores quantize once to integers
    (``floor(s·scale + 0.5)``; scale=1 leaves already-integer scores
    — micro-nat outputs — untouched), then the whole statistic is
    integer arithmetic via the doubled rank-sum
    ``2R⁺ = Σ_values cp·(2·cum_below + cp + cn + 1)`` (every tied
    observation shares the midrank, so doubling clears the ½),
    ``2U = 2R⁺ − n⁺(n⁺+1)``, and ``AUC = 2U / (2·n⁺·n⁻)`` — ONE IEEE
    division at the end. Products accumulate in DECIMAL(38,0)
    (``cp·cum`` is rows² — the ols_by_key overflow class).

    Plan: one combinable (keys, value) count carrying both label
    sides, one per-key running-sum window over the DISTINCT-value
    frame (the exact-KS shape — cost scales with distinct score
    values per key, not observations), one combinable sum. Keys with
    a single class report NULL auc (undefined).

    Output: ``(keys…, n_pos, n_neg, n_values, u2, auc)``.
    """
    from pyspark.sql.window import Window

    keys = list(key_cols)
    lab = F.col(label_col).cast("boolean")
    s = F.floor(
        F.col(score_col).cast("double") * F.lit(float(score_scale)) + F.lit(0.5)
    ).cast("long")
    counts = df.groupBy(*keys, s.alias("_s")).agg(
        F.sum(lab.cast("long")).alias("cp"),
        F.sum((~lab).cast("long")).alias("cn"),
    )
    w = (
        Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    ).orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    cum = counts.withColumn(
        "_cb", F.coalesce(F.sum(F.col("cp") + F.col("cn")).over(w), F.lit(0))
    )
    cpd = F.col("cp").cast("decimal(19,0)")
    r2_term = cpd * (
        F.lit(2).cast("decimal(19,0)") * F.col("_cb").cast("decimal(19,0)")
        + F.col("cp").cast("decimal(19,0)")
        + F.col("cn").cast("decimal(19,0)")
        + F.lit(1).cast("decimal(19,0)")
    )
    agg = cum.groupBy(*keys).agg(
        F.sum("cp").alias("n_pos"),
        F.sum("cn").alias("n_neg"),
        F.count(F.lit(1)).alias("n_values"),
        F.sum(r2_term).alias("_r2"),
    )
    npd = F.col("n_pos").cast("decimal(19,0)")
    nnd = F.col("n_neg").cast("decimal(19,0)")
    u2 = F.col("_r2") - npd * (npd + F.lit(1).cast("decimal(19,0)"))
    return agg.select(
        *keys,
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.col("n_values").cast("long").alias("n_values"),
        u2.cast("double").alias("u2"),
        F.when(
            (F.col("n_pos") == 0) | (F.col("n_neg") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            u2.cast("double")
            / (F.lit(2).cast("decimal(19,0)") * npd * nnd).cast("double")
        )
        .alias("auc"),
    )


def calibration_by_key(
    df: DataFrame,
    label_col: str,
    score_col: str,
    key_cols: tuple[str, ...] = (),
    n_bins: int = 10,
    score_scale: int = 1,
) -> DataFrame:
    """Reliability diagram (calibration curve) of a score against a
    boolean label, per key — the companion gate to :func:`auc_by_key`:
    AUC says the scorer RANKS well; calibration says whether the
    score's LEVEL tracks the positive rate (a quality filter tuned by
    threshold needs the second, not just the first).

    Scores quantize once to integers (``floor(s·scale + 0.5)``), bin
    into ``n_bins`` equi-width buckets over the per-key [min, max]
    (the histogram_drift idiom: integer bucket index via truncating
    DIV over exact cents-like units, bounds from a 1-row-per-key
    broadcast), and each bucket reports exact integer counts plus the
    positive rate in ppm — the whole row is integers, nothing to
    round.

    Plan: one combinable bounds pass, one combinable (key, bin)
    count. Output: ``(keys…, bin, score_lo, score_hi, n, n_pos,
    pos_rate_ppm)``; empty buckets are omitted (a dense frame is one
    join away if a plot needs it).
    """
    keys = list(key_cols)
    lab = F.col(label_col).cast("boolean")
    s = F.floor(
        F.col(score_col).cast("double") * F.lit(float(score_scale)) + F.lit(0.5)
    ).cast("long")
    base = df.select(*keys, s.alias("_s"), lab.alias("_l"))
    bounds = base.groupBy(*keys) if keys else base.groupBy()
    bounds = bounds.agg(F.min("_s").alias("_mn"), F.max("_s").alias("_mx"))
    joined = (
        base.join(F.broadcast(bounds), keys)
        if keys
        else base.crossJoin(F.broadcast(bounds))
    )
    binned = joined.withColumn(
        "bin",
        F.expr(f"(_s - _mn) * {int(n_bins)} div (_mx - _mn + 1)").cast("long"),
    )
    return (
        binned.groupBy(*keys, "bin", "_mn", "_mx")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_l").cast("long")).alias("n_pos"),
        )
        .select(
            *keys,
            "bin",
            # integer DIV end to end — a float divide then cast would
            # truncate differently across engines on negative bounds
            F.expr(f"_mn + (bin * (_mx - _mn + 1)) div {int(n_bins)}")
            .cast("long")
            .alias("score_lo"),
            F.expr(f"_mn + ((bin + 1) * (_mx - _mn + 1)) div {int(n_bins)}")
            .cast("long")
            .alias("score_hi"),
            F.col("n").cast("long").alias("n"),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.expr("n_pos * 1000000 div n").cast("long").alias("pos_rate_ppm"),
        )
    )


def welch_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    key_cols: tuple[str, ...] = (),
    value_col: str = "value",
) -> DataFrame:
    """Per-key Welch two-sample t statistic between two snapshots —
    the PARAMETRIC leg of the drift family (TVD/KL/KS are
    distribution-shape monitors; Welch answers the narrower, more
    sensitive question "did the MEAN move relative to the noise",
    without assuming equal variances).

    Exactness: both samples reduce to exact BIGINT Σc / Σc² over
    integer cents (DECIMAL(38,0) squares — the ols_by_key class);
    means, sample variances (n−1), the pooled standard error and
    ``t = (m_a − m_b)/se`` are one FIXED sequence of IEEE divisions,
    subtractions and a correctly-rounded sqrt — engine-exact, then
    6dp-quantized for the report. Welch–Satterthwaite dof rides
    along (same fixed-sequence discipline). Degenerate keys (either
    side n < 2 or zero pooled variance) report NULL t.

    Plan: ONE combinable aggregate over the union (map-side partial
    sums carry both sides), nothing key-ordered, no windows — the
    cheapest drift monitor of the four.
    """
    keys = list(key_cols)
    a = df_a.select(*keys, F.col(value_col).alias("_v")).withColumn(
        "_side", F.lit("a")
    )
    b = df_b.select(*keys, F.col(value_col).alias("_v")).withColumn(
        "_side", F.lit("b")
    )
    u = a.unionByName(b).withColumn(
        "_c", F.floor(F.col("_v") * 100 + F.lit(0.5)).cast("long")
    )
    cd = F.col("_c").cast("decimal(19,0)")
    is_a = (F.col("_side") == "a").cast("long")
    is_b = (F.col("_side") == "b").cast("long")
    agg = u.groupBy(*keys).agg(
        F.sum(is_a).alias("n_a"),
        F.sum(is_b).alias("n_b"),
        F.sum(F.col("_c") * is_a).alias("sa"),
        F.sum(F.col("_c") * is_b).alias("sb"),
        F.sum(cd * cd * is_a.cast("decimal(19,0)")).alias("ssa"),
        F.sum(cd * cd * is_b.cast("decimal(19,0)")).alias("ssb"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ma = F.col("sa").cast("double") / na
    mb = F.col("sb").cast("double") / nb
    # sample variance via the exact-integer numerator n·Σc² − (Σc)²
    va = (
        na * F.col("ssa").cast("double")
        - F.col("sa").cast("double") * F.col("sa").cast("double")
    ) / (na * (na - F.lit(1.0)))
    vb = (
        nb * F.col("ssb").cast("double")
        - F.col("sb").cast("double") * F.col("sb").cast("double")
    ) / (nb * (nb - F.lit(1.0)))
    se2 = va / na + vb / nb
    t = (ma - mb) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (va / na) * (va / na) / (na - F.lit(1.0))
        + (vb / nb) * (vb / nb) / (nb - F.lit(1.0))
    )
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0)
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return agg.select(
        *keys,
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        r6(ma - mb).alias("mean_shift_cents"),
        F.when(ok, r6(t)).alias("t_stat"),
        F.when(ok, r6(dof)).alias("dof"),
    )


def mutual_info(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Mutual information between two categorical columns in NATS —
    the feature-selection / redundancy gate (is ``y`` worth keeping
    next to ``x``; does a pipeline stage leak a label into a
    feature): ``I(X;Y) = Σ_xy (c_xy/N)·ln(c_xy·N/(c_x·c_y))``.

    Float discipline (the kl_drift convention): the log terms fold
    over a (x, y)-SORTED array with a 0.0 seed — the
    ``aggregate``/``list_reduce`` sequence both engines replay
    identically — with every count an exact integer. The cell frame
    is bounded by |X|·|Y| (category product), so the packed array is
    a bounded row, not corpus-sized.

    Output: one row — ``(n, n_x, n_y, n_cells, mi_nats)``; also
    useful normalized downstream (mi / ln(min(|X|,|Y|))).

    Plan: one combinable (x, y) count, two tiny marginal re-aggs on
    the CELL frame (not the corpus), one bounded collect_list fold.
    """
    cells = (
        df.select(
            F.col(x_col).cast("string").alias("_x"),
            F.col(y_col).cast("string").alias("_y"),
        )
        .groupBy("_x", "_y")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    mx = cells.groupBy("_x").agg(F.sum("c").alias("cx"))
    my = cells.groupBy("_y").agg(F.sum("c").alias("cy"))
    joined = cells.join(F.broadcast(mx), "_x").join(F.broadcast(my), "_y")
    packed = joined.agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
        F.countDistinct("_x").alias("n_x"),
        F.countDistinct("_y").alias("n_y"),
        F.array_sort(
            F.collect_list(F.struct("_x", "_y", "c", "cx", "cy"))
        ).alias("_arr"),
    )
    nd = F.col("n").cast("double")
    mi = F.aggregate(
        F.col("_arr"),
        F.lit(0.0),
        lambda acc, s: acc
        + (s.getField("c").cast("double") / nd)
        * F.log(
            s.getField("c").cast("double")
            * nd
            / (
                s.getField("cx").cast("double")
                * s.getField("cy").cast("double")
            )
        ),
    )
    return packed.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_x").cast("long").alias("n_x"),
        F.col("n_y").cast("long").alias("n_y"),
        F.col("n_cells").cast("long").alias("n_cells"),
        F.floor(mi * F.lit(1e6) + F.lit(0.5)).cast("long").alias("mi_unats"),
    )


def equidepth_bins(
    df: DataFrame,
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    n_bins: int = 8,
    bin_width: int = 100,
) -> DataFrame:
    """Equi-depth (quantile) binning WITHOUT a per-key sort — the
    scale-correct alternative to ``NTILE`` that the ``ntile_buckets``
    query's docstring promises: cut points are the exact discrete
    quantiles at ``i/n_bins`` from the two-pass histogram
    (:func:`exact_quantiles_hist` — combinable, selection restricted
    to rank-holding bins), broadcast back as a keys-bounded frame,
    and each row's bin is the count of cuts strictly below its value
    — a pure scan expression.

    Semantics note (deliberate): the bin is a FUNCTION OF THE VALUE —
    tied values always share a bin, so depths equalize only up to
    tie mass (NTILE splits ties across buckets by row order, which
    is exactly what cannot be reproduced without a global sort, and
    is row-order-dependent anyway). The GBDT-style feature-binning
    prep wants the value-deterministic form.

    Output: ``(keys…, bin, n, min_cents, max_cents, sum_cents)`` —
    all exact integers. Dyadic ``n_bins`` (4/8/16) keeps the oracle's
    float quantile probabilities exactly representable.
    """
    keys = list(key_cols)
    probs = [(i, n_bins) for i in range(1, n_bins)]
    cuts = exact_quantiles_hist(df, keys, value_col, probs, bin_width)
    cut_arr = F.array(
        *[F.col(f"q{i}_{n_bins}_cents") for i in range(1, n_bins)]
    )
    cframe = cuts.select(*keys, cut_arr.alias("_cuts"))
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    base = df.select(*keys, cents.alias("_cents"))
    joined = base.join(F.broadcast(cframe), keys)
    b = F.size(F.filter(F.col("_cuts"), lambda c: F.col("_cents") > c))
    return (
        joined.withColumn("bin", b.cast("long"))
        .groupBy(*keys, "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_cents").alias("min_cents"),
            F.max("_cents").alias("max_cents"),
            F.sum("_cents").alias("sum_cents"),
        )
    )


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: int = 20,
    y_scale: int = 100,
) -> DataFrame:
    """Leakage-safe LEAVE-ONE-OUT target encoding of a categorical
    column — the classic high-cardinality feature-prep op done the
    only way that doesn't leak the row's own label into its feature:
    each row's encoding is ``(Σy_cat − y_row + m·ȳ) / (n_cat − 1 + m)``
    (category sum EXCLUDING the row, shrunk toward the global mean by
    ``smoothing = m`` pseudo-observations). Naive per-category means
    leak; LOO + smoothing is the production form.

    Exactness: targets quantize to integer ``1/y_scale`` units; the
    per-category Σ and n and the global Σ are exact BIGINTs; each
    row's encoding is ONE fixed IEEE expression over those integers
    (two multiplies, two adds, one division) — engine-exact, then
    6dp-quantized for the report. Singleton categories (n = 1) fall
    back to the smoothed prior alone (their LOO set is empty).

    Plan: one combinable category aggregate + a 1-row global
    aggregate, both broadcast back onto the SCAN — the base table is
    never shuffled; the encoding is a scan expression. Output: the
    input rows' keys + ``(n_cat, te)``.
    """
    y = F.floor(F.col(target_col) * y_scale + F.lit(0.5)).cast("long")
    base = df.withColumn("_y", y)
    per_cat = base.groupBy(cat_col).agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_y").alias("_s")
    )
    glob = base.agg(
        F.count(F.lit(1)).alias("_gn"), F.sum("_y").alias("_gs")
    )
    j = base.join(F.broadcast(per_cat), cat_col).crossJoin(F.broadcast(glob))
    m = F.lit(float(smoothing))
    gmean = F.col("_gs").cast("double") / F.col("_gn").cast("double")
    num = (F.col("_s") - F.col("_y")).cast("double") + m * gmean
    den = (F.col("_n") - F.lit(1)).cast("double") + m
    te = F.floor(num / den * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return j.select(
        *df.columns,
        F.col("_n").cast("long").alias("n_cat"),
        te.alias("te"),
    )
