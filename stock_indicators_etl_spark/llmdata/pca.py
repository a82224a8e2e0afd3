"""Distributed PCA (top principal direction) via power iteration.

North-star LLM-data surface (reference N/A — the reference computes
per-ticker indicators in pandas, no linear algebra): the leading
principal direction of an embedding corpus is the workhorse of
embedding diagnostics (anisotropy measurement, "all-but-the-top"
post-processing, drift detection between corpus snapshots) and must
run as a SCAN, not a collect — the matrix never fits anywhere.

Spark-first shape (r12: ONE distributed pass, not one per round —
guide §1.2 step 1): every power-iteration quantity is a linear
function of the Gram matrix ``G = XᵀX`` of the int8 codes, and every
distributed sum is EXACT integer arithmetic, so

- ``G`` is computed in a single scan: double ``posexplode`` to
  (j, k, x·y) and ONE combinable groupBy(j, k) sum — dim² = 4096
  result rows, a bounded collect (same class as centroids and BPE
  argmaxes);
- every round's ``w = G·v`` is then a driver-side exact-bigint
  matvec, BIT-IDENTICAL to a distributed ``Σ_i x_i·⟨x_i, v⟩`` round
  (integer addition is associative; the float normalization between
  rounds was always driver-side and is unchanged);
- cost trade: dim²·N multiplies in one pass vs iters·2·dim·N over
  ``iters`` passes — ~8× the arithmetic for 1/``iters`` the scans
  and job launches, the right trade locally (job launch dominates)
  and at 100 TB (scans dominate; tall-skinny Gram is the textbook
  shape).

Bit-exactness discipline (the repo's integer-sums rule): vectors are
int8-quantized by the ``sq_topk`` convention (⌊x/‖x‖·127+0.5⌋) and v
is carried as ×2^20 scaled integers, so every distributed sum is an
exact BIGINT — order-free, identical in DuckDB. The only floats are
the driver-side normalization (one correctly-rounded int→double
conversion, one sqrt, one divide — mirrored operation-for-operation
in the SQL oracle) and the final 6dp-rounded loadings. The result is
the top singular direction of the QUANTIZED, UNCENTERED matrix —
the documented contract (centering would break integer exactness;
callers who need centered PCA subtract the mean column first and
re-quantize).

Magnitude bounds: |code| ≤ 127, |v| ≤ 2^20 ⇒ |s| ≤ 127·2^20·dim
(≈2^33 at dim 64) — the per-row fold stays in BIGINT. The cross-row
sums |w_j| ≤ 127·|s|·N are NOT long-safe (overflow at N ≈ 2^23 rows,
far below corpus scale), so they accumulate in DECIMAL(38,0) —
Spark's exact 128-bit integer, the same fix class as ``ols_by_key``
/ ``corr_matrix`` — which holds them to N ≈ 2^87 rows. DuckDB
already sums BIGINT into HUGEINT, so the oracle was always exact;
this makes the Spark side match instead of silently wrapping
(non-ANSI mode) into a plausible-but-wrong direction.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _int_codes(emb: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """int8 quantization, identical to the ``sq_topk`` convention
    (and its SQL twin): ⌊x/‖x‖·127+0.5⌋, zero vector → all-zero."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, b: a + b
        )
    )
    code = F.when(nrm == 0, F.transform(v, lambda x: F.lit(0).cast("long"))).otherwise(
        F.transform(v, lambda x: F.floor(x / nrm * 127.0 + F.lit(0.5)).cast("long"))
    )
    return emb.select(F.col(id_col).alias("id"), code.alias("cv"))


def pca_power(
    emb: DataFrame,
    dim: int = 64,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    v_scale: int = 1 << 20,
) -> DataFrame:
    """Top principal direction of the quantized embedding matrix.

    Returns ``(j, loading, eigenvalue)`` — dim rows, the unit-norm
    loading per dimension (6dp) and the Rayleigh-quotient eigenvalue
    estimate of XᵀX from the final round (same value on every row; it
    is a scalar). Deterministic: the start vector is all-ones, every
    distributed sum is integer-exact, and the driver-side float ops
    are mirrored one-for-one by the SQL oracle.
    """
    loadings, lam = _power_direction(
        emb, dim=dim, iters=iters, vec_col=vec_col, id_col=id_col,
        v_scale=v_scale,
    )
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(j, loadings[j], lam) for j in range(dim)],
        "j int, loading double, eigenvalue double",
    )


def _power_direction(
    emb: DataFrame,
    dim: int,
    iters: int,
    vec_col: str,
    id_col: str,
    v_scale: int,
) -> tuple[list[float], float]:
    """The driver-side iteration shared by :func:`pca_power` and
    :func:`all_but_the_top`: (6dp loadings, 6dp Rayleigh eigenvalue)."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    codes = _int_codes(emb, vec_col, id_col)
    # ONE distributed pass instead of one per iteration (r12, guide
    # §1.2 step 1 — remove passes): every per-round quantity is a
    # linear function of the Gram matrix G = XᵀX of the int8 codes,
    # and every distributed sum here is EXACT integer arithmetic, so
    # w(round r) = G·v(r) computed driver-side on Python bigints is
    # BIT-IDENTICAL to the old per-round scan (integer + is
    # associative; the float normalization between rounds was always
    # driver-side and is unchanged — oracle stays hash-green). Cost
    # trade: dim²·N multiplies in one scan vs iters·2·dim·N over
    # iters scans — at dim 64 / iters 4 that is ~8× the arithmetic
    # for 1/4 the passes and 1/4 the job launches, the right trade
    # both locally (job launch dominates) and at 100 TB (scans
    # dominate; the tall-skinny Gram pass is the textbook shape).
    # G rows are (j, Σ_i cv_i[j]·cv_i[k]): the explode is dim×N rows;
    # per-row products stay in BIGINT (|cv|≤127 ⇒ |cv_j·cv_k| ≤
    # 16129); cross-row sums accumulate in DECIMAL(38,0) (long sums
    # would wrap beyond ~5·10¹⁴ rows). r13 (guide §1.2 step 2): G is
    # EXACTLY symmetric in integers, so only the upper triangle
    # k ≥ j is computed — the inner explode runs over slice(cv, j+1)
    # instead of the full vector, halving the expanded row count and
    # the aggregate work (dim²·N/2 products) — and the driver mirrors
    # G[k][j] = G[j][k]. Bit-identical: each (j, k ≥ j) sum is the
    # same integer sum as before, and the mirror copies exact ints.
    g_rows = (
        codes.select(F.posexplode("cv").alias("j", "x"), "cv")
        .select(
            "j",
            "x",
            F.posexplode(
                F.slice(F.col("cv"), F.col("j") + F.lit(1), F.lit(dim))
            ).alias("k0", "y"),
        )
        .groupBy("j", "k0")
        .agg(F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("g"))
        .collect()
    )
    G: list[list[int]] = [[0] * dim for _ in range(dim)]
    for r in g_rows:
        j = int(r["j"])
        k = j + int(r["k0"])
        g = int(r["g"])
        G[j][k] = g
        G[k][j] = g
    v = [int(v_scale)] * dim
    w: list[int] = []
    for _ in range(iters):
        # exact bigint matvec — identical integers to the old
        # distributed Σ_i cv_i[j]·⟨cv_i, v⟩ round
        w = [sum(G[j][k] * v[k] for k in range(dim)) for j in range(dim)]
        # driver-side normalization — every op mirrored in the
        # oracle: one exact-int→double conversion, sqrt, divide
        ss = float(sum(x * x for x in w))
        nrm = math.sqrt(ss)
        if nrm == 0:
            raise ValueError("pca_power: zero matrix")
        v_next = [
            int(math.floor(float(x) / nrm * float(v_scale) + 0.5)) for x in w
        ]
        dot = sum(a * b for a, b in zip(v, w))
        vv = sum(a * a for a in v)
        v = v_next
    lam = (
        math.floor(float(dot) / float(vv) * 1_000_000 + 0.5) / 1_000_000
    )
    loadings = [
        math.floor(float(x) / nrm * 1_000_000 + 0.5) / 1_000_000 for x in w
    ]
    return loadings, lam


def all_but_the_top(
    emb: DataFrame,
    dim: int = 64,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    v_scale: int = 1 << 20,
) -> DataFrame:
    """All-but-the-top anisotropy correction (Mu & Viswanath, ICLR'18
    — remove the dominant common direction from every embedding):
    per-vector projection onto the power-iteration top component and
    the norm before/after removing it. The expensive part (the power
    iteration) is the EAGER construction; the correction itself is a
    PURE SCAN — the direction is a 64-double literal array, the
    projection and residual norms are per-row left folds inside
    codegen, no join, no shuffle. That scan shape is the point: the
    corrected corpus is written shard-parallel at any size.

    Determinism: codes are exact ints, the direction is the 6dp-
    rounded loading vector (identical doubles in both engines), and
    the per-row folds run in fixed dimension order — so the floats
    match the SQL oracle bit-for-bit before the final 6dp rounding.
    """
    loadings, _ = _power_direction(
        emb, dim=dim, iters=iters, vec_col=vec_col, id_col=id_col,
        v_scale=v_scale,
    )
    codes = _int_codes(emb, vec_col, id_col)
    v_lit = F.array(*[F.lit(float(x)) for x in loadings])
    dbl = F.transform(F.col("cv"), lambda c: c.cast("double"))
    proj = F.aggregate(
        F.zip_with(dbl, v_lit, lambda c, vv: c * vv),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    norm2_before = F.aggregate(
        F.transform(dbl, lambda c: c * c), F.lit(0.0), lambda a, b: a + b
    )
    out = codes.select("id", proj.alias("_p"), norm2_before.alias("_nb"), "cv")
    resid = F.aggregate(
        F.zip_with(
            F.transform(F.col("cv"), lambda c: c.cast("double")),
            v_lit,
            lambda c, vv: (c - F.col("_p") * vv) * (c - F.col("_p") * vv),
        ),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    p6 = F.floor(F.col("_p") * 1_000_000 + F.lit(0.5)) / F.lit(1_000_000.0)
    nb6 = F.floor(F.sqrt(F.col("_nb")) * 1_000_000 + F.lit(0.5)) / F.lit(
        1_000_000.0
    )
    na6 = F.floor(F.sqrt(resid) * 1_000_000 + F.lit(0.5)) / F.lit(1_000_000.0)
    return out.select(
        F.col("id").alias("vec_id"),
        p6.alias("proj"),
        nb6.alias("norm_before"),
        na6.alias("norm_after"),
    )


def sql_abtt_oracle(
    dim: int = 64, iters: int = 4, v_scale: int = 1 << 20, emb_table: str = "embeddings"
) -> str:
    """DuckDB twin of :func:`all_but_the_top`: replays the power
    iteration CTEs, materializes the 6dp loading list, and applies the
    same fixed-order per-vector folds."""
    base = sql_pca_oracle(dim=dim, iters=iters, v_scale=v_scale, emb_table=emb_table)
    # reuse the pca oracle's CTE chain: swap its final SELECT for the
    # projection query (the chain ends right before the last SELECT)
    head, _sep, _tail = base.rpartition("\nSELECT CAST(w.j - 1 AS INTEGER)")
    last = iters - 1
    return (
        head
        + f""",
vload AS (
  SELECT list(floor(CAST(w.w AS DOUBLE) / nn.nrm * 1000000 + 0.5) / 1000000
              ORDER BY w.j) AS vl
  FROM w{last} w CROSS JOIN nn{last} nn
),
pr AS (
  SELECT vec_id, cv, vl,
         list_reduce(list_prepend(0.0,
             list_transform(generate_series(1, {dim}),
                            j -> CAST(cv[j] AS DOUBLE) * vl[j])),
             (a, b) -> a + b) AS p,
         list_reduce(list_prepend(0.0,
             list_transform(generate_series(1, {dim}),
                            j -> CAST(cv[j] AS DOUBLE) * CAST(cv[j] AS DOUBLE))),
             (a, b) -> a + b) AS nb
  FROM cc CROSS JOIN vload
)
SELECT vec_id,
       floor(p * 1000000 + 0.5) / 1000000.0 AS proj,
       floor(sqrt(nb) * 1000000 + 0.5) / 1000000.0 AS norm_before,
       floor(sqrt(list_reduce(list_prepend(0.0,
             list_transform(generate_series(1, {dim}),
                            j -> (CAST(cv[j] AS DOUBLE) - p * vl[j])
                               * (CAST(cv[j] AS DOUBLE) - p * vl[j]))),
             (a, b) -> a + b)) * 1000000 + 0.5) / 1000000.0 AS norm_after
FROM pr
"""
    )


def sql_pca_oracle(
    dim: int = 64, iters: int = 4, v_scale: int = 1 << 20, emb_table: str = "embeddings"
) -> str:
    """DuckDB replay of :func:`pca_power`: the rounds unroll as CTEs
    (the k-means/BPE oracle strategy); all interior sums are
    HUGEINT-exact, the normalizations use the same
    int→double / sqrt / divide operation order as the driver."""
    p = float(v_scale)
    ctes = [
        f"e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {emb_table})",
        f"""
n AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_prepend(0.0,
             list_transform(generate_series(1, {dim}), i -> v[i] * v[i])),
             (a, b) -> a + b)) AS nrm
  FROM e
)""",
        f"""
cc AS (
  SELECT vec_id,
         list_transform(generate_series(1, {dim}), j ->
           CASE WHEN nrm = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(floor(v[j] / nrm * 127.0 + 0.5) AS BIGINT)
           END) AS cv
  FROM n
)""",
        f"""
v0 AS (
  SELECT j, CAST({int(v_scale)} AS HUGEINT) AS vj
  FROM (SELECT unnest(generate_series(1, {dim})) AS j)
)""",
    ]
    for i in range(iters):
        ctes.append(f"""
vl{i} AS (SELECT list(vj ORDER BY j) AS vl FROM v{i})""")
        ctes.append(f"""
s{i} AS (
  SELECT vec_id, cv,
         CAST(list_sum(list_transform(generate_series(1, {dim}),
              j -> cv[j] * vl[j])) AS HUGEINT) AS s
  FROM cc CROSS JOIN vl{i}
)""")
        ctes.append(f"""
w{i} AS (
  SELECT j, CAST(sum(cv[j] * s) AS HUGEINT) AS w
  FROM s{i} CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS j) t
  GROUP BY j
)""")
        ctes.append(f"""
nn{i} AS (SELECT sqrt(CAST(sum(w * w) AS DOUBLE)) AS nrm FROM w{i})""")
        ctes.append(f"""
r{i} AS (
  SELECT CAST(sum(v.vj * w.w) AS HUGEINT) AS dot,
         (SELECT CAST(sum(vj * vj) AS HUGEINT) FROM v{i}) AS vv
  FROM v{i} v JOIN w{i} w ON v.j = w.j
)""")
        ctes.append(f"""
v{i + 1} AS (
  SELECT j, CAST(floor(CAST(w AS DOUBLE) / nrm * {p!r} + 0.5) AS HUGEINT) AS vj
  FROM w{i} CROSS JOIN nn{i}
)""")
    last = iters - 1
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
SELECT CAST(w.j - 1 AS INTEGER) AS j,
       floor(CAST(w.w AS DOUBLE) / nn.nrm * 1000000 + 0.5) / 1000000 AS loading,
       floor(CAST(r.dot AS DOUBLE) / CAST(r.vv AS DOUBLE) * 1000000 + 0.5)
         / 1000000 AS eigenvalue
FROM w{last} w CROSS JOIN nn{last} nn CROSS JOIN r{last} r
"""
    )
