"""Sketch-backed corpus statistics (north-star surface; reference N/A).

:func:`heavy_hitters` — frequent-token discovery over a token stream
whose vocabulary is too large to shuffle wholesale. Two passes:

1. **Misra–Gries summaries per partition** (``mapInPandas``, capacity
   ``cap`` counters): each task reduces its token stream to ≤ cap
   (token, weight) rows. Per-batch counting is vectorized
   (``pandas.value_counts``); summaries merge by add-then-subtract-
   (cap+1)-th-largest — the mergeable-summaries formulation (Agarwal
   et al., PODS'12), which keeps the deterministic guarantee: any
   token with partition frequency > n_p/(cap+1) survives the
   partition's summary.
2. **Exact recount of the candidate union**: by pigeonhole, a token
   with global frequency > N/(cap+1) exceeds n_p/(cap+1) in at least
   one partition, so the union of summaries contains every global
   heavy hitter. A broadcast semi-join restricts the token stream to
   those candidates and an exact count + integer threshold filter
   produces EXACTLY the brute-force answer — which is why this
   operator has a plain GROUP BY DuckDB oracle despite being
   sketch-based.

Choosing ``cap ≥ phi_den/phi_num`` makes threshold
``ceil(phi·N) > N/(cap+1)``, so the guarantee covers every output
row (the default doubles it for margin).

:func:`kmv_distinct` — per-group distinct-token estimation via the
K-minimum-values sketch (Bar-Yossef et al., RANDOM'02). KMV is a
*mergeable* summary with an exactness property the oracle harness can
exploit: the k smallest of a union of per-partition k-minima are
EXACTLY the k smallest distinct hashes of the whole stream (any
global k-minimum is a partition k-minimum in the partition that holds
it), so the distributed bounded-state plan and a single-node replay
over all distinct hashes produce bit-identical (n_kept, kth, estimate)
rows. The estimator ``(k-1)·2^56 / kth`` is one IEEE division of two
exact integers; below k distinct values the sketch IS the distinct
set and the exact count is returned.

:func:`hll_distinct` — per-group HyperLogLog registers (Flajolet et
al., AofA'07), entirely JVM-side: ``h56`` splits into a ``p``-bit
register index and a ``(56-p)``-bit suffix whose leading-zero rank is
``rho = 57 - p - bitlen(suffix)`` (``length(bin(x))`` — identical in
Spark and DuckDB). The harmonic-mean denominator is kept as an exact
integer ``sum(2^(R-rho))`` (R = max rho) so the raw estimate is again
a single IEEE division by one precomputed literal. The small/large-
range bias corrections of the paper need ``ln`` (libm-dependent, not
bit-portable) and are deliberately NOT applied — the operator returns
the raw estimator plus the zero-register count so a caller can apply
any correction; the oracle checks the raw form.

100 TB shape: the full-width shuffle of a naive
``groupBy(token).count()`` carries the entire vocabulary (billions of
distinct n-grams); here the only full-stream work is scan-local, the
first shuffle carries ≤ cap·partitions rows, and the recount shuffle
carries only candidate tokens. Threshold arithmetic is pure integer
(``ceil(a/b) = (a+b-1) div b``) so Spark and DuckDB agree bit-exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .hashing import HASH_DOMAIN, h56
from .text import spread, words

_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("token", T.StringType()),
        T.StructField("wt", T.LongType()),
    ]
)


def _mg_summaries(cap: int):
    """mapInPandas kernel: one Misra–Gries summary per partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict[str, int] = {}
        for b in batches:
            for tok, cnt in b["token"].value_counts().items():
                summary[tok] = summary.get(tok, 0) + int(cnt)
            if len(summary) > cap:
                # subtract the (cap+1)-th largest weight, drop ≤ 0
                thresh = sorted(summary.values(), reverse=True)[cap]
                summary = {t: c - thresh for t, c in summary.items() if c > thresh}
        if summary:
            yield pd.DataFrame(
                {"token": list(summary.keys()), "wt": list(summary.values())}
            )

    return run


def token_stream(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scan-local whitespace-token explosion (same normalization as
    every text operator — ``text.words``)."""
    return spread(df).select(F.explode(words(F.col(text_col))).alias("token"))


def heavy_hitters(
    df: DataFrame,
    phi: tuple[int, int] = (1, 500),
    capacity: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """All tokens with corpus frequency ≥ ceil(phi·N), with EXACT
    counts, where N is the total token count and ``phi`` is an exact
    fraction ``(num, den)`` (kept rational so the threshold is integer
    arithmetic on both engines).

    Returns ``(token, cnt)``. Output equals the brute-force
    ``groupBy(token)`` answer whenever ``capacity ≥ den/num`` (the
    default ``2·den/num`` doubles the guarantee margin).
    """
    num, den = phi
    if num <= 0 or den <= 0:
        raise ValueError("phi must be a positive fraction (num, den)")
    cap = capacity if capacity is not None else max(2 * den // num, 16)

    toks = token_stream(df, text_col)
    candidates = (
        toks.mapInPandas(_mg_summaries(cap), schema=_SUMMARY_SCHEMA)
        .select("token")
        .distinct()
    )
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    counted = (
        toks.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .where(
            F.col("cnt")
            >= F.expr(f"(n_total * {num} + {den} - 1) div {den}")
        )
        .select("token", "cnt")
    )


# ---------------------------------------------------------------------------
# K-minimum-values distinct sketch
# ---------------------------------------------------------------------------


def _kmv_summary_schema(group_col: str, group_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField(group_col, group_type),
            T.StructField("h", T.LongType()),
        ]
    )


def _kmv_summaries(group_col: str, k: int):
    """mapInPandas kernel: per partition, the k smallest DISTINCT
    56-bit hashes per group — one bounded KMV summary each.

    State is ``groups_in_partition × k`` int64s; each Arrow batch
    merges via ``np.unique`` (sorted) + head-k, so no value is ever
    compared more than O(log) times per batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[object, np.ndarray] = {}
        for b in batches:
            for g, sub in b.groupby(group_col, sort=False, dropna=False):
                hs = np.unique(sub["h"].to_numpy(dtype=np.int64))
                prev = state.get(g)
                if prev is not None:
                    hs = np.union1d(prev, hs)
                state[g] = hs[:k]
        for g, hs in state.items():
            yield pd.DataFrame({group_col: [g] * len(hs), "h": hs})

    return run


def _group_grams(
    df: DataFrame, group_col: str, text_col: str, ngram: int
) -> DataFrame:
    """(group, gram) stream: whitespace tokens at ``ngram=1``, else
    word n-grams under the ``dedup.word_shingles`` convention (a doc
    shorter than n words contributes its whole text as one gram;
    empty texts contribute nothing). Scan-local."""
    if ngram == 1:
        return spread(df).select(
            F.col(group_col), F.explode(words(F.col(text_col))).alias("gram")
        )
    pre = spread(df).select(group_col, words(F.col(text_col)).alias("_w"))
    w = F.col("_w")
    n = F.size(w)
    grams = F.when(n < ngram, F.array(F.concat_ws(" ", w))).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - F.lit(ngram)),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, ngram)),
        )
    )
    return pre.select(group_col, F.explode(grams).alias("gram")).filter(
        F.length("gram") > 0
    )


def kmv_sketches(
    df: DataFrame,
    k: int = 64,
    group_col: str = "lang",
    text_col: str = "text",
    ngram: int = 1,
) -> DataFrame:
    """Per-group KMV sketch as ``(group_col, mins)`` — the k smallest
    DISTINCT 56-bit gram hashes per group, ascending. The shared
    sketch-build stage of :func:`kmv_distinct` and
    :func:`kmv_pairwise_overlap`: scan-local hashing, bounded
    per-partition summaries, ≤ k·P-row final merge."""
    toks = _group_grams(df, group_col, text_col, ngram)
    hashed = toks.select(group_col, h56(F.col("gram")).alias("h"))
    group_type = df.schema[group_col].dataType
    summaries = hashed.mapInPandas(
        _kmv_summaries(group_col, k), schema=_kmv_summary_schema(group_col, group_type)
    )
    return summaries.groupBy(group_col).agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("mins")
    )


def kmv_distinct(
    df: DataFrame,
    k: int = 64,
    group_col: str = "lang",
    text_col: str = "text",
    ngram: int = 1,
) -> DataFrame:
    """Per-group distinct-token estimate from a K-minimum-values
    sketch. Returns ``(group_col, n_kept, kth_hash, est_distinct)``:

    - ``n_kept`` — min(k, #distinct hashes) actually held;
    - ``kth_hash`` — the k-th smallest distinct hash (NULL below k);
    - ``est_distinct`` — ``(k-1)·2^56 / kth_hash`` at ≥ k distinct
      values, else the EXACT distinct count (the sketch holds the
      whole distinct set below k).

    100 TB shape: tokenization and hashing are scan-local; the only
    shuffle carries ≤ k rows per (group, partition) — the per-
    partition KMV summaries — and the final per-group merge touches
    ≤ k·P candidate rows. Nothing ever materializes the distinct-token
    set. Mergeability makes the result EXACT relative to a single-node
    replay (module docstring), hence the bit-exact DuckDB oracle in
    ``queries_llm.SQL_KMV_DISTINCT``. Hash collisions fold identically
    in both engines (both count distinct *hashes*).
    """
    if k < 2:
        raise ValueError("kmv_distinct needs k >= 2")
    kept = kmv_sketches(df, k, group_col, text_col, ngram)
    # (k-1)·2^56 is exact in a double (k-1 has far fewer than 53 bits);
    # kth < 2^56 casts with one deterministic IEEE rounding in both
    # engines, so the estimator is a single bit-portable division.
    numer = float((k - 1) * HASH_DOMAIN)
    return kept.select(
        group_col,
        F.size("mins").cast("long").alias("n_kept"),
        F.when(F.size("mins") >= k, F.element_at("mins", k)).alias("kth_hash"),
        F.when(
            F.size("mins") >= k,
            F.lit(numer) / F.element_at("mins", k).cast("double"),
        )
        .otherwise(F.size("mins").cast("double"))
        .alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog registers
# ---------------------------------------------------------------------------

#: HLL precision: 2^6 = 64 registers, alpha_64 = 0.709 (Flajolet et
#: al. Fig. 3). 56-bit hash → 6-bit register index + 50-bit suffix.
HLL_P = 6
HLL_M = 1 << HLL_P
_HLL_SUFFIX_BITS = 56 - HLL_P
#: max rho: an all-zero suffix ranks (suffix_bits + 1)
_HLL_R = _HLL_SUFFIX_BITS + 1
#: alpha_m · m² · 2^R — the whole estimator numerator as ONE literal,
#: so Spark and DuckDB perform the identical single IEEE division.
HLL_NUMER = 0.709 * HLL_M * HLL_M * float(1 << _HLL_R)


def hll_distinct(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    ngram: int = 1,
) -> DataFrame:
    """Per-group HyperLogLog distinct-token estimate, pure JVM (no
    Python stage). Returns ``(group_col, zero_registers,
    register_sum, raw_est)`` where ``register_sum`` is the exact
    integer ``sum_j 2^(R - M_j)`` over all m registers (absent
    registers contribute ``2^R``, i.e. ``M_j = 0``) and ``raw_est``
    is the raw HLL estimator ``alpha_m·m²/sum(2^-M_j)`` — bias
    corrections need libm ``ln`` and are intentionally left to the
    caller (module docstring).

    100 TB shape: one groupBy over (group, register-index) with
    map-side partial ``max`` — the shuffle carries at most m = 64
    rows per group per partition regardless of corpus size, and the
    final per-group reduce folds exactly m rows. This is the
    cheapest distinct estimator here (cheaper than KMV's Python
    stage) when ±~13 % (1.04/√64) error is acceptable.
    """
    toks = _group_grams(df, group_col, text_col, ngram)
    hashed = toks.select(group_col, h56(F.col("gram")).alias("h"))
    sb, rmax = _HLL_SUFFIX_BITS, _HLL_R
    regs = hashed.select(
        group_col,
        # integer shift, NOT `/`: h has 56 bits, a double round-trip
        # would round the low bits and can carry across the register
        # boundary
        F.shiftright(F.col("h"), sb).alias("idx"),
        F.col("h").bitwiseAND(F.lit((1 << sb) - 1)).alias("suffix"),
    ).select(
        group_col,
        "idx",
        # rho = leading zeros of the sb-bit suffix + 1; bitlen via
        # length(bin(x)) is exact & identical in Spark and DuckDB
        F.when(F.col("suffix") == 0, F.lit(rmax))
        .otherwise(F.lit(sb + 1) - F.length(F.bin("suffix")))
        .alias("rho"),
    )
    per_reg = regs.groupBy(group_col, "idx").agg(F.max("rho").alias("mrho"))
    per_grp = per_reg.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - mrho)")).alias(
            "s_present"
        ),
    )
    return per_grp.select(
        group_col,
        (F.lit(HLL_M) - F.col("present")).cast("long").alias("zero_registers"),
        (
            F.col("s_present")
            + (F.lit(HLL_M) - F.col("present")) * F.lit(1 << rmax)
        ).alias("register_sum"),
        (F.lit(HLL_NUMER) / F.col("register_sum").cast("double")).alias("raw_est"),
    )


def kmv_pairwise_overlap(
    df: DataFrame,
    k: int = 64,
    group_col: str = "source",
    text_col: str = "text",
    ngram: int = 1,
) -> DataFrame:
    """Estimated content overlap between every pair of groups from
    their KMV sketches — the decontamination / mixing-design sizing
    tool: "how much does source A share with source B" WITHOUT an
    all-pairs shingle join. Returns per pair ``(grp_a < grp_b)``:

    - ``n_kept``   — |K|, K = the k smallest of the sketch union
      (= the k smallest distinct hashes of A ∪ B, by mergeability);
    - ``n_both``   — |K ∩ A-sketch ∩ B-sketch|;
    - ``n_a``/``n_b`` — |K ∩ A-sketch| / |K ∩ B-sketch|;
    - ``jaccard_est``     — n_both / n_kept (the standard KMV
      Jaccard estimator; EXACT when |A ∪ B| ≤ k);
    - ``containment_a_est`` — n_both / n_a ≈ |A∩B| / |A|.

    Estimators are single IEEE divisions of exact integers — the
    DuckDB replay is bit-identical. 100 TB shape: the corpus is
    touched once to build G bounded sketches; the pairwise stage
    joins G·k-sized arrays (G², but G = #sources, not #docs).
    """
    sk = kmv_sketches(df, k, group_col, text_col, ngram)
    a = sk.select(F.col(group_col).alias("grp_a"), F.col("mins").alias("mins_a"))
    b = sk.select(F.col(group_col).alias("grp_b"), F.col("mins").alias("mins_b"))
    merged = F.slice(
        F.array_sort(F.array_union(F.col("mins_a"), F.col("mins_b"))), 1, k
    )
    return (
        a.join(b, F.col("grp_a") < F.col("grp_b"))
        .withColumn("merged", merged)
        .select(
            "grp_a",
            "grp_b",
            F.size("merged").cast("long").alias("n_kept"),
            F.size(
                F.array_intersect(
                    F.array_intersect(F.col("merged"), F.col("mins_a")),
                    F.col("mins_b"),
                )
            )
            .cast("long")
            .alias("n_both"),
            F.size(F.array_intersect(F.col("merged"), F.col("mins_a")))
            .cast("long")
            .alias("n_a"),
            F.size(F.array_intersect(F.col("merged"), F.col("mins_b")))
            .cast("long")
            .alias("n_b"),
        )
        .withColumn(
            "jaccard_est",
            F.when(F.col("n_kept") == 0, F.lit(0.0)).otherwise(
                F.col("n_both").cast("double") / F.col("n_kept").cast("double")
            ),
        )
        .withColumn(
            "containment_a_est",
            F.when(F.col("n_a") == 0, F.lit(0.0)).otherwise(
                F.col("n_both").cast("double") / F.col("n_a").cast("double")
            ),
        )
    )


def hll_distinct_cube(
    df: DataFrame,
    dim_a: str,
    dim_b: str,
    id_col: str,
) -> DataFrame:
    """COUNT DISTINCT over CUBE — the classic hard OLAP ask (distinct
    counts do not roll up; a naive answer re-scans the fact table once
    per grouping set) — solved sketch-style in ONE pass: the HLL
    register index joins every grouping set, so
    ``GROUPING SETS ((a,b,idx),(a,idx),(b,idx),(idx))`` + ``max(rho)``
    builds all four register files from a single scan through
    Catalyst's Expand, and a second combinable aggregate folds each
    file exactly like :func:`hll_distinct`.

    Returns one row per (a, b, gid) grouping-set member with
    ``zero_registers``, ``register_sum`` (exact integer) and the raw
    HLL estimate (same caller-side-correction contract as
    :func:`hll_distinct`). Deterministic integer register math end to
    end, so the DuckDB grouping-sets replay is bit-identical.

    100 TB shape: the Expand multiplies the scan by 4 (the number of
    sets), but every set's shuffle carries ≤ m = 64 rows per group per
    partition — the fact table itself is never shuffled, and the
    register files can be persisted and re-merged later (register max
    is associative) for incremental refresh.
    """
    sb, rmax = _HLL_SUFFIX_BITS, _HLL_R
    hashed = df.select(
        F.col(dim_a),
        F.col(dim_b),
        h56(F.col(id_col).cast("string")).alias("h"),
    )
    regs = hashed.select(
        dim_a,
        dim_b,
        F.shiftright(F.col("h"), sb).alias("idx"),
        F.when(F.col("h").bitwiseAND(F.lit((1 << sb) - 1)) == 0, F.lit(rmax))
        .otherwise(
            F.lit(sb + 1)
            - F.length(F.bin(F.col("h").bitwiseAND(F.lit((1 << sb) - 1))))
        )
        .alias("rho"),
    )
    level1 = regs.groupingSets(
        [[dim_a, dim_b, "idx"], [dim_a, "idx"], [dim_b, "idx"], ["idx"]],
        F.col(dim_a),
        F.col(dim_b),
        F.col("idx"),
    ).agg(
        F.max("rho").alias("mrho"),
        F.expr(
            f"CAST(grouping({dim_a}) * 2 + grouping({dim_b}) AS BIGINT)"
        ).alias("gid"),
    )
    per_set = level1.groupBy(dim_a, dim_b, "gid").agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - mrho)")).alias(
            "s_present"
        ),
    )
    return per_set.select(
        dim_a,
        dim_b,
        "gid",
        (F.lit(HLL_M) - F.col("present")).cast("long").alias("zero_registers"),
        (
            F.col("s_present")
            + (F.lit(HLL_M) - F.col("present")) * F.lit(1 << rmax)
        ).alias("register_sum"),
        (F.lit(HLL_NUMER) / (
            F.col("s_present")
            + (F.lit(HLL_M) - F.col("present")) * F.lit(1 << rmax)
        ).cast("double")).alias("raw_est"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan, J.Alg'05)
# ---------------------------------------------------------------------------

#: CM defaults: width 256 (eps = e/w ~ 1.1%), depth 4 (delta = e^-4).
CMS_W = 256
CMS_D = 4


def _cms_cells(key: F.Column, d: int, w: int) -> F.Column:
    """The d (row, bucket) cells of a key — row-salted h56, exact in
    both engines (`bucket_i = h56(concat(i, '|', key)) % w`)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        lambda i: F.struct(
            i.alias("r"),
            F.pmod(
                h56(F.concat(i.cast("string"), F.lit("|"), key)), F.lit(w)
            ).alias("b"),
        ),
    )


def cms_sketch(
    df: DataFrame,
    key_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the d×w Count-Min table over a key stream: one explode
    to d narrow rows per occurrence, then ONE map-side-combinable
    groupBy into the bounded-by-construction ``(r, b, c)`` frame
    (d·w rows total, regardless of corpus size) — the mergeable
    frequency summary that answers point queries the exact
    heavy-hitters pass cannot afford for NON-heavy keys.
    """
    wt = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    cells = (
        df.select(
            F.explode(_cms_cells(F.col(key_col), d, w)).alias("cell"),
            wt.alias("_wt"),
        )
        .select("cell.r", "cell.b", "_wt")
    )
    return cells.groupBy("r", "b").agg(F.sum("_wt").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Point-frequency estimates for a probe key frame:
    ``est = min over rows of sketch[r][b_r(key)]`` — never below the
    true count, above it by ≤ (e/w)·N with probability 1−e^−d. The
    sketch frame is broadcast (bounded BY CONSTRUCTION at d·w rows,
    DESIGN §4.23); the estimate is exact integer arithmetic, so the
    whole operator replays bit-identically in SQL."""
    cells = probes.select(
        F.col(key_col),
        F.explode(_cms_cells(F.col(key_col), d, w)).alias("cell"),
    ).select(key_col, "cell.r", "cell.b")
    return (
        cells.join(F.broadcast(sketch), ["r", "b"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
