"""Edit-distance (fuzzy) string join — the entity-resolution staple.

North-star surface (reference N/A). Finds all pairs of distinct
strings within Levenshtein distance ``max_dist`` WITHOUT the N²
cross join, via q-gram prefix filtering (the Ed-Join/PPJoin family):

1. q-gram count filter: one edit destroys at most ``q`` q-grams, so
   ``ed(a,b) ≤ d`` ⇒ the gram multisets share ≥ max(|Ga|,|Gb|) − q·d
   grams.
2. prefix filter: order every string's grams by ONE global total
   order (corpus gram frequency asc, gram asc — rare grams first so
   prefixes are selective). If two multisets overlap in ≥ t elements,
   their ``(|G| − t + 1)``-prefixes share a gram value; with
   t = |G| − q·d that prefix is at most ``q·d + 1`` grams. The
   candidate join is an equi-join on PREFIX grams only.
3. strings too short for the count filter to bite
   (``|G| ≤ q·d``) pair against every string within length ``d`` —
   the honest degenerate bucket (bounded: the sub-``q·(d+1)``-length
   vocabulary is tiny), a broadcast join, never a full cross join.
4. verify with exact ``F.levenshtein`` (same algorithm in DuckDB, so
   the whole operator is oracle-checkable bit-exactly).

Plan: distinct-string frame → gram explode (scan-local) → one gram
frequency groupBy → per-string prefix window → prefix-gram equi-join
→ length filter → distinct pairs → levenshtein verify. No Python
stages, no cartesian products (plan-asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _grams(c, q: int):
    """Multiset of q-grams (whole string if shorter than q)."""
    n = F.length(c)
    return F.when(
        n < q, F.array(c)
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - q + 1),
            lambda i: F.substr(c, i, F.lit(q)),
        )
    )


def edit_distance_pairs(
    df: DataFrame,
    str_col: str = "text",
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """All pairs of DISTINCT values of ``str_col`` with
    ``levenshtein ≤ max_dist``: (s_a, s_b, dist), s_a < s_b."""
    if max_dist < 1 or q < 1:
        raise ValueError("max_dist and q must be >= 1")
    prefix_len = q * max_dist + 1

    s = df.select(F.col(str_col).alias("s")).distinct()
    with_grams = s.select(
        "s", F.length("s").alias("n"), _grams(F.col("s"), q).alias("grams")
    )
    exploded = with_grams.select(
        "s", "n", F.size("grams").alias("ng"), F.explode("grams").alias("g")
    )
    freq = exploded.groupBy("g").agg(F.count(F.lit(1)).alias("gf"))
    w = Window.partitionBy("s").orderBy("gf", "g")
    prefix = (
        exploded.join(freq, "g")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= prefix_len)
        .select("s", "n", "g")
    )

    a = prefix.select(
        F.col("s").alias("s_a"), F.col("n").alias("n_a"), "g"
    )
    b = prefix.select(
        F.col("s").alias("s_b"), F.col("n").alias("n_b"), "g"
    )
    cand = (
        a.join(b, "g")
        .filter(
            (F.col("s_a") < F.col("s_b"))
            & (F.abs(F.col("n_a") - F.col("n_b")) <= max_dist)
        )
        .select("s_a", "s_b")
    )

    # degenerate bucket: count filter is vacuous when |G| <= q·d, so
    # these strings must meet every string within length d
    shorts = with_grams.filter(F.size("grams") <= q * max_dist).select(
        F.col("s").alias("s_a"), F.col("n").alias("n_a")
    )
    all_s = with_grams.select(F.col("s").alias("s_b"), F.col("n").alias("n_b"))
    short_cand = (
        F.broadcast(shorts)
        .join(
            all_s,
            (F.col("s_a") != F.col("s_b"))
            & (F.abs(F.col("n_a") - F.col("n_b")) <= max_dist),
        )
        .select(
            F.least("s_a", "s_b").alias("s_a"),
            F.greatest("s_a", "s_b").alias("s_b"),
        )
    )

    pairs = cand.unionByName(short_cand).distinct()
    return (
        pairs.withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= max_dist)
        .select("s_a", "s_b", "dist")
    )
