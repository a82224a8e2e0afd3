"""Bloom-filter join pruning — filter the big side of a join
scan-locally before it shuffles.

North-star scale surface (reference N/A — the reference has no joins
at all, ``etl.py``). The pattern is the one Spark's own runtime
row-level filtering implements for shuffle joins: when the dimension
side of a join is too big to broadcast as ROWS but its KEY SET
compresses into a few KiB of Bloom bits, ship the bits instead. Every
big-side row that fails the membership test is dropped at the SCAN —
before the shuffle — so the exchange carries only rows that can
possibly match (plus the filter's false-positive rate). The join
itself still runs, so false positives cannot corrupt the result: the
pruned join is semantically IDENTICAL to the unpruned join, which is
exactly what makes the operator oracle-checkable with the plain-join
SQL.

Plan shape: building the filter is one combinable aggregate over the
key side (explode each key into k (word, bit) pairs, ``bit_or`` per
word — ≤ m/64 result rows) followed by a DRIVER COLLECT that is
bounded by the filter SIZE (m/64 int64 words, e.g. 64 rows for a
4096-bit filter), never by the key count — the same bounded-collect
class as IVF centroids. The membership test compiles to a pure
Column expression over literal words (md5-derived double hashing,
``element_at`` on a literal array), so it rides inside
WholeStageCodegen on the big-side scan with zero extra joins or
shuffles.

Sizing: false-positive rate ≈ (1 − e^(−k·n/m))^k; at the default
m=4096, k=5 a 500-key set gives ~2% — every false positive costs one
shuffled row, not a wrong answer. At 100 TB scale, size m from the
expected distinct-key count (the KMV/HLL sketches in
``llmdata/sketches.py`` estimate it in one pass) and keep m/64 words
comfortably under broadcast limits — a 1M-bit filter is 125 KiB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stock_indicators_etl_spark.llmdata.hashing import h56


def _h2(key: Column) -> tuple[Column, Column]:
    """Two independent 56-bit hashes for double hashing (Kirsch-
    Mitzenmacher: pos_i = h1 + i*h2 mod m simulates k hashes)."""
    s = key.cast("string")
    h1 = h56(s)
    h2 = h56(F.concat(s, F.lit("\x01bloom")))
    # force h2 odd so it is coprime with power-of-two m (full cycle)
    return h1, h2.bitwiseOR(F.lit(1))


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 4096, k: int = 5
) -> list[int]:
    """Aggregate the key side into Bloom words and collect them.

    Returns ``m_bits / 64`` int64 words. The collect is bounded by the
    FILTER size (a constant chosen up front), not the key count — the
    aggregate is map-side combinable ``bit_or`` so each partition
    contributes at most m/64 rows to the final merge.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    h1, h2 = _h2(F.col(key_col))
    pairs = []
    for i in range(k):
        pos = (h1 + F.lit(i) * h2) % F.lit(m_bits)
        # call_function: the python shiftleft() helper only takes a
        # literal bit count; the SQL function accepts a column
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        pairs.append(
            F.struct(
                (pos / F.lit(64)).cast("long").alias("w"), mask.alias("m")
            )
        )
    # NULL keys carry no membership information (might_contain(NULL)
    # is null → filtered, matching inner-join semantics) but would
    # propagate null through pos/mask and crash the word fill below
    words = (
        df.filter(F.col(key_col).isNotNull())
        .select(F.explode(F.array(*pairs)).alias("p"))
        .groupBy(F.col("p.w").alias("w"))
        .agg(F.bit_or("p.m").alias("bits"))
        .collect()
    )
    out = [0] * (m_bits // 64)
    for r in words:
        out[int(r["w"])] = int(r["bits"])
    return out


def bloom_might_contain(
    key: Column, words: list[int], k: int = 5
) -> Column:
    """Membership test as a literal-array Column expression — AND of
    the k bit probes, scan-local, codegen-friendly."""
    m_bits = 64 * len(words)
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    h1, h2 = _h2(key)
    cond = F.lit(True)
    for i in range(k):
        pos = (h1 + F.lit(i) * h2) % F.lit(m_bits)
        word = F.element_at(arr, (pos / F.lit(64)).cast("int") + F.lit(1))
        bit = F.call_function(
            "shiftrightunsigned", word, (pos % 64).cast("int")
        ).bitwiseAND(F.lit(1))
        cond = cond & (bit == 1)
    return cond


def bloom_pruned_join(
    big: DataFrame,
    keys: DataFrame,
    big_key: str,
    key_col: str,
    m_bits: int = 4096,
    k: int = 5,
    how: str = "inner",
) -> DataFrame:
    """``big ⋈ keys`` with the big side Bloom-pruned before the
    shuffle. Result is identical to the plain join (false positives
    are removed by the join itself)."""
    words = bloom_build(keys, key_col, m_bits=m_bits, k=k)
    pruned = big.filter(bloom_might_contain(F.col(big_key), words, k=k))
    return pruned.join(keys, pruned[big_key] == keys[key_col], how)
