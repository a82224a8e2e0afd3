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

100 TB shape: the full-width shuffle of a naive
``groupBy(token).count()`` carries the entire vocabulary (billions of
distinct n-grams); here the only full-stream work is scan-local, the
first shuffle carries ≤ cap·partitions rows, and the recount shuffle
carries only candidate tokens. Threshold arithmetic is pure integer
(``ceil(a/b) = (a+b-1) div b``) so Spark and DuckDB agree bit-exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
