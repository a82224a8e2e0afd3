"""Graph propagation operators beyond connected components.

North-star surface (reference N/A; complements
``llmdata.dedup.connected_components`` — CC answers "which group",
PageRank answers "how central within the graph"). The dedup use:
rank documents by centrality of the near-dup candidate graph — hub
documents (templates every page copies) rank high and are the ones a
curation pass should inspect.

:func:`pagerank` is the FIXED-POINT INTEGER variant: ranks live in
``scale`` units, every step is integer arithmetic
(``r/deg`` and the damping factor are integer divisions), so the
iteration is deterministic and associative — a DuckDB oracle replays
the unrolled iterations bit-exactly, the same strategy as the k-means
oracle. The rounding loss per step is ≤ deg/scale ≈ 10⁻¹² of mass —
irrelevant for ranking, essential for cross-engine exactness.

Plan per iteration: one equi-join of the (pinned) degree-annotated
edge list against the current ranks + one combinable groupBy(dst).
Unlike CC (whose driver-side convergence probes re-evaluate the
lineage), the rank lineage here is LINEAR — each iteration reads the
previous ranks exactly once — so intermediate checkpoints are not
needed for correctness; ``checkpoint_every`` (default 8) bounds plan
depth for long runs while short runs compile to ONE job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = PR_SCALE,
    checkpoint_every: int = 8,
) -> DataFrame:
    """(v, rank) after ``iters`` integer power iterations over the
    directed edge list. Vertices are the edge endpoints (an isolated
    vertex has no edges to rank it by). Dangling mass leaks, as in
    the simplest published formulation — deterministic either way."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e_deg = e.join(deg, "src").persist()
    n_frame = verts.agg(F.count(F.lit(1)).alias("n"))

    ranks = verts.crossJoin(F.broadcast(n_frame)).select(
        "v", F.expr(f"{scale} div n").alias("rank")
    )
    for it in range(1, iters + 1):
        contrib = (
            e_deg.join(ranks, e_deg["src"] == ranks["v"])
            .select("dst", F.expr("rank div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            verts.join(contrib, verts["v"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(n_frame))
            .select(
                "v",
                F.expr(
                    f"{scale} * {damping_den - damping_num} div ({damping_den} * n)"
                    f" + {damping_num} * coalesce(inflow, 0) div {damping_den}"
                ).alias("rank"),
            )
        )
        if checkpoint_every and it % checkpoint_every == 0 and it < iters:
            ranks = ranks.localCheckpoint(eager=False)
    # Materialize the final ranks so e_deg can be unpersisted here rather
    # than leaking a cached DataFrame for the session lifetime (the cache
    # is only useful while the iteration lineage is alive).
    ranks = ranks.localCheckpoint(eager=True)
    e_deg.unpersist()
    return ranks
