"""DataFrame-native k-means (Lloyd) over an embedding column.

Semantic clustering is the backbone of modern training-data curation
(cluster-based diversity sampling, SemDeDup-style within-cluster
near-dedup, domain balancing); this implements it with the same
Spark-first discipline as the ANN operators in :mod:`.similarity`.

Four execution methods, one semantics (``method=`` on
:func:`kmeans_assign` / :func:`semantic_neardup_pairs`):

- ``"literal"`` (alias ``"oracle"``; the small-k oracle path, the
  default for :func:`kmeans_assign`): assignment is one
  scan-local pass — the k×d centroid matrix is embedded as array
  literals and each row evaluates a single ``transform``/``array_min``
  lambda tree (no shuffle, no Python stage). The update collects the
  k·d per-(cluster, dim) sums to the driver and re-embeds the means
  as the next iteration's literals. Plan size and driver state are
  O(k·d) — fine to k ~ 10², the bit-exact DuckDB-replayable default.
- ``"join"`` (DataFrame-resident; the driver-free scale path):
  centroids live as a ``(cluster, cent array<double>)`` DataFrame,
  ``localCheckpoint``-pinned each round. Assignment is a broadcast
  nested-loop join (big side never shuffled at full width until the
  per-row argmin groupBy, which partial-aggregates k→1 map-side) and
  the update is a pure ``groupBy`` back into a k-row DataFrame — no
  iteration moves centroid data through the driver and the plan stays
  O(1) in k. Bit-identical to ``"literal"`` (same fold orders, same
  ``min(struct(d, j))`` tie-break, same empty-cluster rule).
- ``"arrow"`` (big-k path, k ~ 10³–10⁵): assignment is a
  ``mapInPandas`` stage reading the centroid matrix from a Spark
  broadcast variable — per-batch numpy block-matmul argmin, the MLlib
  pattern — and the update ships per-batch per-cluster partial sums
  (one narrow combinable shuffle), so the driver holds exactly one
  k×d float64 matrix per iteration (k=10⁵·d=64 ≈ 50 MB) and the plan
  never embeds a literal. Distances use the ``|x|²−2x·c+|c|²`` form:
  assignments agree with the fold paths except on exact FP ties
  (property-tested equal on real data); dist2 agrees to ~1 ulp.
- ``"hier"`` (``arrow`` updates + two-level O(N·√k) probe
  assignment; the SemDeDup production default — see
  :func:`semantic_neardup_pairs`): like ``"arrow"`` but each batch
  probes the ``n_probe`` nearest centroid GROUPS first, so the
  per-row distance work is O(√k) instead of O(k). Approximate by
  design (recall rises with ``n_probe``); at SemDeDup-realistic k
  (k = N/target grows with the corpus) it is the only assignment
  whose cost stays ~N·√k rather than N²/target.

Beyond broadcastable k·d (k ~ 10⁶ · d ~ 10³): shard the centroid
matrix and run :func:`assign_with_centroids_arrow` once per shard with
a running min — or cluster the centroids themselves and assign
two-level (IVF over centroids). DESIGN.md §6 records the regime table.

Determinism / oracle contract: init is the k vectors with the
smallest ids (``TakeOrderedAndProject``, not a global sort); L2² runs
as a left fold in index order; with ``exact_update=True`` the
centroid sums fold in vec_id order (``aggregate(sort_array(
collect_list(...)))`` ≡ DuckDB ``list_reduce(list(val ORDER BY
vec_id))``), making every iteration — and therefore the final
assignment — bit-identical to the pure-SQL replay. The default
``exact_update=False`` uses plain ``sum()`` (order-free partial
aggregation, the 100 TB path); means differ from the exact path only
by IEEE summation order. Empty clusters keep their previous centroid.
Ties (equal distance) resolve to the lowest cluster index.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from stock_indicators_etl_spark.llmdata.similarity import _as_double


def _l2sq(a: Column, b: Column) -> Column:
    """Left-fold squared L2 distance — deterministic summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_with_centroids(
    df: DataFrame,
    cents: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep_vec: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment against a FIXED centroid matrix —
    the serving-path half of k-means. Scan-local (one
    ``transform``/``array_min`` lambda tree over centroid literals, no
    shuffle, no Python stage), so it composes with batch scans AND
    Structured Streaming sources unchanged: fit centroids in batch
    with :func:`kmeans_assign`, then assign arriving vectors online.
    Ties resolve to the lowest cluster index."""
    import numpy as np

    if not cents:
        raise ValueError("cents must be non-empty")
    CENT = F.array(*[F.lit(np.asarray(c, dtype=np.float64)) for c in cents])
    pairs = F.transform(
        F.sequence(F.lit(0), F.lit(len(cents) - 1)),
        lambda j: F.struct(
            _l2sq(F.col("_v"), F.element_at(CENT, j + 1)).alias("d"),
            j.alias("j"),
        ),
    )
    best = F.array_min(pairs)
    out = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("_v")
    ).select(
        "vec_id",
        "_v",
        best["j"].alias("cluster"),
        best["d"].alias("dist2"),
    )
    return out if keep_vec else out.drop("_v")


def _update_sum_expr(exact_update: bool) -> Column:
    """The per-(cluster, dim) centroid-sum aggregate, shared by every
    method: vec_id-ordered fold when ``exact_update`` (oracle-exact),
    plain combinable ``sum`` otherwise (the 100 TB default)."""
    if exact_update:
        return F.expr(
            "aggregate(sort_array(collect_list(struct(vec_id, val))), "
            "cast(0.0 as double), (acc, x) -> acc + x.val)"
        )
    return F.sum("val")


def _init_centroids_df(
    vecs: DataFrame, k: int
) -> DataFrame:
    """Deterministic first-``k``-ids init as a ``(cluster, cent)``
    DataFrame — ``TakeOrderedAndProject`` for the k rows, then a
    row_number over those k rows only (single tiny partition)."""
    w = Window.orderBy(F.col("vec_id"))
    return (
        vecs.orderBy("vec_id")
        .limit(k)
        .select((F.row_number().over(w) - 1).alias("cluster"), F.col("_v").alias("cent"))
    )


def _kmeans_join(
    vecs: DataFrame,
    k: int,
    iters: int,
    exact_update: bool,
) -> DataFrame:
    """DataFrame-resident Lloyd rounds: centroids never leave the
    executors. Per iteration: one broadcast nested-loop expansion
    (pipelined, never materialized at N×k width), one argmin groupBy
    whose partial aggregation collapses the k candidates per vec_id
    map-side, one narrow (cluster, dim) sum shuffle, and a k-row
    ``localCheckpoint`` to pin the new centroids and truncate lineage.
    """
    cents = _init_centroids_df(vecs, k).localCheckpoint()

    def _assigned(cents_df: DataFrame) -> DataFrame:
        j = vecs.crossJoin(F.broadcast(cents_df))
        pair = F.struct(
            _l2sq(F.col("_v"), F.col("cent")).alias("d"),
            F.col("cluster").alias("j"),
        )
        return (
            j.select("vec_id", "_v", pair.alias("p"))
            .groupBy("vec_id")
            .agg(F.min("p").alias("m"), F.first("_v").alias("_v"))
            .select(
                "vec_id",
                F.col("m.j").alias("cluster"),
                F.col("m.d").alias("dist2"),
                "_v",
            )
        )

    for _ in range(iters):
        a = _assigned(cents)
        expl = a.select("vec_id", "cluster", F.posexplode("_v").alias("dim", "val"))
        means = (
            expl.groupBy("cluster", "dim")
            .agg(_update_sum_expr(exact_update).alias("s"), F.count(F.lit(1)).alias("cnt"))
            .select(
                "cluster", "dim", (F.col("s") / F.col("cnt").cast("double")).alias("m")
            )
        )
        new = (
            means.groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("pairs"))
            .select("cluster", F.transform("pairs", lambda p: p["m"]).alias("cent_new"))
        )
        # empty clusters keep their previous centroid (same rule as the
        # literal path's per-dim fallback — a non-empty cluster always
        # has every dim present, so per-cluster coalesce is equivalent)
        cents = (
            cents.join(new, "cluster", "left")
            .select("cluster", F.coalesce("cent_new", "cent").alias("cent"))
            .localCheckpoint()
        )

    return _assigned(cents).select("vec_id", "cluster", "dist2")


def _nearest_block(X, C, block: int = 256):
    """Block-matmul nearest centroid: running (argmin, min) over
    centroid blocks; strict ``<`` keeps the lowest cluster index on
    ties (numpy argmin already picks the first within a block)."""
    import numpy as np

    n = X.shape[0]
    best_d = np.full(n, np.inf)
    best_j = np.zeros(n, dtype=np.int64)
    x2 = (X * X).sum(axis=1)
    for s in range(0, C.shape[0], block):
        Cb = C[s : s + block]
        d = x2[:, None] - 2.0 * (X @ Cb.T) + (Cb * Cb).sum(axis=1)[None, :]
        jb = d.argmin(axis=1)
        db = d[np.arange(n), jb]
        upd = db < best_d
        best_d[upd] = db[upd]
        best_j[upd] = jb[upd] + s
    return best_j, np.maximum(best_d, 0.0)


def assign_with_centroids_arrow(
    df: DataFrame,
    cents,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Big-k serving-path assignment: the k×d centroid matrix travels
    as a Spark broadcast variable (torrent-distributed once per
    executor, never in the plan) and each Arrow batch runs a numpy
    block-matmul argmin. Scan-local — no shuffle, no join; composes
    with streaming sources like :func:`assign_with_centroids`."""
    import numpy as np
    import pandas as pd

    C = np.asarray(cents, dtype=np.float64)
    if C.ndim != 2 or C.shape[0] == 0:
        raise ValueError("cents must be a non-empty k x d matrix")
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(C)

    def _assign(batches):
        Cl = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["_v"].to_numpy())
            j, d = _nearest_block(X, Cl)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cluster": j.astype("int32"), "dist2": d}
            )

    vecs = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("_v")
    )
    id_type = vecs.schema["vec_id"].dataType.simpleString()
    return vecs.mapInPandas(
        _assign, schema=f"vec_id {id_type}, cluster int, dist2 double"
    )


def _group_centroids(C, g: int, iters: int = 3):
    """Cluster the k centroids themselves into ``g`` groups (numpy
    Lloyd, deterministic first-``g`` init) — the coarse level of the
    hierarchical assignment. Returns ``(gj, G)``: each centroid's
    group id and the g×d group-center matrix. Runs on the driver over
    the k×d matrix only (centroids, never data)."""
    import numpy as np

    G = C[:g].copy()
    gj = np.zeros(len(C), dtype=np.int64)
    for _ in range(iters):
        gj, _ = _nearest_block(C, G)
        for gi in range(g):
            m = gj == gi
            if m.any():
                G[gi] = C[m].mean(axis=0)
    gj, _ = _nearest_block(C, G)
    return gj, G


def _hier_nearest(X, C, gj, G, n_probe: int = 4):
    """Two-level nearest centroid: probe the ``n_probe`` nearest
    centroid GROUPS per vector, then exact argmin over only those
    groups' member centroids — O(N·(g + n_probe·k/g)) distance work
    instead of O(N·k). With g = √k and fixed n_probe that is O(N·√k):
    the sublinear-in-k assignment SemDeDup needs when cluster size is
    pinned and k grows with the corpus. Approximate by design (a
    vector whose true centroid sits in an unprobed group is
    mis-assigned — recall rises with ``n_probe``); ties break to the
    lowest centroid index, like every exact path here."""
    import numpy as np

    n = X.shape[0]
    x2 = (X * X).sum(axis=1)[:, None]
    dG = x2 + (G * G).sum(axis=1)[None, :] - 2.0 * (X @ G.T)
    order = np.argsort(dG, axis=1, kind="stable")[:, :n_probe]
    best_d = np.full(n, np.inf)
    best_j = np.zeros(n, dtype=np.int64)
    for gi in range(G.shape[0]):
        rows = np.nonzero((order == gi).any(axis=1))[0]
        members = np.nonzero(gj == gi)[0]
        if rows.size == 0 or members.size == 0:
            continue
        Cm = C[members]
        d = (
            x2[rows]
            + (Cm * Cm).sum(axis=1)[None, :]
            - 2.0 * (X[rows] @ Cm.T)
        )
        loc = np.argmin(d, axis=1)
        dmin = d[np.arange(rows.size), loc]
        cand = members[loc]
        better = (dmin < best_d[rows]) | (
            (dmin == best_d[rows]) & (cand < best_j[rows])
        )
        upd = rows[better]
        best_d[upd] = dmin[better]
        best_j[upd] = cand[better]
    return best_j, np.maximum(best_d, 0.0)


def hier_assign_with_centroids(
    df: DataFrame,
    cents,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Hierarchical serving-path assignment: like
    :func:`assign_with_centroids_arrow` but each Arrow batch assigns
    through the two-level probe (:func:`_hier_nearest`) — the path to
    use when k is 10⁴+ and the flat k×d matmul per batch starts to
    dominate. The grouping of the centroids is computed once on the
    driver (k×d only) and broadcast alongside them."""
    import math

    import numpy as np
    import pandas as pd

    C = np.asarray(cents, dtype=np.float64)
    if C.ndim != 2 or C.shape[0] == 0:
        raise ValueError("cents must be a non-empty k x d matrix")
    g = max(1, int(math.ceil(math.sqrt(C.shape[0]))))
    gj, G = _group_centroids(C, g)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((C, gj, G))

    def _assign(batches):
        Cl, gjl, Gl = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            j, d = _hier_nearest(X, Cl, gjl, Gl, n_probe)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cluster": j.astype("int32"), "dist2": d}
            )

    vecs = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("_v")
    )
    id_type = vecs.schema["vec_id"].dataType.simpleString()
    return vecs.mapInPandas(
        _assign, schema=f"vec_id {id_type}, cluster int, dist2 double"
    )


def _kmeans_arrow(
    vecs: DataFrame,
    k: int,
    iters: int,
    hier: bool = False,
    n_probe: int = 4,
) -> DataFrame:
    """Big-k Lloyd rounds (the MLlib pattern): per iteration the
    driver holds exactly one k×d float64 matrix (broadcast variable),
    the update is per-batch numpy partial sums — each task emits at
    most k rows of ``(cluster, [cnt, sum_0..sum_{d-1}])`` — reduced by
    one narrow combinable shuffle and a bounded k·(d+1)-row collect.
    ``exact_update`` is not offered here: big-k is by definition
    outside the oracle regime, and partial sums are order-free.

    ``hier=True`` swaps the per-batch flat k×d matmul for the
    two-level probe (:func:`_hier_nearest`, O(N·√k) at fixed
    ``n_probe``) — the assignment cost that stays sublinear in k when
    SemDeDup pins cluster size and k grows with the corpus. The
    √k-group structure is recomputed from the (k×d) centroid matrix
    on the driver each iteration — centroid-only work."""
    import math

    import numpy as np
    import pandas as pd

    spark = vecs.sparkSession
    init = vecs.orderBy("vec_id").limit(k).collect()
    C = np.asarray([list(r["_v"]) for r in init], dtype=np.float64)
    kk, dim = C.shape

    for _ in range(iters):
        if hier:
            g = max(1, int(math.ceil(math.sqrt(kk))))
            bc = spark.sparkContext.broadcast(
                (C, *_group_centroids(C, g), n_probe)
            )
        else:
            bc = spark.sparkContext.broadcast(C)

        def _partials(batches):
            if hier:
                Cl, gjl, Gl, npb = bc.value
            else:
                Cl = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack(pdf["_v"].to_numpy())
                if hier:
                    j, _ = _hier_nearest(X, Cl, gjl, Gl, npb)
                else:
                    j, _ = _nearest_block(X, Cl)
                present = np.unique(j)
                sums = np.zeros((len(present), Cl.shape[1] + 1))
                for i, cl in enumerate(present):
                    m = j == cl
                    sums[i, 0] = m.sum()
                    sums[i, 1:] = X[m].sum(axis=0)
                yield pd.DataFrame(
                    {"cluster": present.astype("int32"), "s": list(sums)}
                )

        upd = (
            vecs.mapInPandas(_partials, schema="cluster int, s array<double>")
            .select("cluster", F.posexplode("s").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.sum("val").alias("v"))
            .collect()
        )
        bc.destroy()
        cnt = np.zeros(kk)
        sums = np.zeros((kk, dim))
        for r in upd:
            if r["dim"] == 0:
                cnt[r["cluster"]] = r["v"]
            else:
                sums[r["cluster"], r["dim"] - 1] = r["v"]
        nonempty = cnt > 0
        C = np.where(nonempty[:, None], sums / np.maximum(cnt, 1.0)[:, None], C)

    final = vecs.withColumnRenamed("_v", "embedding")
    if hier:
        return hier_assign_with_centroids(final, C, n_probe=n_probe, vec_col="embedding")
    return assign_with_centroids_arrow(final, C, vec_col="embedding")


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exact_update: bool = False,
    method: str = "literal",
) -> DataFrame:
    """Lloyd k-means: ``iters`` assign→update rounds from a
    deterministic first-``k``-ids init, returning the assignment
    under the final centroids as ``(vec_id, cluster, dist2)``.

    ``method`` picks the execution strategy (identical semantics, see
    module docstring): ``"literal"`` (oracle default, k ~ 10²;
    ``"oracle"`` is an explicit alias for the hash-harness callers),
    ``"join"`` (DataFrame-resident centroids, driver-free, O(1) plan),
    ``"arrow"`` (broadcast-variable numpy, k ~ 10³–10⁵),
    ``"hier"`` (arrow with the O(N·√k) two-level probe assignment —
    approximate, for SemDeDup-realistic k where even the flat matmul
    is the bottleneck).
    """
    if k <= 0 or iters < 0:
        raise ValueError("k must be positive and iters non-negative")
    if method == "oracle":
        method = "literal"
    if method not in ("literal", "join", "arrow", "hier"):
        raise ValueError(f"unknown kmeans method: {method!r}")

    vecs = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("_v")
    )
    if method == "join":
        return _kmeans_join(vecs, k, iters, exact_update)
    if method in ("arrow", "hier"):
        if exact_update:
            raise ValueError(
                "exact_update is a small-k oracle feature; use method='literal' "
                "or 'join' (big-k partial sums are order-free by design)"
            )
        return _kmeans_arrow(vecs, k, iters, hier=method == "hier")

    init_rows = vecs.orderBy(F.col("vec_id")).limit(k).collect()
    cents: list[list[float]] = [list(r["_v"]) for r in init_rows]

    def _assigned(cents: list[list[float]]) -> DataFrame:
        return assign_with_centroids(
            embeddings, cents, vec_col=vec_col, id_col=id_col, keep_vec=True
        )

    for _ in range(iters):
        a = _assigned(cents)
        expl = a.select(
            "vec_id", "cluster", F.posexplode("_v").alias("dim", "val")
        )
        upd = (
            expl.groupBy("cluster", "dim")
            .agg(_update_sum_expr(exact_update).alias("s"), F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        means: dict[tuple[int, int], float] = {
            (r["cluster"], r["dim"]): r["s"] / float(r["cnt"]) for r in upd
        }
        cents = [
            [means.get((j, d), cents[j][d]) for d in range(len(cents[j]))]
            for j in range(len(cents))
        ]

    return _assigned(cents).select("vec_id", "cluster", "dist2")


def semantic_neardup_pairs(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exact_update: bool = False,
    max_cluster_size: int | None = None,
    target_cluster_size: int | None = None,
    n_vectors: int | None = None,
    method: str = "hier",
) -> DataFrame:
    """SemDeDup-style semantic near-duplicates: k-means partitions the
    corpus, then cosine similarity is computed ONLY within clusters —
    the all-pairs O(N²) drops to Σ|cluster|², and the cluster self-join
    is an equi-join on the cluster id (shuffle-hash/SMJ on a key, never
    a cartesian).

    At 100 TB the knob is ``k``: cluster size ~N/k bounds the per-key
    pair fan-out. ``target_cluster_size`` sets k from the data
    (``k = max(k, ceil(N / target))``) so the within-cluster work
    stays ~N·target instead of N²/k as the corpus grows;
    ``max_cluster_size`` additionally hard-caps skewed clusters
    (boilerplate sinks — dropped from pairing, the same guard
    discipline as LSH's ``max_bucket_size``). ``method`` picks the
    k-means execution strategy (see :func:`kmeans_assign`); the
    DEFAULT here is ``"hier"`` — broadcast-numpy partial-sum updates
    with the O(N·√k) two-level probe assignment — because at
    SemDeDup-realistic k (k = N/target at crawl scale) every exact
    assignment is O(N·k) = O(N²/target) and measurably superlinear
    (SCALING.md: the old exact default hit exp 1.70, 193.5 s at sf1
    vs ~3 s for this path). The exact driver-literal path remains
    available as ``method="oracle"`` for the bit-exact hash harness
    (requires ``exact_update=True`` there).
    Output: ``(cluster, vec_a, vec_b, cosine)`` with
    ``vec_a < vec_b``, deterministic and oracle-replayable when
    ``exact_update=True`` + ``method="oracle"`` (the oracle uses
    fixed k — leave ``target_cluster_size`` unset there).

    NOTE (lazy-composition contract): ``target_cluster_size`` without
    ``n_vectors`` runs one eager ``count()`` Spark job at
    plan-construction time to size k (same documented-eager discipline
    as ``token_shards(missing='error')``). Callers composing plans
    without executing — or who already know the corpus size — should
    pass ``n_vectors`` to keep construction fully lazy.
    """
    if target_cluster_size is not None:
        if target_cluster_size <= 0:
            raise ValueError("target_cluster_size must be positive")
        n = embeddings.count() if n_vectors is None else n_vectors
        k = max(k, -(-n // target_cluster_size))
    assign = kmeans_assign(
        embeddings,
        k=k,
        iters=iters,
        vec_col=vec_col,
        id_col=id_col,
        exact_update=exact_update,
        method=method,
    ).select("vec_id", "cluster")
    if max_cluster_size is not None:
        sizes = assign.groupBy("cluster").agg(F.count(F.lit(1)).alias("_n"))
        assign = (
            assign.join(F.broadcast(sizes), "cluster")
            .filter(F.col("_n") <= max_cluster_size)
            .drop("_n")
        )
    v = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("_v")
    )
    from stock_indicators_etl_spark.llmdata.similarity import _dot

    side = assign.join(v, "vec_id").select(
        "cluster", "vec_id", "_v", F.sqrt(_dot(F.col("_v"), F.col("_v"))).alias("_n")
    )
    a = side.select(
        "cluster",
        F.col("vec_id").alias("vec_a"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = side.select(
        "cluster",
        F.col("vec_id").alias("vec_b"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    pairs = a.join(b, "cluster").filter(F.col("vec_a") < F.col("vec_b"))
    cos = F.when(F.col("_na") * F.col("_nb") == 0, F.lit(0.0)).otherwise(
        _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    )
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("cluster", "vec_a", "vec_b", "cosine")
    )


def semantic_survivors(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster_size: int | None = None,
    method: str = "hier",
) -> DataFrame:
    """The SemDeDup survivor set: group semantic near-dup pairs into
    connected components (min-label propagation, the same engine as
    the n-gram near-dup path) and keep the minimum-id member of each
    group. Vectors with no near-dup survive trivially."""
    from stock_indicators_etl_spark.llmdata.dedup import connected_components

    pairs = semantic_neardup_pairs(
        embeddings,
        k=k,
        iters=iters,
        threshold=threshold,
        vec_col=vec_col,
        id_col=id_col,
        max_cluster_size=max_cluster_size,
        method=method,
    ).select("vec_a", "vec_b")
    vertices = embeddings.select(F.col(id_col).alias("vec_id"))
    comp = connected_components(
        pairs, vertices, id_col="vec_id", src_col="vec_a", dst_col="vec_b"
    )
    keep = comp.filter(F.col("vec_id") == F.col("component")).select("vec_id")
    return embeddings.join(
        keep.withColumnRenamed("vec_id", id_col), id_col, "left_semi"
    )


def kmeans_centroid_stats(assignments: DataFrame) -> DataFrame:
    """Cluster sizes + mean within-cluster distance (curation signal:
    tight clusters → near-dup candidates, huge loose clusters →
    boilerplate). One combinable shuffle."""
    return assignments.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("dist2").alias("mean_dist2"),
    )


def sql_kmeans_oracle(
    k: int = 8, iters: int = 2, dim: int = 64, r6=None
) -> str:
    """DuckDB replay of :func:`kmeans_assign` with
    ``exact_update=True``: identical init, fold orders, tie-breaks and
    empty-cluster rule, unrolled per iteration as CTE chains."""
    parts, final = _kmeans_ctes(k, iters, dim)
    score = r6("d2") if r6 else "d2"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vec_id, CAST(cl AS INT) AS cluster, {score} AS dist2 "
        f"FROM {final}"
    )


def sql_semantic_neardup_oracle(
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    threshold: float = 0.7,
    r6=None,
) -> str:
    """DuckDB replay of :func:`semantic_neardup_pairs` with
    ``exact_update=True``: the k-means CTE chain, then a within-cluster
    self-join scored with the same left-fold cosine as the
    ``cosine_topk`` oracle."""
    parts, final = _kmeans_ctes(k, iters, dim)
    parts.append(
        "nv AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)"
    )
    parts.append(
        f"""p AS (
  SELECT x.cl AS cluster, x.vec_id AS vec_a, y.vec_id AS vec_b,
         CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
              ELSE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) END AS cosine
  FROM {final} x
  JOIN {final} y ON x.cl = y.cl AND x.vec_id < y.vec_id
  JOIN nv a ON a.vec_id = x.vec_id
  JOIN nv b ON b.vec_id = y.vec_id
)"""
    )
    score = r6("cosine") if r6 else "cosine"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT CAST(cluster AS INT) AS cluster, vec_a, vec_b, {score} AS cosine "
        f"FROM p WHERE cosine >= {threshold!r}"
    )


def _kmeans_ctes(k: int, iters: int, dim: int) -> tuple[list[str], str]:
    """The shared Lloyd CTE chain; returns (parts, final-assignment
    CTE name)."""
    d2 = (
        "list_reduce(list_prepend(0.0, list_transform(generate_series(1, {dim}), "
        "i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))), (x, y) -> x + y)"
    ).format(dim=dim)
    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"""c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, v
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k})
)""",
    ]
    for t in range(1, iters + 2):
        prev = f"c{t - 1}"
        parts.append(
            f"""s{t} AS (
  SELECT e.vec_id, c.cl, {d2} AS d2 FROM e CROSS JOIN {prev} c
)"""
        )
        parts.append(
            f"""a{t} AS (
  SELECT vec_id, cl, d2 FROM (
    SELECT vec_id, cl, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cl ASC) AS rn
    FROM s{t}) WHERE rn = 1
)"""
        )
        if t == iters + 1:
            break  # final assignment — no further update
        parts.append(
            f"""u{t} AS (
  SELECT cl, i,
         list_reduce(list_prepend(0.0, list(val ORDER BY vec_id)), (x, y) -> x + y) AS s,
         count(*) AS cnt
  FROM (SELECT vec_id, cl, i, v[i] AS val
        FROM (SELECT a.vec_id, a.cl, e.v, unnest(generate_series(1, {dim})) AS i
              FROM a{t} a JOIN e USING (vec_id)))
  GROUP BY cl, i
)"""
        )
        parts.append(
            f"""c{t} AS (
  SELECT g.cl, list(COALESCE(u.s / CAST(u.cnt AS DOUBLE), g.pvv) ORDER BY g.i) AS v
  FROM (SELECT cl, i, pv[i] AS pvv
        FROM (SELECT cl, v AS pv, unnest(generate_series(1, {dim})) AS i FROM {prev})) g
  LEFT JOIN u{t} u ON u.cl = g.cl AND u.i = g.i
  GROUP BY g.cl
)"""
        )
    return parts, f"a{iters + 1}"


def cluster_keywords(
    docs: DataFrame,
    assignment: DataFrame,
    top: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Label k-means clusters by their top tf·idf terms, treating each
    CLUSTER as the tf·idf "document" — the human-readable face of
    SemDeDup/topic clustering (cluster inspection, boilerplate-sink
    triage, pruning decisions all start from "what IS cluster 17").

    ``assignment``: ``(vec_id, cluster)`` — e.g. :func:`kmeans_assign`
    output, joined to ``docs`` on the id. Plan: one token fan-out, an
    id equi-join onto the (tiny, broadcastable) assignment, ONE
    ``groupBy(cluster, term)`` shuffle, a vocab-sized df aggregate on
    the same exchange, a 1-row cluster-count broadcast, and a per-
    cluster window top-n. idf quantized to 6dp pre-multiply (the
    engine-stable-ranking discipline from ``tfidf_keywords``).

    Output: ``(cluster, rk, term, tf, df, score)``.
    """
    from stock_indicators_etl_spark.llmdata.text import spread, words

    toks = spread(docs).select(
        F.col(id_col).alias("doc_id"), F.explode(words(F.col(text_col))).alias("term")
    )
    a = assignment.select(F.col("vec_id").alias("doc_id"), "cluster")
    tf = (
        toks.join(a, "doc_id")
        .groupBy("cluster", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nn = tf.select("cluster").distinct().agg(F.count(F.lit(1)).alias("n_clusters"))
    p = float(10**6)
    idf_q = (
        F.floor(
            F.log((F.col("n_clusters") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
            * F.lit(p)
            + F.lit(0.5)
        )
        / F.lit(p)
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nn))
        .withColumn("score", F.col("tf") * idf_q)
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top)
        .select("cluster", "rk", "term", "tf", "df", "score")
    )
