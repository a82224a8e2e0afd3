"""Z-order (Morton) data layout for multi-dimensional file pruning.

North-star surface (reference N/A — the reference writes one gzip CSV
per day, ``etl.py``; this is what its sink needs to become at 100 TB).
A single-column sort gives parquet min/max pruning on that column
only; interleaving the bits of several columns' rank-buckets gives a
space-filling-curve order in which EVERY interleaved column has tight
per-file min/max ranges, so a reader's range predicate on any of them
skips most files (the layout Delta's OPTIMIZE ZORDER BY popularized;
built here from plain Spark primitives).

Plan shape: bucket boundaries come from ``approxQuantile`` (a
driver-bounded array of ≤ 2^bits values per column — the only
driver-side data); bucketing is a fold over that literal array,
bit-interleaving is a chain of shift/and/or Column expressions — all
JVM-side, scan-local. The only shuffle is the final
``repartitionByRange`` on the z-value, which is exactly the shuffle
any layout rewrite must pay. Verification reads parquet footer
statistics back with pyarrow (:func:`file_skip_stats`) — pruning is
measured, not assumed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_col(df: DataFrame, col: str, bits: int) -> Column:
    """Rank-bucket a column to 0..2^bits−1 via approx-quantile
    boundaries (numeric) or a top-bits hash slice (strings — equality
    pruning only; hashing has no range locality)."""
    dtype = dict(df.dtypes)[col]
    n_buckets = 1 << bits
    if dtype == "string":
        # non-negative 64-bit hash → top bits
        h = F.abs(F.xxhash64(F.col(col)))
        return F.shiftright(h, 63 - bits).bitwiseAND(F.lit(n_buckets - 1))
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.approxQuantile(col, probs, 0.001)
    # strictly increasing boundary list (duplicates collapse buckets)
    uniq: list[float] = []
    for b in bounds:
        if not uniq or b > uniq[-1]:
            uniq.append(b)
    arr = F.array(*[F.lit(float(b)) for b in uniq])
    x = F.col(col).cast("double")
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, bv: acc + F.when(x >= bv, F.lit(1)).otherwise(F.lit(0)),
    )


def zorder_value(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Add a ``_zorder`` column: the Morton interleave of each
    column's rank-bucket. k·bits total bits (keep k·bits ≤ 60)."""
    k = len(cols)
    if not (0 < k * bits <= 60):
        raise ValueError("need 0 < len(cols)*bits <= 60")
    buckets = [_bucket_col(df, c, bits).cast("long") for c in cols]
    z = F.lit(0).cast("long")
    for i, b in enumerate(buckets):
        for j in range(bits):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * k + i))
    return df.withColumn("_zorder", z)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 8,
) -> None:
    """Write ``df`` as ``n_files`` parquet files in z-order: range
    partition on the z-value (one shuffle), sort within each file,
    drop the helper column at the sink."""
    zdf = zorder_value(df, cols, bits=bits)
    (
        zdf.repartitionByRange(n_files, F.col("_zorder"))
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_linear(df: DataFrame, path: str, col: str, n_files: int = 8) -> None:
    """Single-column range layout (the baseline z-order is compared
    against): tight stats on ``col`` only."""
    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_skip_stats(path: str, col: str, lo, hi) -> dict:
    """Measure pruning from parquet footers (pyarrow, no Spark): how
    many FILES a reader with predicate ``col BETWEEN lo AND hi`` can
    skip outright from min/max statistics — the same stats Spark's
    scan and any lakehouse manifest use. Accepts a plain parquet dir
    or a versioned table root (resolves the ``_current`` pointer)."""
    import pyarrow.parquet as pq
    from pathlib import Path

    root = Path(path)
    ptr = root / _POINTER
    if ptr.is_file():
        root = root / ptr.read_text().strip()
    files = sorted(p for p in root.glob("*.parquet"))
    skipped = 0
    for f in files:
        md = pq.ParquetFile(str(f)).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            rgmd = md.row_group(rg)
            for ci in range(rgmd.num_columns):
                cmd = rgmd.column(ci)
                if cmd.path_in_schema == col and cmd.statistics is not None:
                    s = cmd.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is not None and (fmax < lo or fmin > hi):
            skipped += 1
    return {"n_files": len(files), "skipped": skipped}


# ---------------------------------------------------------------------------
# versioned-table compaction (pointer-file layout)
# ---------------------------------------------------------------------------

#: pointer file at the table root naming the live version directory —
#: the one-file poor-man's manifest (what a lakehouse table format
#: keeps in its transaction log).
_POINTER = "_current"


def _table_fs(path: str):
    from pyarrow import fs as pafs

    filesystem, fspath = pafs.FileSystem.from_uri(path)
    return filesystem, fspath.rstrip("/")


def _read_pointer(filesystem, root: str) -> str | None:
    from pyarrow import fs as pafs

    ptr = root + "/" + _POINTER
    info = filesystem.get_file_info(ptr)
    if info.type != pafs.FileType.File:
        return None
    with filesystem.open_input_stream(ptr) as f:
        return f.read().decode("utf-8").strip()


def _flip_pointer(filesystem, root: str, version: str, tag: str) -> None:
    """Publish ``version`` as live: write a temp pointer file, then
    one rename onto ``_current``. On POSIX/HDFS the rename is atomic —
    a reader sees either the old pointer or the new, never a missing
    or partial one. (On object stores pyarrow's move is copy+delete;
    there the real fix is a conditional-put manifest — documented
    limitation, same one every file-pointer layout has.)"""
    tmp = root + f"/{_POINTER}._tmp_{tag}"
    with filesystem.open_output_stream(tmp) as f:
        f.write(version.encode("utf-8"))
    filesystem.move(tmp, root + "/" + _POINTER)


def _gc_versions(filesystem, root: str, live: str, keep_versions: int) -> list[str]:
    """Delete version dirs superseded by ``live``, retaining the
    ``keep_versions`` most recent predecessors for in-flight readers
    that resolved the pointer before the flip. Orphan dirs from
    crashed compactions (never referenced by the pointer) are also
    collected. Returns the deleted names."""
    from pyarrow import fs as pafs

    sel = pafs.FileSelector(root)
    dirs = sorted(
        i.base_name
        for i in filesystem.get_file_info(sel)
        if i.type == pafs.FileType.Directory and i.base_name.startswith("v_")
    )
    if live not in dirs:  # pointer points elsewhere — do not guess
        return []

    def _vidx(name: str) -> int:
        return int(name.split("_")[1])

    # compare by VERSION INDEX, not by full name: a crashed run's
    # orphan carries the SAME index as the next successful run's live
    # dir with a different random tag, and the lexical comparison
    # collected it only when the tag happened to sort higher (a 50/50
    # test flake that was a real GC leak — r9)
    live_idx = _vidx(live)
    older = [d for d in dirs if _vidx(d) < live_idx]
    stale = older[: max(len(older) - keep_versions, 0)]
    # crashed-run orphans: same-or-higher index, never the live dir
    stale += [d for d in dirs if _vidx(d) >= live_idx and d != live]
    for d in stale:
        filesystem.delete_dir(root + "/" + d)
    return stale


def current_table_path(path: str) -> str:
    """Resolve a versioned table root to its live data directory (the
    path ``spark.read.parquet`` should scan). A root without a
    pointer file is a legacy flat layout and resolves to itself."""
    filesystem, root = _table_fs(path)
    v = _read_pointer(filesystem, root)
    return path.rstrip("/") if v is None else path.rstrip("/") + "/" + v


def read_table(spark, path: str) -> DataFrame:
    """Read a (possibly versioned) parquet table at its live version."""
    return spark.read.parquet(current_table_path(path))


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
    keep_versions: int = 1,
) -> dict:
    """Small-file compaction — the maintenance job every append-heavy
    100 TB table needs (each streaming trigger / incremental append
    leaves files far below the efficient scan size; thousands of tiny
    files serialize listing and scheduling).

    Layout: VERSIONED DIRECTORIES + A POINTER FILE. Live data sits in
    ``<root>/v_<n>_<tag>/``; ``<root>/_current`` names that directory.
    Each compaction (1) writes a complete new version dir, (2)
    verifies its listing is non-empty, (3) publishes it with one
    atomic pointer rename, (4) garbage-collects superseded versions,
    retaining ``keep_versions`` predecessors for readers that
    resolved the pointer just before the flip. Readers go through
    :func:`read_table` / :func:`current_table_path`.

    Crash-safety at every window (pinned by the crash-window tests):
    a crash before the flip leaves the pointer (and the data it names)
    untouched — the orphan new-version dir is GC'd by the next run; a
    crash during the flip leaves at worst a stray temp pointer file;
    a crash after the flip but before GC leaves extra old versions
    that the next run collects. At no point does the live path go
    missing — the failure mode of the previous two-step-rename swap.

    A FIRST compaction of a legacy flat directory bootstraps the
    layout: the compacted copy becomes ``v_1``, the pointer is
    written, and the flat files are deleted after the flip (from then
    on, read via :func:`read_table`).

    Writers: still one compactor at a time (two concurrent runs could
    GC each other's unpublished output); readers need no coordination.
    Filesystem access is through ``pyarrow.fs`` resolved from the
    path's URI — public API only, no Spark ``_jvm`` internals.
    """
    import uuid

    from pyarrow import fs as pafs

    filesystem, root = _table_fs(path)

    def _parquet_infos(p: str):
        sel = pafs.FileSelector(p)
        return [
            i
            for i in filesystem.get_file_info(sel)
            if i.type == pafs.FileType.File and i.path.endswith(".parquet")
        ]

    live = _read_pointer(filesystem, root)
    src_fs = root if live is None else root + "/" + live
    src_spark = path.rstrip("/") if live is None else path.rstrip("/") + "/" + live
    files = _parquet_infos(src_fs)
    total = sum(i.size for i in files)
    n_out = max(
        int(total // target_file_bytes) + (1 if total % target_file_bytes else 0), 1
    )

    df = spark.read.parquet(src_spark)
    if sort_col is not None:
        out = df.repartitionByRange(n_out, F.col(sort_col)).sortWithinPartitions(
            sort_col
        )
    else:
        out = df.coalesce(n_out) if n_out < len(files) else df

    tag = uuid.uuid4().hex[:8]
    idx = int(live.split("_")[1]) + 1 if live is not None else 1
    version = f"v_{idx:08d}_{tag}"
    out.write.mode("overwrite").parquet(path.rstrip("/") + "/" + version)

    after = _parquet_infos(root + "/" + version)
    if not after:
        # never publish an empty listing; the live pointer is untouched
        filesystem.delete_dir(root + "/" + version)
        raise RuntimeError(
            f"compact_parquet: compacted output at {root}/{version} listed "
            "empty; pointer left on the previous version"
        )
    _flip_pointer(filesystem, root, version, tag)
    if live is None:
        # bootstrap: drop the legacy flat files now that v_1 is live
        for i in files:
            filesystem.delete_file(i.path)
    gone = _gc_versions(filesystem, root, version, keep_versions)
    return {
        "files_before": len(files),
        "files_after": len(after),
        "bytes": total,
        "version": version,
        "gc": gone,
    }
