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
    scan and any lakehouse manifest use."""
    import pyarrow.parquet as pq
    from pathlib import Path

    files = sorted(p for p in Path(path).glob("*.parquet"))
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


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
) -> dict:
    """Small-file compaction — the maintenance job every append-heavy
    100 TB table needs (each streaming trigger / incremental append
    leaves files far below the efficient scan size; thousands of tiny
    files serialize listing and scheduling).

    Reads the directory, sizes the output file count from the actual
    on-disk bytes (never fewer than 1), rewrites to a temp dir —
    optionally re-sorted so min/max pruning survives compaction — and
    swaps via a TWO-STEP rename (old→backup, temp→live). The swap is
    NOT atomic: a crash between the renames leaves the table path
    absent with the data intact in the ``._old_*`` backup, and
    concurrent readers fail during the window — run it as the table's
    exclusive maintenance job (a lakehouse manifest/pointer is the
    real fix at 100 TB). The backup is deleted only AFTER the new live
    listing is verified non-empty; on verification failure the backup
    is restored and an error raised. Returns before/after file counts.

    Filesystem access is through ``pyarrow.fs`` resolved from the
    path's URI (local, HDFS, S3...) — public API only, no Spark
    ``_jvm`` internals.
    """
    import uuid

    from pyarrow import fs as pafs

    filesystem, fspath = pafs.FileSystem.from_uri(path)
    fspath = fspath.rstrip("/")

    def _parquet_infos(p: str):
        sel = pafs.FileSelector(p)
        return [
            i
            for i in filesystem.get_file_info(sel)
            if i.type == pafs.FileType.File and i.path.endswith(".parquet")
        ]

    files = _parquet_infos(fspath)
    total = sum(i.size for i in files)
    n_out = max(int(total // target_file_bytes) + (1 if total % target_file_bytes else 0), 1)

    df = spark.read.parquet(path)
    if sort_col is not None:
        out = df.repartitionByRange(n_out, F.col(sort_col)).sortWithinPartitions(
            sort_col
        )
    else:
        out = df.coalesce(n_out) if n_out < len(files) else df
    tag = uuid.uuid4().hex[:8]
    tmp = fspath + f"._compact_{tag}"
    out.write.mode("overwrite").parquet(path.rstrip("/") + f"._compact_{tag}")

    bak = fspath + f"._old_{tag}"
    filesystem.move(fspath, bak)
    filesystem.move(tmp, fspath)
    after = _parquet_infos(fspath)
    if not after:
        # restore the backup rather than stranding the table
        filesystem.move(fspath, tmp)
        filesystem.move(bak, fspath)
        raise RuntimeError(
            f"compact_parquet: swapped-in listing at {fspath} is empty; "
            f"backup restored, compacted output left at {tmp}"
        )
    filesystem.delete_dir(bak)
    return {"files_before": len(files), "files_after": len(after), "bytes": total}
