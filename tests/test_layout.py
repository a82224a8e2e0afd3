"""Z-order layout (sources/layout.py): measured pruning from real
parquet footer statistics — z-order must make BOTH columns prunable
while the linear baseline prunes only its sort column."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from stock_indicators_etl_spark.sources.layout import (
    file_skip_stats,
    write_linear,
    write_zordered,
    zorder_value,
)

N_FILES = 16


@pytest.fixture(scope="module")
def xy_df(spark):
    rng = np.random.default_rng(21)
    n = 40_000
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "x": rng.uniform(0, 1000, n),
                "y": rng.uniform(0, 1000, n),
                "payload": rng.integers(0, 1 << 30, n),
            }
        )
    )


def test_zorder_value_is_bounded_and_deterministic(spark, xy_df):
    z = zorder_value(xy_df.limit(500), ["x", "y"], bits=4)
    stats = z.agg(
        F.min("_zorder").alias("lo"), F.max("_zorder").alias("hi")
    ).collect()[0]
    assert 0 <= stats["lo"] <= stats["hi"] < (1 << 8)  # 2 cols × 4 bits


def test_zorder_rejects_too_many_bits(spark, xy_df):
    with pytest.raises(ValueError):
        zorder_value(xy_df, ["x", "y"], bits=31)


def test_zorder_prunes_both_dimensions(spark, xy_df, tmp_path):
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_zordered(xy_df, zpath, ["x", "y"], n_files=N_FILES, bits=8)
    write_linear(xy_df, lpath, "x", n_files=N_FILES)

    # row preservation + helper column dropped
    back = spark.read.parquet(zpath)
    assert back.count() == xy_df.count()
    assert "_zorder" not in back.columns

    # a 5%-wide range predicate on each dimension
    qx = file_skip_stats(zpath, "x", 100.0, 150.0)
    qy = file_skip_stats(zpath, "y", 100.0, 150.0)
    lx = file_skip_stats(lpath, "x", 100.0, 150.0)
    ly = file_skip_stats(lpath, "y", 100.0, 150.0)

    assert qx["n_files"] == N_FILES
    # linear layout: near-perfect on its sort column, nothing on the other
    assert lx["skipped"] >= N_FILES - 2
    assert ly["skipped"] == 0
    # z-order: substantial pruning on BOTH dimensions (16 files over a
    # 16x16 top-level z-grid -> a 5% slab touches ~half the files)
    assert qx["skipped"] >= N_FILES // 4
    assert qy["skipped"] >= N_FILES // 4


def test_zorder_string_column_equality_pruning(spark, tmp_path):
    rng = np.random.default_rng(5)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [f"key{i % 64}" for i in range(20_000)],
                "v": rng.uniform(0, 100, 20_000),
            }
        )
    )
    path = str(tmp_path / "zs")
    write_zordered(df, path, ["k", "v"], n_files=8, bits=6)
    assert spark.read.parquet(path).count() == 20_000


def test_compact_parquet_reduces_files(spark, tmp_path):
    from stock_indicators_etl_spark.sources.layout import (
        compact_parquet,
        read_table,
    )

    rng = np.random.default_rng(7)
    path = str(tmp_path / "frag")
    # simulate an append-heavy table: 12 tiny appends
    for i in range(12):
        pdf = pd.DataFrame(
            {"k": rng.integers(0, 100, 500), "v": rng.uniform(0, 1, 500)}
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)
    before = spark.read.parquet(path)
    n_rows = before.count()
    checksum = before.agg(F.sum(F.crc32(F.col("k").cast("string")))).collect()[0][0]

    stats = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert stats["files_before"] >= 12
    assert stats["files_after"] == 1
    assert stats["version"].startswith("v_00000001_")

    after = read_table(spark, path)
    assert after.count() == n_rows
    got = after.agg(F.sum(F.crc32(F.col("k").cast("string")))).collect()[0][0]
    assert got == checksum  # content preserved exactly

    # second compaction bumps the version; the previous one is
    # retained (keep_versions=1) for in-flight readers
    stats2 = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert stats2["version"].startswith("v_00000002_")
    assert read_table(spark, path).count() == n_rows
    import os

    dirs = sorted(d for d in os.listdir(path) if d.startswith("v_"))
    assert len(dirs) == 2  # v1 kept as predecessor, v2 live


def test_compact_parquet_resorted_keeps_pruning(spark, tmp_path):
    from stock_indicators_etl_spark.sources.layout import (
        compact_parquet,
        file_skip_stats,
    )

    rng = np.random.default_rng(8)
    path = str(tmp_path / "frag2")
    for i in range(8):
        pdf = pd.DataFrame({"x": rng.uniform(0, 1000, 2000)})
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)
    # compact into 4 range-sorted files: pruning on x survives
    # (file_skip_stats resolves the _current pointer)
    compact_parquet(spark, path, target_file_bytes=12_000, sort_col="x")
    stats = file_skip_stats(path, "x", 100.0, 150.0)
    assert stats["n_files"] >= 2
    assert stats["skipped"] >= stats["n_files"] - 2


def _frag_table(spark, path, n_appends=4, seed=9):
    rng = np.random.default_rng(seed)
    for _ in range(n_appends):
        pdf = pd.DataFrame({"k": rng.integers(0, 100, 300)})
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)
    return spark.read.parquet(path).count()


def test_compact_crash_before_pointer_flip_keeps_readers_live(
    spark, tmp_path, monkeypatch
):
    """Crash window 1: the new version dir is fully written but the
    pointer flip never happens. The live pointer — and therefore
    every reader — is untouched; the orphan dir is GC'd by the next
    successful run."""
    import os

    from stock_indicators_etl_spark.sources import layout

    path = str(tmp_path / "t")
    n_rows = _frag_table(spark, path)
    layout.compact_parquet(spark, path, target_file_bytes=1 << 30)
    live_before = layout.current_table_path(path)

    def boom(*a, **k):
        raise OSError("simulated crash before pointer flip")

    monkeypatch.setattr(layout, "_flip_pointer", boom)
    with pytest.raises(OSError):
        layout.compact_parquet(spark, path, target_file_bytes=1 << 30)
    monkeypatch.undo()

    # reader view is completely unaffected
    assert layout.current_table_path(path) == live_before
    assert layout.read_table(spark, path).count() == n_rows
    # orphan v2 exists now; the next successful run collects it
    dirs = sorted(d for d in os.listdir(path) if d.startswith("v_"))
    assert len(dirs) == 2
    stats = layout.compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert any(d.startswith("v_00000002_") for d in stats["gc"])
    assert layout.read_table(spark, path).count() == n_rows


def test_compact_crash_after_flip_before_gc_is_self_healing(
    spark, tmp_path, monkeypatch
):
    """Crash window 2: the pointer flipped but GC never ran. Readers
    already see the new version; stale dirs linger until the next
    run collects them."""
    import os

    from stock_indicators_etl_spark.sources import layout

    path = str(tmp_path / "t2")
    n_rows = _frag_table(spark, path, seed=10)
    layout.compact_parquet(spark, path, target_file_bytes=1 << 30)

    def boom(*a, **k):
        raise OSError("simulated crash after flip, before GC")

    monkeypatch.setattr(layout, "_gc_versions", boom)
    with pytest.raises(OSError):
        layout.compact_parquet(spark, path, target_file_bytes=1 << 30)
    monkeypatch.undo()

    # the flip already published v2 — readers moved forward atomically
    assert "_00000002_" in layout.current_table_path(path)
    assert layout.read_table(spark, path).count() == n_rows
    # next run: v3 live, v2 kept as predecessor, v1 collected
    layout.compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert "_00000003_" in layout.current_table_path(path)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("v_"))
    assert [d[:11] for d in dirs] == ["v_00000002_", "v_00000003_"]
    assert layout.read_table(spark, path).count() == n_rows
