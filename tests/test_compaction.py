"""Small-file compaction: file-count math, coalesce-vs-repartition
choice, and content preservation."""

from __future__ import annotations

from pathlib import Path

import pytest

from kafkaconnect_spark.operators.compaction import (
    compact_parquet_dir,
    plan_target_files,
)


def parquet_files(p):
    return [f for f in Path(p).rglob("*.parquet") if f.is_file()]


def test_plan_target_files_math():
    mb = 1024 * 1024
    assert plan_target_files(0) == 1
    assert plan_target_files(256 * mb, 256) == 1
    assert plan_target_files(256 * mb + 1, 256) == 2
    assert plan_target_files(10 * 256 * mb, 256) == 10


def test_compaction_shrinks_files_and_preserves_rows(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.repartition(64).write.parquet(src)  # the small-files pathology
    assert len(parquet_files(src)) == 64

    compact_parquet_dir(spark, src, dst, target_file_mb=256)
    assert len(parquet_files(dst)) == 1  # tiny table -> one file
    back = spark.read.parquet(dst)
    assert back.count() == li.count()
    assert set(back.columns) == set(li.columns)


def test_compaction_refuses_in_place(spark, tmp_path):
    d = str(tmp_path / "d")
    with pytest.raises(ValueError):
        compact_parquet_dir(spark, d, d)
