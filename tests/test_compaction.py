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


def test_multimodal_null_media_propagates(spark):
    from kafkaconnect_spark.operators.multimodal import (
        extract_image_features,
        frame_sample,
        resize_image,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"abcd")), (2, None)], "doc_id long, media binary"
    )
    rs = {r.doc_id: r for r in resize_image(df, width=2, height=2).collect()}
    assert rs[1].media == b"abcd" and rs[2].media is None  # no fabricated zeros
    fr = frame_sample(df, every_n_bytes=2).collect()
    assert {r.doc_id for r in fr} == {1}  # NULL blob → no frames
    ft = {r.doc_id: r for r in extract_image_features(df).collect()}
    assert ft[2].mean_intensity is None and ft[2].byte_histogram is None
