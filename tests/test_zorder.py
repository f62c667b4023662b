"""Z-order clustering key (functions/zorder.py): bit-interleave
correctness vs a Python Morton reference, and the layout effect —
files sorted by the Morton key carry tight min/max on EVERY keyed
dimension, so a filter on the second dimension prunes files a
leading-column sort cannot."""

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from ocr_intern_spark.functions.zorder import zorder_key, zorder_sorted


def _morton_py(vals, bits):
    key = 0
    d = len(vals)
    for di, v in enumerate(vals):
        for b in range(bits):
            key |= ((v >> b) & 1) << (b * d + di)
    return key


def test_zorder_key_matches_python_reference(spark):
    rows = [(3, 5), (0, 0), (65535, 65535), (1234, 40321), (7, 1)]
    df = spark.createDataFrame(rows, "a int, b int")
    got = [
        r["z"]
        for r in df.select(
            zorder_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
    ]
    assert got == [_morton_py(r, 16) for r in rows]


def test_zorder_rejects_overflow():
    import pytest

    with pytest.raises(ValueError):
        zorder_key(F.col("a"), F.col("b"), F.col("c"), F.col("d"), bits=16)


def _file_ranges(path, col):
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        t = pq.read_table(f, columns=[col])[col].to_pylist()
        if t:
            out.append((min(t), max(t)))
    return out


def test_zorder_layout_prunes_second_dimension(spark, tmp_path):
    # two independent uniform dimensions derived from events
    e = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .select(
            (F.xxhash64("ts") % 1024 + 1024).cast("int").alias("d1"),
            (F.xxhash64("value") % 1024 + 1024).cast("int").alias("d2"),
        )
    )
    n_files = 16
    plain_dir = str(tmp_path / "plain")
    z_dir = str(tmp_path / "zorder")
    # leading-column sort: d2 is unconstrained within every file
    (e.repartitionByRange(n_files, "d1")
     .sortWithinPartitions("d1").write.parquet(plain_dir))
    zorder_sorted(
        e.repartition(n_files), F.col("d1"), F.col("d2"),
        bits=11, partitions=n_files,
    ).write.parquet(z_dir)

    # a narrow predicate on the SECOND dimension: how many files can
    # contain it? (file-level min/max pruning, what parquet stats do)
    lo, hi = 1500, 1549
    plain_ranges = _file_ranges(plain_dir, "d2")
    plain_hit = sum(1 for mn, mx in plain_ranges if mx >= lo and mn <= hi)
    z_ranges = _file_ranges(z_dir, "d2")
    z_hit = sum(1 for mn, mx in z_ranges if mx >= lo and mn <= hi)
    # honest comparison requires BOTH layouts split into many files
    assert len(plain_ranges) == n_files and len(z_ranges) == n_files
    assert plain_hit == n_files          # d1-sort: every file spans d2
    # repartitionByRange samples its bounds with an RDD-id-derived
    # seed, so file boundaries shift by ±1 file between runs (observed
    # hits: 8-9 of 16); assert pruning with a margin, not knife-edge
    assert z_hit <= n_files * 5 // 8     # z-order: most files pruned
    # and the leading dimension still prunes too (z covers both)
    d1_ranges = _file_ranges(z_dir, "d1")
    d1_hit = sum(1 for mn, mx in d1_ranges if mx >= lo and mn <= hi)
    assert d1_hit <= n_files * 5 // 8
