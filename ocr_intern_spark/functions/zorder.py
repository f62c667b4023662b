"""Z-order (Morton) clustering key — the multi-dimensional data-
layout lever behind Delta/Iceberg `OPTIMIZE ZORDER BY`: sorting a
table by the bit-interleaved key co-locates rows that are close in
EVERY keyed dimension, so parquet row-group/file min-max stats prune
scans filtered on ANY of the dimensions (a plain sort only prunes its
leading column).

Pure Catalyst bit arithmetic — a constant expression tree of shifts
and masks per bit, whole-stage-codegen friendly, no UDF. The caller
pre-scales each dimension to an unsigned integer domain (bucket ids,
epoch minutes, price cents...); at 100 TB the scaling constants come
from a cheap min/max pre-pass or static domain knowledge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(*cols: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` bits of each (non-negative integral)
    column into one BIGINT Morton key: with D dimensions, bit b of
    dimension d lands at position b*D + d. D*bits must be ≤ 63."""
    d = len(cols)
    if d * bits > 63:
        raise ValueError(f"{d} dims × {bits} bits exceeds a signed BIGINT")
    key = F.lit(0).cast("long")
    for di, c in enumerate(cols):
        x = c.cast("long")
        for b in range(bits):
            key = key + (
                F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), b * d + di)
            )
    return key


def zorder_sorted(
    df: DataFrame, *cols: Column, bits: int = 16, partitions: int | None = None
) -> DataFrame:
    """Repartition-by-range + sort on the Morton key — the write-side
    layout pass (one range shuffle; files then carry tight min/max on
    every keyed dimension). `partitions` should be set to the target
    FILE count: without an explicit count AQE may coalesce the range
    shuffle into few fat partitions, which trades the pruning
    granularity away (observed: 16 requested → 1 file at test scale)."""
    keyed = df.withColumn("_z", zorder_key(*cols, bits=bits))
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(n, "_z").sortWithinPartitions("_z").drop("_z")
    )
