"""Hot-key skew patterns for aggregation.

Spark's map-side partial HashAggregate already collapses hot keys for
ALGEBRAIC aggregates (sum/count/min/max) before the shuffle, so plain
`groupBy(k).sum()` rarely skews. The patterns here cover the cases
partials do NOT fix:

* exact distinct counts — `groupBy(k).agg(countDistinct(v))` carries
  the hot key's whole value SET through the shuffle to one reducer;
* holistic aggregates (collect_list/set, exact percentiles) — per-key
  state is O(group size) and lands on one reducer;
* downstream of a skewed JOIN key (AQE skew-join splits the join, but
  a following single-key aggregation re-concentrates).

The reference has no aggregation skew surface (single-machine); this
is part of the 100 TB design layer, next to the span-level explode +
hash(media_ref) repartition in `operators/extract.py`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def skew_safe_distinct_count(
    df: DataFrame, key: str, value: str
) -> DataFrame:
    """Exact per-key distinct count in two phases: (1) dedupe on
    (key, value) — the exchange hash-partitions on BOTH columns, so a
    hot key's values spread across ALL reducers; (2) count rows per
    key — phase-2 input is one row per distinct value, already
    collapsed. No reducer ever holds a hot key's full value set.
    Output: (key, n_distinct)."""
    return (
        df.select(key, value)
        .distinct()
        .groupBy(key)
        .agg(F.count("*").alias("n_distinct"))
    )


def salted_agg(
    df: DataFrame,
    key: str,
    agg_col: Column,
    merge_col,
    alias: str,
    n_salts: int = 32,
)  -> DataFrame:
    """Generic two-phase salted aggregation for decomposable
    aggregates: phase 1 groups by (key, salt) — n_salts reducers share
    each hot key — phase 2 merges the per-salt partials. `agg_col` is
    the phase-1 aggregate expression, `merge_col` a callable mapping
    the partial column to the phase-2 merge expression (sum for
    sum/count, min for min, ...).

    The salt is content-derived (xxhash64 over the full row), so a
    re-executed map task under partial stage retry routes every row to
    the SAME (key, salt) group it chose the first time — partials are
    bit-stable and rows can't double-count or drop across groups (the
    SPARK-23207 failure class that nondeterministic salts such as
    monotonically_increasing_id or rand are exposed to). Identical
    duplicate rows sharing a salt is harmless: decomposable aggregates
    merge the same either way, and n_salts reducers still share each
    hot key as long as the hot key's VALUES vary.

    Example: salted_agg(df, "k", F.count("*"), F.sum, "n")"""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts))
    )
    part = salted.groupBy(key, "_salt").agg(agg_col.alias("_partial"))
    return part.groupBy(key).agg(merge_col("_partial").alias(alias))


def global_rank(
    df: DataFrame,
    *order: Column,
    rank_name: str = "rank",
    partitions: int | None = None,
) -> DataFrame:
    """Exact dense global 1..N row numbering under a total order,
    WITHOUT the single-reducer `Window.orderBy(...)` that Spark falls
    back to when no partition key is given (the "No Partition Defined"
    WindowExec that moves the whole frame through one task — fine at
    10^5 rows, fatal at a 10^9-row vocabulary).

    Two-pass range-partitioned rank, the distributed-sort classic:

      1. `repartitionByRange` on the order columns (sampled range
         boundaries — one shuffle, the same exchange a global sort
         plans), then sort within each partition;
      2. per-partition row counts → prefix-sum offsets (a frame of
         exactly `partitions` rows — bounded by config, not data —
         so ITS window is the documented bounded class);
      3. global rank = partition offset + intra-partition row_number
         (the row_number window partitions by spark_partition_id, so
         every frame is ~N/partitions rows).

    The order must be TOTAL (caller passes a tie-breaking column set),
    otherwise ranks within a tie are boundary-dependent.
    """
    from pyspark.sql.window import Window

    from pyspark import StorageLevel

    p = partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(p, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
        # MATERIALIZED between the two passes (TeraSort-style): _pid is
        # only meaningful if the counts subtree and the join subtree see
        # the SAME physical partitioning. Without this, AQE may plan the
        # two instances of the range exchange independently (reuse is an
        # optimization, not a guarantee) and coalesce them differently —
        # observed: duplicate ranks under a union of two global_rank
        # branches. At petabyte scale the materialization is a bucketed
        # table write; the algorithm is two-pass either way.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = parted.groupBy("_pid").agg(F.count("*").alias("_m"))
    # bounded-window: frame is exactly `partitions` rows (config, not data)
    offsets = counts.select(
        "_pid",
        F.coalesce(
            F.sum("_m").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_off"),
    )
    local = F.row_number().over(Window.partitionBy("_pid").orderBy(*order))
    return (
        parted.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_name, (F.col("_off") + local).cast("long"))
        .drop("_pid", "_off")
    )


def pareto_front(
    df: DataFrame,
    x: str,
    y: str,
    partitions: int | None = None,
) -> DataFrame:
    """2-D skyline (maximize BOTH columns) without a global window:
    rows not dominated by any other row (dominated = other has
    ``x' ≥ x`` and ``y' ≥ y`` with at least one strict).

    The textbook single-node skyline sorts by x desc and keeps rows
    that raise the running max of y — a sequential scan, i.e. the
    same single-reducer `Window.orderBy(...)` class global_rank
    exists to avoid. Distributed shape (two-pass, TeraSort-style,
    mirroring global_rank):

      1. per-x group max of y (one map-side-combinable exchange) —
         the skyline only ever contains a group's max-y row(s);
      2. range-partition the DISTINCT-x frame by x desc, then the
         strict running max M(x) = max{ y' : x' > x } decomposes as
         max(earlier-partition maxes — a `partitions`-row broadcast
         frame, prefix via a bounded window — and the partition-LOCAL
         preceding-rows window, whose frame is ~|distinct x| / P);
      3. keep groups with gmax > M(x) (ties inside a group all
         survive: equal points do not dominate each other), then a
         semi-join back to the input picks the surviving rows.

    The order must make x distinct per group key (it is: pass 1
    grouped on x), so preceding-rows = strictly-greater-x exactly.
    """
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    p = partitions or df.sparkSession.sparkContext.defaultParallelism
    gmax = df.groupBy(x).agg(F.max(y).alias("_gmax"))
    parted = (
        gmax.repartitionByRange(p, F.desc(x))
        .sortWithinPartitions(F.desc(x))
        .withColumn("_pid", F.spark_partition_id())
        # materialized between passes for the same reason as
        # global_rank: _pid must mean ONE physical partitioning
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pmax = parted.groupBy("_pid").agg(F.max("_gmax").alias("_pm"))
    # bounded-window: frame is exactly `partitions` rows (config, not data)
    pref = pmax.select(
        "_pid",
        F.max("_pm")
        .over(
            Window.orderBy("_pid").rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
        .alias("_prefmax"),
    )
    run = F.max("_gmax").over(
        Window.partitionBy("_pid")
        .orderBy(F.desc(x))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    kept = (
        parted.join(F.broadcast(pref), "_pid")
        .withColumn("_runmax", run)
        .withColumn("_m", F.greatest(F.col("_prefmax"), F.col("_runmax")))
        .where(F.col("_m").isNull() | (F.col("_gmax") > F.col("_m")))
        .select(x, F.col("_gmax").alias(y))
    )
    return df.join(kept, [x, y], "left_semi")


def global_prefix_sum(
    df: DataFrame,
    value: str,
    *order: Column,
    sum_name: str = "prefix_sum",
    partitions: int | None = None,
) -> DataFrame:
    """Exact EXCLUSIVE global running sum of ``value`` under a total
    order — the scan primitive behind sequential shard packing,
    offset assignment and cumulative budgets — without the
    single-reducer `Window.orderBy(...)` fallback (same motivation
    and same two-pass range-partitioned shape as global_rank):

      1. range-partition + sort on the order columns, MATERIALIZED so
         both passes see one physical partitioning;
      2. per-partition value sums → prefix offsets (a `partitions`-row
         bounded frame);
      3. prefix = partition offset + intra-partition exclusive
         running sum (partition-local window).

    The order must be total or tied rows get boundary-dependent
    prefixes."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    p = partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(p, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sums = parted.groupBy("_pid").agg(F.sum(value).alias("_m"))
    # bounded-window: frame is exactly `partitions` rows (config, not data)
    offsets = sums.select(
        "_pid",
        F.coalesce(
            F.sum("_m").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_off"),
    )
    local = F.coalesce(
        F.sum(value).over(
            Window.partitionBy("_pid")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return (
        parted.join(F.broadcast(offsets), "_pid")
        .withColumn(sum_name, (F.col("_off") + local).cast("long"))
        .drop("_pid", "_off")
    )
