"""Table-maintenance planning operators (Iceberg-style metadata ops).

The north-rule deployment target is an Iceberg table of 10^12
interleaved documents; keeping such a table healthy is a first-class
pipeline job: streaming ingest + MERGE INTO resume leave a long tail
of small data files that degrade scan planning, so a compaction
planner periodically bins undersized files into rewrite groups
(Iceberg's `rewrite_data_files` binpack strategy).

Everything here is METADATA-plane work: at 100 TB the inputs are the
manifest file listing (~10^6-10^7 rows, one per data file), never the
data itself — so a per-partition window over the file list is the
correct scale shape. For the driver's correctness gate the "file
listing" is synthesized deterministically from the documents table
(file_id = doc_id, partition = source, size = n_chars), which gives
the planner a realistic skewed size distribution without external
data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Iceberg rewrite_data_files-style knobs: target rewrite group size,
# and the small-file admission cut (files >= SMALL_CUT are already
# "big enough" and left alone — Iceberg's min-file-size-bytes).
TARGET_BYTES = 4096
SMALL_CUT = 3072  # 0.75 * TARGET_BYTES


def _files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized manifest listing: one row per data file."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("file_id"),
        F.col("source").alias("part"),
        F.col("n_chars").cast("long").alias("size_bytes"),
    )


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: within each table partition, admit
    files under SMALL_CUT bytes, order them largest-first (first-fit-
    decreasing's sort), and cut rewrite groups by cumulative quota —
    group = ceil(running_bytes / TARGET_BYTES). Groups that end up
    with a single file are dropped (rewriting one file alone buys
    nothing — Iceberg's min-input-files=2 default). Emits one plan
    row per rewrite group with its byte/file totals.

    Scale shape: ONE window partitioned by the table partition over
    the manifest listing — file-count scale (metadata), not data
    scale. No join, no global sort; the per-partition ordering is
    exactly what a driver-side planner would do, pushed down to
    executors. The quota cut makes every group's size land in
    [TARGET - max_small, TARGET + max_small), the binpack contract."""
    f = _files(spark, sf_dir).where(F.col("size_bytes") < SMALL_CUT)
    w = (
        Window.partitionBy("part")
        .orderBy(F.desc("size_bytes"), F.asc("file_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = f.select(
        "part",
        "file_id",
        "size_bytes",
        F.ceil(F.sum("size_bytes").over(w) / F.lit(TARGET_BYTES))
        .cast("long")
        .alias("group_id"),
    )
    return (
        grouped.groupBy("part", "group_id")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("size_bytes").cast("long").alias("group_bytes"),
            F.min("size_bytes").cast("long").alias("min_file_bytes"),
            F.max("size_bytes").cast("long").alias("max_file_bytes"),
        )
        .where(F.col("n_files") >= 2)
        .orderBy("part", "group_id")
    )


_COMPACTION_SQL = f"""
WITH small AS (
  SELECT source AS part, doc_id AS file_id, CAST(n_chars AS BIGINT) AS size_bytes
  FROM documents WHERE n_chars < {SMALL_CUT}
),
grouped AS (
  SELECT part, file_id, size_bytes,
         CAST(ceil(sum(size_bytes) OVER (
             PARTITION BY part ORDER BY size_bytes DESC, file_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) / {TARGET_BYTES}.0) AS BIGINT) AS group_id
  FROM small
)
SELECT part, group_id,
       count(*) AS n_files,
       CAST(sum(size_bytes) AS BIGINT) AS group_bytes,
       CAST(min(size_bytes) AS BIGINT) AS min_file_bytes,
       CAST(max(size_bytes) AS BIGINT) AS max_file_bytes
FROM grouped
GROUP BY part, group_id
HAVING count(*) >= 2
ORDER BY part, group_id
"""


# --- zone-map pruning advisor ------------------------------------------------

FILE_ROWS = 100  # rows per synthesized data file


def q_zonemap_prune_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (file min/max statistics) pruning effectiveness under
    two physical layouts — the sort-layout advisor every Iceberg/
    Parquet deployment runs before paying for a rewrite: cut the
    orders table into FILE_ROWS-row files once in INSERTION order
    (by o_orderkey — dates scattered across every file) and once in
    DATE-SORTED order, compute each file's (min, max) o_orderdate
    zone map, and for each order-year predicate count how many files
    a min/max-overlap scan planner would actually read. The delta
    between the two layouts IS the business case for the sort
    rewrite.

    File assignment uses the distributed two-pass global rank
    (skew.global_rank — range partition + per-partition prefix
    offsets), NEVER an unpartitioned row_number window: at 10^12
    rows the layout simulation must itself scale. At real scale the
    zone maps come straight from the manifest (this query's
    simulation layer exists because the sandbox has no real file
    metadata); the advisor aggregate over (layout, file, year) is
    metadata-plane work either way.

    All outputs are integers; hit rule is the standard half-open
    overlap test min < year_end AND max >= year_start."""
    from ocr_intern_spark.operators.skew import global_rank

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", F.col("o_orderdate").alias("d")
    )
    layouts = []
    for name, order in (
        ("insertion", [F.asc("o_orderkey")]),
        ("date_sorted", [F.asc("d"), F.asc("o_orderkey")]),
    ):
        ranked = global_rank(o, *order, rank_name="rk")
        layouts.append(
            ranked.select(
                F.lit(name).alias("layout"),
                F.floor((F.col("rk") - 1) / FILE_ROWS).cast("long").alias(
                    "file_id"
                ),
                "d",
            )
        )
    files = (
        layouts[0]
        .unionByName(layouts[1])
        .groupBy("layout", "file_id")
        .agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    )
    years = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(F.lit(1995), F.lit(2001))
            ).alias("yr")
        )
        .select(
            "yr",
            F.to_timestamp(F.concat(F.col("yr"), F.lit("-01-01"))).alias(
                "y0"
            ),
            F.to_timestamp(
                F.concat(F.col("yr") + 1, F.lit("-01-01"))
            ).alias("y1"),
        )
    )
    hit = (
        files.crossJoin(F.broadcast(years))
        .groupBy("layout", "yr")
        .agg(
            F.count("*").alias("n_files"),
            F.sum(
                F.when(
                    (F.col("mn") < F.col("y1")) & (F.col("mx") >= F.col("y0")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_hit"),
        )
    )
    return hit.select(
        "layout", F.col("yr").cast("long").alias("yr"), "n_files", "n_hit"
    ).orderBy("layout", "yr")


_ZONEMAP_SQL = f"""
WITH ins AS (
  SELECT (row_number() OVER (ORDER BY o_orderkey) - 1) // {FILE_ROWS}
           AS file_id,
         o_orderdate AS d
  FROM orders
),
srt AS (
  SELECT (row_number() OVER (ORDER BY o_orderdate, o_orderkey) - 1)
           // {FILE_ROWS} AS file_id,
         o_orderdate AS d
  FROM orders
),
files AS (
  SELECT 'insertion' AS layout, file_id, min(d) AS mn, max(d) AS mx
  FROM ins GROUP BY file_id
  UNION ALL
  SELECT 'date_sorted', file_id, min(d), max(d) FROM srt GROUP BY file_id
),
years AS (
  SELECT yr,
         CAST(yr || '-01-01' AS TIMESTAMP) AS y0,
         CAST((yr + 1) || '-01-01' AS TIMESTAMP) AS y1
  FROM (SELECT unnest(range(1995, 2002)) AS yr)
)
SELECT layout, CAST(yr AS BIGINT) AS yr,
       count(*) AS n_files,
       CAST(sum(CASE WHEN mn < y1 AND mx >= y0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hit
FROM files, years
GROUP BY layout, yr
ORDER BY layout, yr
"""


# --- partition skew report -----------------------------------------------------


def q_partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-health report over the table's partition column —
    the metadata view that decides WHEN the skew machinery (salting,
    AQE skew splits) is needed: per partition, file and byte totals
    plus the byte share versus a uniform layout in integer parts-per-
    million (share_ppm = bytes·10⁶ div total; uniform would put every
    partition at 10⁶ div n_partitions). A partition whose skew_ppm —
    share minus uniform — is strongly positive is the hot shard every
    downstream keyed operation inherits.

    Scale shape: one manifest-listing aggregate (metadata-plane, like
    the compaction planner) + a 1-row total broadcast; all integer
    arithmetic."""
    f = _files(spark, sf_dir)
    per = f.groupBy("part").agg(
        F.count("*").alias("n_files"),
        F.sum("size_bytes").cast("long").alias("part_bytes"),
    )
    tot = per.agg(
        F.sum("part_bytes").cast("long").alias("total_bytes"),
        F.count("*").alias("n_parts"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "part",
            "n_files",
            "part_bytes",
            F.expr("part_bytes * 1000000 div total_bytes").alias(
                "share_ppm"
            ),
            F.expr(
                "part_bytes * 1000000 div total_bytes"
                " - 1000000 div n_parts"
            ).alias("skew_ppm"),
        )
        .orderBy("part")
    )


_PARTITION_SKEW_SQL = """
WITH per AS (
  SELECT source AS part, count(*) AS n_files,
         CAST(sum(n_chars) AS BIGINT) AS part_bytes
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(sum(part_bytes) AS BIGINT) AS total_bytes,
         count(*) AS n_parts
  FROM per
)
SELECT part, n_files, part_bytes,
       CAST(part_bytes * 1000000 // total_bytes AS BIGINT) AS share_ppm,
       CAST(part_bytes * 1000000 // total_bytes
            - 1000000 // n_parts AS BIGINT) AS skew_ppm
FROM per CROSS JOIN tot
ORDER BY part
"""


QUERIES = {
    "table_compaction_plan": (q_compaction_plan, _COMPACTION_SQL),
    "table_zonemap_prune_stats": (q_zonemap_prune_stats, _ZONEMAP_SQL),
    "table_partition_skew_report": (
        q_partition_skew_report,
        _PARTITION_SKEW_SQL,
    ),
}
