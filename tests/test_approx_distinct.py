"""approx_count_distinct (HLL++): the scale path for count-distinct
(mergeable sketch partials, no per-key value set through the
shuffle). Pin its relative error against the exact count on the
documents fingerprints, at two precision settings."""

from pyspark.sql import functions as F

from ocr_intern_spark.functions.text import fingerprint

SF = "/root/testdata/sf0.01"


def test_hll_error_within_bound(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        fingerprint(F.col("text")).alias("fp")
    )
    exact = d.select(F.count_distinct("fp")).first()[0]
    default_rsd, tight_rsd = 0.05, 0.01
    approx_default = d.select(
        F.approx_count_distinct("fp", default_rsd)
    ).first()[0]
    approx_tight = d.select(
        F.approx_count_distinct("fp", tight_rsd)
    ).first()[0]
    # 3-sigma bounds on the configured relative standard deviation
    assert abs(approx_default - exact) / exact <= 3 * default_rsd
    assert abs(approx_tight - exact) / exact <= 3 * tight_rsd
