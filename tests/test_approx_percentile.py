"""approx_percentile (Greenwald-Khanna-style quantile summary): the
scale path for exact per-group quantiles (q_events_value_quantiles
names it as the swap). Pin its rank-error guarantee against the exact
percentiles: with accuracy parameter A, the returned value's RANK is
within n/A of the target rank — the sketch's documented contract."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_percentile_rank_error_within_accuracy(spark):
    e = spark.read.parquet(f"{SF}/events.parquet").select("value")
    n = e.count()
    vals = sorted(r["value"] for r in e.collect())

    for accuracy in (100, 10_000):
        got = e.select(
            F.percentile_approx(
                "value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
                F.lit(accuracy),
            ).alias("p")
        ).first()["p"]
        for target, v in zip((0.5, 0.9, 0.99), got):
            # rank of the returned value in the exact sorted data
            import bisect

            lo = bisect.bisect_left(vals, v)
            hi = bisect.bisect_right(vals, v)
            target_rank = target * n
            err_bound = n / accuracy + 1
            assert lo - err_bound <= target_rank <= hi + err_bound, (
                accuracy, target, v, lo, hi, target_rank,
            )


def test_approx_percentile_tight_accuracy_matches_exact(spark):
    """At accuracy >= n the sketch holds every value: result equals
    the exact percentile (discrete, no interpolation)."""
    e = spark.read.parquet(f"{SF}/events.parquet").select("value")
    n = e.count()
    approx = e.select(
        F.percentile_approx("value", F.lit(0.5), F.lit(max(n, 10_000))).alias("m")
    ).first()["m"]
    vals = sorted(r["value"] for r in e.collect())
    # exact discrete median: element at ceil(0.5*n)-1 (rank semantics)
    candidates = {vals[max(0, int(0.5 * n) - 1)], vals[int(0.5 * n)]}
    assert approx in candidates
