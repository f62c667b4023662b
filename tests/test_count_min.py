"""Heavy-hitter sketches — the approximate-frequency scale path
(companion to test_approx_distinct's HLL++ pin). Pins the guarantees
a 100 TB deployment relies on:

* count_min_sketch NEVER underestimates and overestimates by at most
  eps·N (per-key w.p. ≥ confidence — checked on every key at a width
  small enough to force real collisions);
* sketches are MERGEABLE: per-partition partials combined give the
  same estimates as one pass (what makes the agg map-side
  combinable);
* stat.freqItems returns a SUPERSET of every item above the support
  threshold (false positives allowed, false negatives not).
"""

from pyspark.sql import functions as F

EPS = 0.05          # width ⌈e/eps⌉ ≈ 55 < 99 distinct keys → collisions
CONF = 0.99
SEED = 42
N = 10_000


def _stream(spark):
    """Skewed token stream: 'hot' 50%, 'warm' ~17%, 97-key tail."""
    return spark.range(N).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .when(F.col("id") % 3 == 0, F.lit("warm"))
        .otherwise(
            F.concat(F.lit("w"), (F.col("id") % 97).cast("string"))
        )
        .alias("tok")
    )


def _read_cms(spark, raw: bytes):
    jvm = spark.sparkContext._jvm
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(raw)
    )


def _sketch_bytes(df):
    [row] = df.agg(
        F.count_min_sketch(
            "tok", F.lit(EPS), F.lit(CONF), F.lit(SEED)
        ).alias("s")
    ).collect()
    return bytes(row["s"])


def test_count_min_error_bounds(spark):
    df = _stream(spark)
    exact = {r["tok"]: r["count"] for r in df.groupBy("tok").count().collect()}
    cms = _read_cms(spark, _sketch_bytes(df))
    assert cms.totalCount() == N
    over = 0
    for tok, cnt in exact.items():
        est = cms.estimateCount(tok)
        assert est >= cnt, (tok, est, cnt)  # CM never undercounts
        assert est - cnt <= EPS * N, (tok, est, cnt)
        over += est > cnt
    assert over > 0  # the width genuinely forces collisions


def test_count_min_partials_merge_exactly(spark):
    df = _stream(spark)
    whole = _read_cms(spark, _sketch_bytes(df))
    a = _read_cms(spark, _sketch_bytes(df.where(F.col("tok") != "hot")))
    b = _read_cms(spark, _sketch_bytes(df.where(F.col("tok") == "hot")))
    a.mergeInPlace(b)
    exact = {r["tok"]: r["count"] for r in df.groupBy("tok").count().collect()}
    assert a.totalCount() == whole.totalCount() == N
    for tok in exact:
        assert a.estimateCount(tok) == whole.estimateCount(tok), tok


def test_freq_items_superset_guarantee(spark):
    df = _stream(spark)
    exact = {r["tok"]: r["count"] for r in df.groupBy("tok").count().collect()}
    support = 0.15
    [row] = df.stat.freqItems(["tok"], support).collect()
    got = set(row[0])
    must_have = {t for t, c in exact.items() if c / N > support}
    assert must_have == {"hot", "warm"}
    assert must_have <= got, (must_have, got)
