"""Stream-stream interval join: purchases match the signup that
preceded them within the horizon, across micro-batches (the signup is
buffered in join state until the purchase arrives)."""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_intern_spark.streaming.extract_stream import stream_interval_join

T0 = dt.datetime(2024, 1, 1, 12, 0)


def _write(d, i, cols):
    pq.write_table(pa.table(cols), str(d / f"part-{i}.parquet"))


def test_purchase_signup_interval_join(spark, tmp_path):
    pdir = tmp_path / "purchases"
    sdir = tmp_path / "signups"
    pdir.mkdir(); sdir.mkdir()

    # signups: u1 at T0; u2 at T0+1h; u1 again (re-signup) at T0+30d
    _write(sdir, 0, {"user_id": [1, 2], "r_ts": [T0, T0 + dt.timedelta(hours=1)],
                     "plan": ["a", "b"]})
    _write(sdir, 1, {"user_id": [1], "r_ts": [T0 + dt.timedelta(days=30)],
                     "plan": ["c"]})
    # purchases: u1 at T0+1d (matches plan a), u2 at T0+2d (plan b),
    # u1 at T0+31d (matches ONLY the re-signup 'c': first signup is
    # outside the 7-day horizon), u3 at T0+1d (no signup -> dropped)
    _write(pdir, 0, {"user_id": [1, 3],
                     "ts": [T0 + dt.timedelta(days=1)] * 2,
                     "amount": [10.0, 99.0]})
    _write(pdir, 1, {"user_id": [2, 1],
                     "ts": [T0 + dt.timedelta(days=2),
                            T0 + dt.timedelta(days=31)],
                     "amount": [20.0, 30.0]})

    purchases = (spark.readStream
                 .schema("user_id long, ts timestamp, amount double")
                 .option("maxFilesPerTrigger", 1).parquet(str(pdir)))
    signups = (spark.readStream
               .schema("user_id long, r_ts timestamp, plan string")
               .option("maxFilesPerTrigger", 1).parquet(str(sdir)))

    q = (
        stream_interval_join(purchases, signups, key="user_id")
        .select("user_id", "amount", "plan")
        .writeStream.format("memory").queryName("psj")
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(300)

    got = {(r["user_id"], r["amount"], r["plan"])
           for r in spark.sql("select * from psj").collect()}
    assert got == {(1, 10.0, "a"), (2, 20.0, "b"), (1, 30.0, "c")}, got
