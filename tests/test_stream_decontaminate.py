"""Stream-static join at ingest: continuous decontamination against a
static benchmark gram set (streaming/extract_stream.py::
stream_decontaminate; batch sibling q_decontaminate_flags)."""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_intern_spark.streaming.extract_stream import stream_decontaminate

BENCH_TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def test_stream_decontaminate_flags_cross_batch(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    rows = [
        # batch 0: one contaminated (contains the bench 8-gram run),
        # one clean
        [("d1", "prefix " + BENCH_TEXT + " suffix"),
         ("d2", "totally different words all the way through here now")],
        # batch 1: clean doc shorter than the gram length
        [("d3", "short doc")],
    ]
    import os

    for i, batch in enumerate(rows):
        path = str(d / f"b{i}.parquet")
        pq.write_table(
            pa.table({"doc_id": [r[0] for r in batch],
                      "text": [r[1] for r in batch]}),
            path,
        )
        os.utime(path, (1700000000 + i * 60, 1700000000 + i * 60))

    bench = spark.createDataFrame(
        [(f, ) for f in _bench_grams()], "g string"
    )
    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        stream_decontaminate(stream, bench)
        .writeStream.format("memory")
        .queryName("decon_out")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {r["doc_id"]: (r["contaminated"], r["n_leaked_grams"])
           for r in spark.sql("select * from decon_out").collect()}
    assert got["d1"][0] is True and got["d1"][1] >= 1
    assert got["d2"] == (False, 0)
    assert got["d3"] == (False, 0)


def _bench_grams():
    toks = BENCH_TEXT.split()
    return [" ".join(toks[i:i + 8]) for i in range(len(toks) - 7)]
