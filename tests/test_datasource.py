"""Pins for the custom Python DataSource (Spark 4 datasource API):
executor-side corpus generation must be byte-identical to the
driver-side corpus_to_spark materialization, invariant under the
partition count, and the streaming variant must deliver the whole id
range exactly once across micro-batches."""

import pytest


@pytest.fixture(scope="module")
def registered(spark):
    from ocr_intern_spark.sources.datasource import (
        InterleavedCorpusDataSource,
    )

    spark.dataSource.register(InterleavedCorpusDataSource)
    return spark


def _collect_sorted(df):
    rows = df.collect()
    return sorted(
        (r.doc_id, [tuple(s) for s in r.spans]) for r in rows
    )


def test_batch_read_matches_driver_side_corpus(registered):
    from ocr_intern_spark.sources.corpus import corpus_to_spark

    spark = registered
    got = _collect_sorted(
        spark.read.format("interleaved_corpus")
        .option("n_docs", 60).option("parts", 5).option("seed", 42)
        .load()
    )
    want = _collect_sorted(corpus_to_spark(spark, 60, seed=42))
    assert got == want


def test_partition_invariance_and_parallelism(registered):
    spark = registered
    dfs = [
        spark.read.format("interleaved_corpus")
        .option("n_docs", 40).option("parts", p).option("seed", 7)
        .load()
        for p in (1, 7)
    ]
    assert dfs[1].rdd.getNumPartitions() == 7
    assert _collect_sorted(dfs[0]) == _collect_sorted(dfs[1])


def test_seed_changes_content(registered):
    spark = registered

    def read(seed):
        return _collect_sorted(
            spark.read.format("interleaved_corpus")
            .option("n_docs", 20).option("seed", seed).load()
        )

    assert read(1) != read(2)


def test_stream_delivers_range_exactly_once(registered, tmp_path):
    spark = registered
    q = (
        spark.readStream.format("interleaved_corpus")
        .option("n_docs", 50).option("batch_docs", 20)
        .option("parts", 3).option("seed", 42)
        .load()
        .writeStream.format("memory")
        .queryName("corpus_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT doc_id, count(*) AS n FROM corpus_stream GROUP BY doc_id"
    ).collect()
    assert len(rows) == 50
    assert all(r.n == 1 for r in rows)
    # and batch/stream agree on content
    batch = _collect_sorted(
        spark.read.format("interleaved_corpus")
        .option("n_docs", 50).option("seed", 42).load()
    )
    stream = _collect_sorted(spark.table("corpus_stream"))
    assert stream == batch
