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


def test_oversized_ids_empty_source():
    """n_docs=0 is a valid user option: empty set, not randrange(0)."""
    from ocr_intern_spark.sources.datasource import _oversized_ids

    assert _oversized_ids(0, seed=42) == set()
    assert _oversized_ids(10, seed=42) != set()


def test_stream_reader_offset_never_regresses_after_restart():
    """Restart-from-checkpoint: a fresh reader whose first planning
    call carries the committed offset must not emit latestOffset()
    below it afterwards (offset-log monotonicity; the old in-memory
    counter regressed to batch_docs and stalled progress)."""
    from ocr_intern_spark.sources.datasource import (
        InterleavedCorpusStreamReader,
    )

    opts = {"n_docs": "1000", "batch_docs": "100", "parts": "2"}
    committed = 700

    # fresh process: counter starts at 0, checkpoint says 700
    r = InterleavedCorpusStreamReader(opts)
    first_latest = r.latestOffset()["i"]  # pre-fix this was 100 < 700
    # Spark plans (committed → latest) regardless; the reader re-seats
    # its counter from the committed start
    r.partitions({"i": committed}, {"i": max(first_latest, committed)})
    after = r.latestOffset()["i"]
    assert after >= committed, f"offset regressed: {after} < {committed}"
    # and keeps advancing monotonically to completion
    seen = [after]
    for _ in range(5):
        r.partitions({"i": seen[-1]}, {"i": seen[-1]})
        seen.append(r.latestOffset()["i"])
    assert seen == sorted(seen)
    assert seen[-1] <= 1000
