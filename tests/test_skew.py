"""Skew handling: an oversized document must not pin a single task —
its media spans spread across the OCR-stage partitions (SURVEY.md §4
item 1: span-level explode + hash(media_ref) repartition, since AQE
cannot split one giant row)."""

from pyspark.sql import functions as F

from ocr_intern_spark.oracle.semantics import extract_document
from ocr_intern_spark.operators.extract import explode_spans, extract
from ocr_intern_spark.sources.corpus import make_document, stub_ocr_tokens


def _giant_doc_df(spark, n_partitions=8):
    giant = make_document("doc-giant", seed=1, oversized=True)
    small = [make_document(f"doc-{i:03d}", seed=1) for i in range(5)]
    rows = [
        (d["doc_id"], [(s["kind"], s["text"], s["media_ref"], s["offset"])
                       for s in d["spans"]])
        for d in [giant] + small
    ]
    return giant, spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


def test_giant_doc_media_spreads_across_partitions(spark):
    giant, df = _giant_doc_df(spark)
    media = (
        explode_spans(df)
        .where((F.col("kind") == "media") & (F.col("media_ref") != ""))
        .repartition(8, F.hash("media_ref"))
        .where(F.col("doc_id") == "doc-giant")
        .select(F.spark_partition_id().alias("pid"))
    )
    pids = {r["pid"] for r in media.collect()}
    n_media = media.count()
    assert n_media > 20  # the giant doc really is media-heavy
    # its OCR work lands on most partitions, not one
    assert len(pids) >= 6, (n_media, pids)


def test_giant_doc_output_still_exact(spark):
    giant, df = _giant_doc_df(spark)
    out = {r["doc_id"]: [tuple(s) for s in r["spans"]]
           for r in extract(df, stub_ocr_tokens, ocr_partitions=8).collect()}
    expected = [tuple(s) for s in extract_document(giant["spans"], stub_ocr_tokens)]
    assert out["doc-giant"] == expected
    assert len(expected) > 200


def test_ocr_partition_timing_accumulator(spark):
    from ocr_intern_spark.operators.extract import ListAccumulator
    from ocr_intern_spark.sources.corpus import corpus_to_spark

    acc = spark.sparkContext.accumulator([], ListAccumulator())
    docs = corpus_to_spark(spark, 20, seed=42)
    extract(docs, stub_ocr_tokens, ocr_partitions=4, ocr_timing_acc=acc).count()
    rows = acc.value
    assert rows, "no timing rows collected"
    assert all(len(r) == 3 for r in rows)
    assert sum(r[1] for r in rows) > 0          # media rows seen
    assert all(r[2] >= 0 for r in rows)         # wall_ms
    assert len({r[0] for r in rows}) >= 2       # multiple partitions
