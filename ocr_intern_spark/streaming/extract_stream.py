"""Streaming extraction + event-stream analytics.

* ``stream_extract_flat``: the extraction pipeline over a file-source
  stream of documents. The non-media transform is pure projection and
  the OCR stage is a stateless ``mapInPandas`` — both are
  streaming-safe with no watermark. Output is the FLAT span stream;
  per-doc array assembly (a grouped aggregation) belongs in
  ``foreachBatch`` (see ``stream_extract_to_store``) because exact
  per-doc re-assembly needs batch boundaries, mirroring the batch
  MERGE semantics.
* ``windowed_event_stats``: watermarked tumbling-window aggregation
  over the `events` shape — the streaming analogue of the reference's
  time-windowed perf summary (performance_analytics.py:58-89).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_intern_spark.operators.extract import (
    Recognizer,
    explode_spans,
    extract,
    ocr_media_spans,
    transform_plain_spans,
)
from ocr_intern_spark.schema import DOCUMENTS_DDL


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(DOCUMENTS_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_extract_flat(docs_stream: DataFrame, recognize: Recognizer) -> DataFrame:
    """documents stream → FLAT extracted span stream (append mode)."""
    flat = explode_spans(docs_stream)
    plain = transform_plain_spans(flat)
    ocr = ocr_media_spans(flat, recognize)  # no repartition: stream-safe
    return plain.unionByName(ocr)


def stream_extract_to_store(
    docs_stream: DataFrame,
    recognize: Recognizer,
    store,
    checkpoint_dir: str,
):
    """foreachBatch bridge: each micro-batch runs the full batch
    pipeline (assembly included) through the idempotent store —
    exactly-once per doc via the anti-join, even across restarts."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        store.run_resumable(
            batch_df, lambda d: extract(d, recognize), run_id=f"stream-{batch_id}"
        )

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def windowed_event_stats(
    events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling-window per-type stats with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
