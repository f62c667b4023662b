"""Parity pin for the span-segmentation UDTF: the SQL table-function
escape hatch must be row-identical to the native Catalyst derivation
(derive_spans), so a custom Python segmenter can be swapped in
without breaking the span contract."""


def test_udtf_matches_native_derivation(spark):
    import __spark_entry__ as e
    from ocr_intern_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("docs_udtf_src")

    native = (
        e.derive_spans(docs)
        .selectExpr("doc_id", "explode(spans) AS s")
        .selectExpr("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")
    )
    via_udtf = spark.sql(
        """
        SELECT CAST(doc_id AS STRING) AS doc_id,
               s.kind, s.text, s.media_ref, s.offset
        FROM docs_udtf_src,
             LATERAL segment_spans(CAST(doc_id AS STRING), text) s
        """
    )
    got = sorted(map(tuple, via_udtf.collect()))
    want = sorted(map(tuple, native.collect()))
    assert got == want
    assert len(got) > 0


def test_udtf_empty_text_contract(spark):
    """Empty documents still yield one empty chunk + media + field —
    the derive_spans fixed shape."""
    from ocr_intern_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM segment_spans('7', '')"
    ).collect()
    kinds = [r.kind for r in rows]
    assert kinds == ["text", "media", "field"]
    assert rows[0].text == "" and rows[1].media_ref == "img://7"
