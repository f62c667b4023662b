"""Pins for table-grid cell reconstruction: exact cluster recovery on
hand-built geometries (including a ragged table with missing cells),
jitter robustness at the threshold boundary, and the one-exchange
plan shape the operator promises."""

from pyspark.sql import functions as F

from ocr_intern_spark.operators.layout import COL_GAP, ROW_GAP, table_grid


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, x long, y long, text string")


def _cells(spark, rows):
    return {
        (r.doc_id, r.row_id, r.col_id): r.cell_text
        for r in table_grid(_df(spark, rows)).collect()
    }


def test_recovers_regular_grid(spark):
    rows = []
    for r in range(3):
        for c in range(4):
            rows.append((1, c * 150 + (r + c) % 7, r * 40 + (r * c) % 5,
                         f"w{r}{c}"))
    got = _cells(spark, rows)
    assert got == {
        (1, r, c): f"w{r}{c}" for r in range(3) for c in range(4)
    }


def test_ragged_table_missing_cells(spark):
    # row 0 has cols 0,2; row 1 has cols 0,1,2 — absent cells simply
    # produce no output row; col ids stay aligned across rows
    rows = [
        (7, 0, 0, "a"), (7, 300, 3, "c"),
        (7, 2, 50, "d"), (7, 151, 48, "e"), (7, 305, 55, "f"),
    ]
    got = _cells(spark, rows)
    assert got == {
        (7, 0, 0): "a", (7, 0, 2): "c",
        (7, 1, 0): "d", (7, 1, 1): "e", (7, 1, 2): "f",
    }


def test_multiword_cell_reads_in_x_order(spark):
    rows = [(3, 60, 0, "world"), (3, 10, 2, "hello"), (3, 400, 1, "x")]
    got = _cells(spark, rows)
    assert got[(3, 0, 0)] == "hello world"
    assert got[(3, 0, 1)] == "x"


def test_gap_threshold_boundary(spark):
    # y delta exactly ROW_GAP stays one row; ROW_GAP+1 splits
    same = _cells(spark, [(1, 0, 0, "a"), (1, 200, ROW_GAP, "b")])
    assert {k[1] for k in same} == {0}
    split = _cells(spark, [(1, 0, 0, "a"), (1, 200, ROW_GAP + 1, "b")])
    assert {k[1] for k in split} == {0, 1}
    wide = _cells(spark, [(1, 0, 0, "a"), (1, COL_GAP + 1, 0, "b")])
    assert {k[2] for k in wide} == {0, 1}


def test_docs_cluster_independently(spark):
    rows = [(1, 0, 0, "a"), (2, 0, 500, "b")]  # huge y delta, two docs
    got = _cells(spark, rows)
    assert got == {(1, 0, 0): "a", (2, 0, 0): "b"}


def test_single_exchange_plan(spark):
    rows = [(d, c * 150, r * 40, "t") for d in (1, 2)
            for r in range(2) for c in range(2)]
    plan = (
        table_grid(_df(spark, rows))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # both windows and the cell aggregate run off ONE hash exchange on
    # doc_id (+ the deterministic output sort's range exchange)
    hash_exchanges = [
        line for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
    ]
    assert len(hash_exchanges) == 1, plan
