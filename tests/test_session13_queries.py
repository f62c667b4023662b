"""Pure-Python reference pins for the session-13 operators. Each
reference is an independent stdlib recompute, never a re-run of the
Spark code."""

from collections import Counter

import pytest


def test_cluster_topterms_keyness_reference(spark):
    """The integer-keyness ranking on a controlled frame: recompute
    tf_cell·total − tf_tot·cell_tokens with collections.Counter and
    pin the full top-3-per-cell output."""
    from ocr_intern_spark.operators.similarity import TOPTERMS_K

    docs = {
        0: "apple apple banana shared shared",
        1: "apple cherry shared shared shared",
        2: "dog dog dog shared elephant",
        3: "dog elephant shared shared shared",
    }
    cells = {0: 0, 1: 0, 2: 1, 3: 1}

    # independent reference
    tf_cell, tf_tot, cell_tokens = Counter(), Counter(), Counter()
    for d, text in docs.items():
        for t in text.split():
            tf_cell[(cells[d], t)] += 1
            tf_tot[t] += 1
            cell_tokens[cells[d]] += 1
    total = sum(tf_tot.values())
    expect = []
    for c in sorted(set(cells.values())):
        scored = sorted(
            (
                (-(tf_cell[(c, t)] * total - tf_tot[t] * cell_tokens[c]), t)
                for (cc, t) in tf_cell
                if cc == c
            ),
        )[:TOPTERMS_K]
        for rk, (neg, t) in enumerate(scored, 1):
            expect.append((c, rk, t, -neg))

    # spark path: same keyness over an injected assignment (bypass
    # the ivf stage — its cells are pinned by the semdedup oracle)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    toks = (
        spark.createDataFrame(
            [(d, t) for d, txt in docs.items() for t in txt.split()],
            "doc long, tok string",
        )
        .join(
            spark.createDataFrame(
                list(cells.items()), "doc long, cell int"
            ),
            "doc",
        )
        .select("cell", "tok")
    )
    tfc = toks.groupBy("cell", "tok").agg(F.count(F.lit(1)).alias("tf_cell"))
    tft = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf_tot"))
    ct = toks.groupBy("cell").agg(F.count(F.lit(1)).alias("cell_tokens"))
    tot = toks.agg(F.count(F.lit(1)).alias("total_tokens"))
    score = (
        F.col("tf_cell") * F.col("total_tokens")
        - F.col("tf_tot") * F.col("cell_tokens")
    ).alias("score")
    w = Window.partitionBy("cell").orderBy(F.desc("score"), F.asc("tok"))
    got = [
        (r["cell"], r["rk"], r["tok"], r["score"])
        for r in tfc.join(tft, "tok")
        .join(F.broadcast(ct), "cell")
        .crossJoin(F.broadcast(tot))
        .select("cell", "tok", score)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPTERMS_K)
        .select("cell", "rk", "tok", "score")
        .orderBy("cell", "rk")
        .collect()
    ]
    assert got == expect
    # non-vacuity: each cell's #1 term is its distinctive word, not
    # the corpus-wide stopword 'shared'
    tops = {c: t for (c, rk, t, s) in got if rk == 1}
    assert tops == {0: "apple", 1: "dog"}
    assert all(t != "shared" for t in tops.values())


def test_cluster_topterms_registry_plan(spark):
    """The registered query's plan: assignment broadcast + two-level
    token aggregates — no unpartitioned window, no cartesian beyond
    the 1-row/8-row broadcasts."""
    from ocr_intern_spark.operators.similarity import q_cluster_topterms

    df = q_cluster_topterms(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the ranking window must be cell-partitioned; the only allowed
    # unpartitioned window is the bounded 8-row centroid numbering
    assert plan.count("No Partition Defined") <= 1, plan
    rows = df.collect()
    assert len(rows) == 24  # 8 cells × top-3
    assert all(r["rk"] in (1, 2, 3) for r in rows)
