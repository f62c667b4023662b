"""Duplicate-cluster connected components: min-label propagation must
converge across multi-hop chains (not just star components) and leave
disjoint components separate."""

from ocr_intern_spark.operators.dedup import connected_components


def test_chain_ring_and_disjoint(spark):
    # chain d1-d2-d3-d4 (3 hops), ring d5-d6-d7-d5, pair d8-d9
    pairs = spark.createDataFrame(
        [("d2", "d3"), ("d1", "d2"), ("d3", "d4"),
         ("d5", "d6"), ("d6", "d7"), ("d5", "d7"),
         ("d8", "d9")],
        "a string, b string",
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(pairs).collect()}
    assert got == {
        "d1": "d1", "d2": "d1", "d3": "d1", "d4": "d1",
        "d5": "d5", "d6": "d5", "d7": "d5",
        "d8": "d8", "d9": "d8",
    }


def test_nonconvergence_raises(spark):
    """A component whose diameter exceeds max_rounds must RAISE, not
    silently emit partial labels (round-1 ADVICE)."""
    import pytest

    chain = [(f"n{i}", f"n{i+1}") for i in range(6)]
    pairs = spark.createDataFrame(chain, "a string, b string")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_rounds=2)
    # and with enough rounds the same graph converges to one cluster
    got = {r["cluster_id"] for r in connected_components(pairs, max_rounds=10).collect()}
    assert got == {"n0"}
