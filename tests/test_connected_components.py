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


def test_star_variant_matches_propagation_on_random_graph(spark):
    """large-star/small-star must produce the identical cluster map
    as min-label propagation on a seeded random graph (60 nodes,
    chains + rings + isolates-in-pairs)."""
    import random

    from ocr_intern_spark.operators.dedup import connected_components_star

    rng = random.Random(7)
    nodes = [f"n{i:02d}" for i in range(60)]
    edges = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(0, 18)]  # long chain
    edges += [(nodes[rng.randrange(20, 60)], nodes[rng.randrange(20, 60)])
              for _ in range(50)]
    edges = [e for e in edges if e[0] != e[1]]
    pairs = spark.createDataFrame(edges, "a string, b string")

    prop = {r["doc_id"]: r["cluster_id"]
            for r in connected_components(pairs, max_rounds=40).collect()}
    star = {r["doc_id"]: r["cluster_id"]
            for r in connected_components_star(pairs).collect()}
    assert star == prop
    assert star["n18"] == "n00"  # chain end reaches the component min


def test_star_variant_logarithmic_rounds_on_long_chain(spark):
    """A 48-node chain (diameter 47) must converge within the
    O(log n) round budget — propagation would need 47 rounds."""
    from ocr_intern_spark.operators.dedup import connected_components_star

    chain = [(f"c{i:02d}", f"c{i+1:02d}") for i in range(47)]
    pairs = spark.createDataFrame(chain, "a string, b string")
    got = {r["cluster_id"]
           for r in connected_components_star(pairs, max_rounds=10).collect()}
    assert got == {"c00"}
