"""Driver-contract registration guards: the correctness driver checks
only the FIRST 50 queries() entries per round, so ordering is load-
bearing — every name without a prior driver row must sit in the top
50, and every oracle_sql entry must belong to a registered query."""

import glob
import importlib.util
import json


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _prior_rows() -> set[str]:
    """Union of every past round's driver correctness window."""
    prior: set[str] = set()
    for path in glob.glob("/root/repo/CORRECTNESS_r0*.json"):
        prior |= set(json.load(open(path)))
    return prior


def test_unchecked_names_fit_in_driver_window_or_are_deferred():
    m = _entry()
    names = list(m.queries())
    prior = _prior_rows()
    unchecked = [n for n in names if n not in prior]
    outside = [n for n in unchecked if names.index(n) >= 50]
    undeclared = [n for n in outside if n not in m._DEFERRED]
    assert not undeclared, (
        f"never-driver-checked queries past slot 50 and not in "
        f"_DEFERRED: {undeclared}"
    )


def test_rotated_out_names_have_prior_rows_or_are_deferred():
    m = _entry()
    names = list(m.queries())
    prior = _prior_rows()
    missing = [
        n for n in names[50:] if n not in prior and n not in m._DEFERRED
    ]
    assert not missing, f"rotated-out queries with no driver row ever: {missing}"


def test_r3_redlist_heads_the_window():
    """VERDICT r3 next-round #1/#2: the two fixed hash-fails lead the
    window, and all 18 never-driver-checked names sit inside it."""
    m = _entry()
    names = list(m.queries())
    assert names[0] == "text_dsir_select"
    assert names[1] == "extract_table_grid"
    never_checked = [
        "dedup_incremental_batch", "dedup_lsh_quality", "events_twap",
        "graph_triangle_stats", "sim_int8_quant_recall",
        "sim_knn_join_topk", "sim_mmr_select", "text_bigram_logprob",
        "text_langid_ngram", "text_length_histogram",
        "text_pack_sequences", "text_quality_curriculum_bins",
        "text_stratified_sample", "text_unigram_logprob",
        "text_winnow_fingerprints", "text_winnow_shared_pairs",
        "export_fanout", "extract_template_fields_auto",
    ]
    for n in never_checked:
        assert names.index(n) < 50, f"{n} outside the 50-slot window"


def test_golden_backed_entries_have_oracles_in_window():
    """VERDICT r3 next-round #3: the formerly rows-only entries now
    carry materialized-golden oracle SQL and sit inside the window."""
    m = _entry()
    names = list(m.queries())
    oracles = m.oracle_sql()
    for n in (
        "extract_full_pipeline", "extract_doc_confidence",
        "extract_template_fields", "extract_template_fields_auto",
        "export_fanout",
    ):
        assert names.index(n) < 50, f"{n} outside the 50-slot window"
        assert n in oracles, f"{n} has no oracle SQL"
        assert "tests/goldens" in oracles[n]


def test_deferred_names_each_have_alternative_verification():
    """Every deliberately-deferred name must carry a DuckDB oracle
    (locally verified with the driver's own compare)."""
    m = _entry()
    oracles = set(m.oracle_sql())
    bad = [n for n in m._DEFERRED if n not in oracles]
    assert not bad, f"deferred names with no alternative verification: {bad}"
    assert set(m._DEFERRED) <= set(m.queries())


def test_oracle_sql_keys_subset_of_queries():
    m = _entry()
    assert set(m.oracle_sql()) <= set(m.queries())


def test_front_back_names_exist():
    m = _entry()
    names = set(m.queries())
    assert set(m._FRONT) <= names
    assert set(m._BACK) <= names
