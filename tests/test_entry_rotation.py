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


def _prior_rows(before_round: int | None = None) -> set[str]:
    """Union of past rounds' driver correctness windows.

    ``before_round`` restricts to rounds strictly earlier than N so a
    test validating round-N's window composition stays green after the
    driver deposits CORRECTNESS_r0N.json (VERDICT r5 What's-wrong #2:
    the unbounded glob made the r5 rotation test trip on its own
    round's artifact).
    """
    prior: set[str] = set()
    for path in glob.glob("/root/repo/CORRECTNESS_r0*.json"):
        rnd = int(path.rsplit("_r0", 1)[1].split(".")[0])
        if before_round is not None and rnd >= before_round:
            continue
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


def test_r5_window_is_span_gate_plus_fresh_backlog():
    """VERDICT r4 next-round #1: extract_span_regression (the standing
    north-rule span-sequence gate) leads the window, and every other
    slot goes to a name with NO prior driver row — the window drains
    the backlog instead of re-checking green names."""
    m = _entry()
    names = list(m.queries())
    prior = _prior_rows(before_round=5)
    assert names[0] == "extract_span_regression"
    rechecked = [n for n in names[1:50] if n in prior]
    assert not rechecked, (
        f"r5 window slots wasted on already-driver-green names: {rechecked}"
    )


def test_golden_backed_entries_keep_oracles():
    """VERDICT r3 next-round #3 (carried): the formerly rows-only
    entries keep their materialized-golden oracle SQL. They earned
    hash rows in CORRECTNESS_r04 and have rotated out of the window."""
    m = _entry()
    oracles = m.oracle_sql()
    for n in (
        "extract_full_pipeline", "extract_doc_confidence",
        "extract_template_fields", "extract_template_fields_auto",
        "export_fanout",
    ):
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
