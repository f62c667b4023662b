"""Driver-contract registration guards: the correctness driver checks
only the FIRST 50 queries() entries per round, so ordering is load-
bearing — every name without a prior driver row must sit in the top
50, and every oracle_sql entry must belong to a registered query."""

import importlib.util
import json


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_unchecked_names_fit_in_driver_window_or_are_deferred():
    m = _entry()
    names = list(m.queries())
    try:
        prior = set(json.load(open("/root/repo/CORRECTNESS_r02.json")))
    except FileNotFoundError:
        prior = set()
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
    prior = set(json.load(open("/root/repo/CORRECTNESS_r02.json")))
    missing = [
        n for n in names[50:] if n not in prior and n not in m._DEFERRED
    ]
    assert not missing, f"rotated-out queries with no driver row ever: {missing}"


def test_deferred_names_each_have_alternative_verification():
    """Every deliberately-deferred name must either carry a DuckDB
    oracle (locally verified with the driver's own compare) or be one
    of the rows-only golden-pinned template/export entries."""
    m = _entry()
    oracles = set(m.oracle_sql())
    rows_only_golden = {
        "extract_template_fields", "extract_template_fields_auto",
        "export_fanout",
    }
    bad = [
        n for n in m._DEFERRED
        if n not in oracles and n not in rows_only_golden
    ]
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
