"""enforce_expectations: exact partition into clean + labeled
violations, SQL CHECK null semantics, multi-rule fan-out."""

from __future__ import annotations

import pyspark.sql.functions as F

from flight_radar_pipeline_spark.pipeline.quality import (
    enforce_expectations,
    expectation_report,
)

def _rules():
    # built lazily: Column construction needs an active SparkContext
    return {
        "positive_amount": F.col("amount") > 0,
        "known_status": F.col("status").isin("ok", "late"),
        "amount_present": F.col("amount").isNotNull(),
    }

ROWS = [
    (1, 10.0, "ok"),      # clean
    (2, -5.0, "ok"),      # fails positive_amount
    (3, 7.0, "bogus"),    # fails known_status
    (4, -1.0, "bogus"),   # fails both
    (5, None, "late"),    # NULL: passes positive_amount (CHECK), fails presence
]


def _df(spark):
    return spark.createDataFrame(ROWS, "id bigint, amount double, status string")


def test_partition_is_exact_and_labeled(spark):
    clean, violations = enforce_expectations(_df(spark), _rules())
    assert {r.id for r in clean.collect()} == {1}
    got = {(r.id, r.rule) for r in violations.collect()}
    assert got == {
        (2, "positive_amount"),
        (3, "known_status"),
        (4, "positive_amount"),
        (4, "known_status"),
        (5, "amount_present"),
    }
    # every source row is either clean or violating (by distinct id)
    assert clean.count() + violations.select("id").distinct().count() == len(ROWS)


def test_null_predicate_passes_like_sql_check(spark):
    clean, violations = enforce_expectations(
        _df(spark), {"positive_amount": F.col("amount") > 0}
    )
    # id=5 (NULL amount): rule is UNKNOWN -> pass, per CHECK semantics
    assert {r.id for r in clean.collect()} == {1, 3, 5}
    assert {r.id for r in violations.collect()} == {2, 4}


def test_report_counts_per_rule_in_one_scan(spark):
    row = expectation_report(_df(spark), _rules()).collect()[0]
    assert row.n_rows == 5
    assert row.fail_positive_amount == 2
    assert row.fail_known_status == 2
    assert row.fail_amount_present == 1
    plan = (
        expectation_report(_df(spark), _rules())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan") <= 2  # partial+final agg over ONE source scan


def test_all_passing_rules_yield_empty_typed_violations(spark):
    clean, violations = enforce_expectations(
        _df(spark), {"amount_known_or_any": F.col("id") > 0}
    )
    assert clean.count() == 5
    assert violations.count() == 0
    # schema stays stable for the quarantine writer even when empty
    assert violations.columns == ["id", "amount", "status", "rule"]


def test_source_rule_column_is_rejected_not_clobbered(spark):
    """A source column named 'rule' would collide with the violation
    label (duplicate column, ambiguous downstream) — reject up front."""
    import pytest

    df = spark.createDataFrame([(1, "a")], "id bigint, rule string")
    with pytest.raises(ValueError, match="'rule'"):
        enforce_expectations(df, {"pos": F.col("id") > 0})


def test_source_failed_column_survives_untouched(spark):
    """A source column named '__failed' must not be clobbered by the
    internal tag — the guard picks a fresh internal name."""
    df = spark.createDataFrame(
        [(1, "keep-me"), (-2, "also")], "id bigint, __failed string"
    )
    clean, violations = enforce_expectations(df, {"pos": F.col("id") > 0})
    assert clean.columns == ["id", "__failed"]
    assert [r["__failed"] for r in clean.collect()] == ["keep-me"]
    assert violations.columns == ["id", "__failed", "rule"]
    assert [(r["id"], r["__failed"], r["rule"]) for r in violations.collect()] == [
        (-2, "also", "pos")
    ]


# ---------------------------------------------------------------------------
# property fuzz: random rows × random rule expressions vs a DuckDB CHECK
# oracle (VERDICT r5 item 7 — NULL three-valued logic, overlapping rules)
# ---------------------------------------------------------------------------

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# each rule = (spark Column factory, equivalent SQL predicate). CHECK
# semantics on both sides: violation iff predicate IS FALSE (NULL passes).
_RULE_POOL = [
    ("amt_pos", lambda: F.col("amount") > 0, "amount > 0"),
    ("amt_small", lambda: F.col("amount") <= 50, "amount <= 50"),
    ("amt_ne_7", lambda: F.col("amount") != 7.0, "amount <> 7.0"),
    ("amt_present", lambda: F.col("amount").isNotNull(), "amount is not null"),
    ("status_known", lambda: F.col("status").isin("ok", "late"),
     "status in ('ok', 'late')"),
    ("status_present", lambda: F.col("status").isNotNull(), "status is not null"),
    ("both", lambda: (F.col("amount") > 0) & F.col("status").isNotNull(),
     "(amount > 0) and (status is not null)"),
    ("either", lambda: (F.col("amount") > 100) | (F.col("status") == "ok"),
     "(amount > 100) or (status = 'ok')"),
    ("not_bogus", lambda: ~(F.col("status") == "bogus"),
     "not (status = 'bogus')"),
]

_row = st.tuples(
    st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                   min_value=-1e6, max_value=1e6)),
    st.one_of(st.none(), st.sampled_from(["ok", "late", "bogus", ""])),
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(_row, min_size=0, max_size=20),
    picks=st.lists(st.sampled_from(range(len(_RULE_POOL))),
                   min_size=1, max_size=4, unique=True),
)
def test_fuzz_matches_duckdb_check_semantics(spark, rows, picks):
    data = [(i, r[0], r[1]) for i, r in enumerate(rows)]
    pdf = pd.DataFrame(data, columns=["id", "amount", "status"]).astype(
        {"id": "int64"}
    )
    df = spark.createDataFrame(data, "id bigint, amount double, status string")
    rules = {_RULE_POOL[i][0]: _RULE_POOL[i][1]() for i in picks}
    clean, violations = enforce_expectations(df, rules)
    got_clean = {r.id for r in clean.collect()}
    got_viol = {(r.id, r.rule) for r in violations.collect()}

    con = duckdb.connect()
    con.register("t", pdf)
    want_viol = set()
    for i in picks:
        name, _, sql = _RULE_POOL[i]
        for (rid,) in con.sql(
            f"select id from t where not coalesce(({sql}), true)"
        ).fetchall():
            want_viol.add((rid, name))
    con.close()
    want_clean = set(pdf["id"]) - {rid for rid, _ in want_viol}
    assert got_viol == want_viol
    assert got_clean == want_clean
