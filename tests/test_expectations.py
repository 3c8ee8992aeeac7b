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
