"""Declarative expectations over a DataFrame: the Delta-constraints /
DLT-expectations shape as a library operator.

``enforce_expectations`` splits a frame into (clean, violations) under
named boolean rules in ONE row-local pass: each row gets the array of
rule names it fails; clean keeps empty-array rows, violations explodes
the names so a row failing k rules yields k labeled violation rows (the
quarantine-table layout). No shuffle is introduced — both outputs are
filters over the same tagged projection, and the violation table is the
audit trail a 100 TB ingest job writes next to the data.

NULL semantics follow SQL CHECK constraints: a rule evaluating to NULL
(e.g. ``col > 0`` on a NULL) counts as PASS — state non-null
requirements explicitly (``col.isNotNull()``), exactly as CHECK
constraints require.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enforce_expectations(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (clean, violations) under named rules.

    ``violations`` carries every source column plus ``rule`` — one row
    per (row, failed rule). Rule names must be non-empty and unique.
    Source columns named ``rule`` (or colliding with the internal tag)
    are rejected up front — silently clobbering a user column or
    emitting a duplicate ``rule`` column would poison downstream
    selects/writes.
    """
    if not rules:
        raise ValueError("enforce_expectations: at least one rule required")
    if "rule" in df.columns:
        raise ValueError(
            "enforce_expectations: source column 'rule' collides with the "
            "violation label — rename it before applying expectations"
        )
    tag = "__failed"
    while tag in df.columns:
        tag += "_x"
    # CHECK semantics: NULL predicate = pass, so a rule fails only when
    # it is definitively false
    failed = F.array_compact(
        F.array(
            *[
                F.when(rule.eqNullSafe(F.lit(False)), F.lit(name))
                for name, rule in rules.items()
            ]
        )
    )
    tagged = df.withColumn(tag, failed)
    clean = tagged.where(F.size(tag) == 0).drop(tag)
    violations = tagged.where(F.size(tag) > 0).select(
        *df.columns, F.explode(tag).alias("rule")
    )
    return clean, violations


def expectation_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Per-rule pass/fail counts in one aggregate scan (the cheap
    monitoring companion to ``enforce_expectations`` — run the report on
    every batch, quarantine only when it flags)."""
    if not rules:
        raise ValueError("expectation_report: at least one rule required")
    aggs = []
    for name, rule in rules.items():
        aggs.append(
            F.sum(F.when(rule.eqNullSafe(F.lit(False)), 1).otherwise(0))
            .cast("bigint")
            .alias(f"fail_{name}")
        )
    return df.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
