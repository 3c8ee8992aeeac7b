"""Cross-engine parity audit for the window builtins no battery entry
exercises directly: first_value / last_value (both frame conventions),
nth_value, percent_rank, cume_dist, and ntile — pinned against DuckDB
on the shared sf0.001 orders table with fully-tiebroken orderings, so
round-8 entries can build on them with the semantics already proven."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF_DIR
from flight_radar_pipeline_spark.sources.readers import load_table

_SQL = """
    select o_custkey, o_orderkey,
           first_value(o_orderkey) over w as first_ok,
           last_value(o_orderkey) over (partition by o_custkey
                order by o_orderdate, o_orderkey
                rows between unbounded preceding
                and unbounded following) as last_ok,
           nth_value(o_orderkey, 2) over (partition by o_custkey
                order by o_orderdate, o_orderkey
                rows between unbounded preceding
                and unbounded following) as second_ok,
           round(percent_rank() over w, 8) as pr,
           round(cume_dist() over w, 8) as cd,
           ntile(4) over w as quartile
    from orders
    window w as (partition by o_custkey order by o_orderdate, o_orderkey)
    order by o_custkey, o_orderkey
"""


@pytest.fixture(scope="module")
def oracle_rows():
    con = duckdb.connect()
    con.sql(
        f"create view orders as select * from "
        f"parquet_scan('{SF_DIR}/orders.parquet')"
    )
    return con.sql(_SQL).fetchall()


def test_window_builtins_match_duckdb(spark, oracle_rows):
    orders = load_table(spark, SF_DIR, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    got = (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_ok"),
            F.last("o_orderkey").over(w_full).alias("last_ok"),
            F.nth_value("o_orderkey", 2).over(w_full).alias("second_ok"),
            F.round(F.percent_rank().over(w), 8).alias("pr"),
            F.round(F.cume_dist().over(w), 8).alias("cd"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .collect()
    )
    assert len(got) == len(oracle_rows)
    for g, o in zip(got, oracle_rows):
        assert (
            g.o_custkey, g.o_orderkey, g.first_ok, g.last_ok, g.second_ok,
            float(g.pr), float(g.cd), g.quartile,
        ) == (
            o[0], o[1], o[2], o[3], o[4], float(o[5]), float(o[6]), o[7]
        ), (tuple(g), o)
