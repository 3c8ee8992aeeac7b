"""Third-implementation checks, batch 34 — the lake-maintenance applier
family (round-11 verdict, next-round item 5 named this gap): SCD1
updates-win merge, SCD3 previous-value merge, CDC insert/update/delete
fold, two-wave SCD2 interval chaining, streaming additive rollup
maintenance, and the mergeSchema evolution read. Each batch/stream twin
pair is checked against ONE imperative dict-state applier — the stream
entry's foreachBatch loop, the batch entry's join algebra, and the
oracle's SQL restatement all have to land on the same per-key state
machine, and this walk states that machine directly (apply ops to a
dict in order, nothing relational).
"""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
QUERIES = entry.queries()

_FMT = "%Y-%m-%d %H:%M:%S"


def _r(x: float, dp: int) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


@pytest.fixture(scope="module")
def orders():
    con = duckdb.connect()
    rows = con.execute(
        f"select o_orderkey, o_custkey, o_orderstatus, o_totalprice,"
        f" o_orderdate, o_orderpriority from '{SF_DIR}/orders.parquet'"
    ).fetchall()
    con.close()
    return rows


@pytest.fixture(scope="module")
def events():
    con = duckdb.connect()
    rows = con.execute(
        f"select ts, event_type, value from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


# --------------------------------------------------------------------------
# SCD1: updates win per key — batch entry and its foreachBatch stream twin
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name", ["orders_scd1_merge", "orders_scd1_stream_merge"]
)
def test_scd1_twins_vs_dict_upsert(spark, orders, name):
    state = {}
    for k, ck, st, price, dt, prio in orders:  # insert current snapshot
        state[k] = (ck, st, float(price), dt, prio)
    for k, ck, st, price, dt, prio in orders:  # apply the update batch
        if k % 10 == 0:
            state[k] = (ck, st, float(price) + 1000, dt, prio)
    expected = [
        (k, ck, st, p, dt.strftime(_FMT), prio)
        for k, (ck, st, p, dt, prio) in sorted(state.items())
    ]

    got = [
        (
            r.o_orderkey,
            r.o_custkey,
            r.o_orderstatus,
            r.o_totalprice,
            r.o_orderdate,
            r.o_orderpriority,
        )
        for r in _run(name, spark)
    ]
    assert got == expected


# --------------------------------------------------------------------------
# SCD3: changed values push into prev_status, unchanged carry it
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name", ["orders_scd3_merge", "orders_scd3_stream_merge"]
)
def test_scd3_twins_vs_dict_prev_value(spark, orders, name):
    flip = {"O": "F", "F": "O"}
    state = {k: (st, None) for k, _ck, st, _p, _dt, _pr in orders}
    for k, _ck, st, _p, _dt, _pr in orders:
        if k % 10 == 0:
            new = flip.get(st, "O")
            cur, prev = state[k]
            state[k] = (new, cur if cur != new else prev)
    expected = [(k, st, pv) for k, (st, pv) in sorted(state.items())]

    got = [
        (r.o_orderkey, r.o_orderstatus, r.prev_status)
        for r in _run(name, spark)
    ]
    assert got == expected
    # the update flips every touched status here, so prev_status is
    # populated for exactly the %10 keys
    assert all((pv is not None) == (k % 10 == 0) for k, _st, pv in expected)


# --------------------------------------------------------------------------
# CDC: I/U/D ops applied per key in sequence order; tombstoned keys vanish
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name", ["orders_cdc_apply", "orders_cdc_stream_apply"]
)
def test_cdc_twins_vs_sequential_op_fold(spark, orders, name):
    state: dict[int, float] = {}
    for k, _ck, _st, price, _dt, _pr in orders:  # seq 1: insert
        state[k] = float(price)
    for k, _ck, _st, price, _dt, _pr in orders:  # seq 2: update %7
        if k % 7 == 0:
            state[k] = float(price) + 50
    for k, _ck, _st, _price, _dt, _pr in orders:  # seq 3: delete %13
        if k % 13 == 0:
            del state[k]
    expected = [(k, _r(p, 2)) for k, p in sorted(state.items())]

    got = [(r.o_orderkey, r.price) for r in _run(name, spark)]
    assert got == expected


# --------------------------------------------------------------------------
# SCD2 stream: two update waves chain validity intervals per key
# --------------------------------------------------------------------------

_S2_T1 = "2002-01-01 00:00:00"
_S2_T2 = "2002-06-01 00:00:00"


def test_scd2_stream_vs_interval_chain_walk(spark, orders):
    hist: dict[int, list[list]] = {}
    for k, _ck, _st, price, dt, _pr in orders:
        hist[k] = [[float(price), dt.strftime(_FMT), None]]
    for wave_mod, bump, eff in ((10, 1000, _S2_T1), (20, 2000, _S2_T2)):
        for k, _ck, _st, price, _dt, _pr in orders:
            if k % wave_mod == 0:
                hist[k][-1][2] = eff  # close the current interval
                hist[k].append([float(price) + bump, eff, None])
    expected = []
    for k in sorted(hist):
        for p, vf, vt in hist[k]:
            expected.append(
                (k, _r(p, 2), vf, vt or "9999-12-31 00:00:00", vt is None)
            )

    got = [
        (r.o_orderkey, r.price, r.valid_from, r.valid_to, r.is_current)
        for r in _run("orders_scd2_stream_merge", spark)
    ]
    assert got == expected
    # %20 keys saw both waves: exactly three chained intervals
    n_per = defaultdict(int)
    for k, *_ in expected:
        n_per[k] += 1
    assert all(
        n == (3 if k % 20 == 0 else 2 if k % 10 == 0 else 1)
        for k, n in n_per.items()
    )


# --------------------------------------------------------------------------
# streaming rollup maintenance: additive (day, type) partials fold to the
# one-shot batch aggregate
# --------------------------------------------------------------------------


def test_daily_rollup_stream_vs_additive_fold(spark, events):
    acc: dict[tuple, list] = defaultdict(lambda: [0, 0])
    for ts, et, v in events:
        key = (ts.strftime("%Y-%m-%d"), et)
        acc[key][0] += 1
        acc[key][1] += int(_r(float(v) * 100, 0))
    expected = [(d, et, n, c) for (d, et), (n, c) in sorted(acc.items())]

    got = [
        (r.day, r.event_type, r.n_events, r.value_cents)
        for r in _run("daily_rollup_stream_merge", spark)
    ]
    assert got == expected


# --------------------------------------------------------------------------
# schema evolution: old files surface the new column as NULL
# --------------------------------------------------------------------------


def test_schema_evolution_vs_two_version_walk(spark, orders):
    agg: dict[str, list] = defaultdict(lambda: [0, 0, set()])
    for k, _ck, st, _p, _dt, _pr in orders:
        note = f"note-{k % 7}" if k % 2 == 1 else None
        agg[st][0] += 1
        if note is not None:
            agg[st][1] += 1
            agg[st][2].add(note)
    expected = [
        (st, n, wn, len(notes)) for st, (n, wn, notes) in sorted(agg.items())
    ]

    got = [
        (r.o_orderstatus, r.n_rows, r.with_note, r.distinct_notes)
        for r in _run("orders_schema_evolution", spark)
    ]
    assert got == expected
