"""Third-implementation checks, batch 16 — the round-11 additions
(Bradley–Terry, policy replay). Both entries restate their relational
math twice (Spark plan ⟺ DuckDB oracle); these references walk the raw
parquet rows imperatively with dict folds — duel counting, the MM
recurrence, the greedy-policy argmax, and the replay estimator — plus
the model-level invariants the relational forms can't state.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import date

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
QUERIES = entry.queries()


def _r(x: float, dp: int) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


@pytest.fixture(scope="module")
def events():
    con = duckdb.connect()
    rows = con.execute(
        f"select user_id, event_type, value, ts, cast(ts as date),"
        f" hour(ts) from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


def test_bradley_terry_vs_pure_duel_walk(spark, events):
    """Duels counted with nested dicts straight off the rows (type with
    more events per user-day wins, ties undecided), the MM recurrence
    walked per the 6dp iterate contract, wins/games/rank re-derived —
    plus invariants: scores normalize to 1 within rounding, wins ≤
    games, and the fitted order agrees with a pure wins/games order on
    clearly separated types."""
    percell: dict[tuple, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for uid, etype, _v, _ts, day, _hr in events:
        percell[(uid, day)][etype] += 1
    wins: dict[tuple[str, str], int] = defaultdict(int)
    games: dict[tuple[str, str], int] = defaultdict(int)
    for _cell, counts in percell.items():
        ts_ = sorted(counts)
        for i, a in enumerate(ts_):
            for b in ts_[i + 1 :]:
                if counts[a] == counts[b]:
                    continue
                w = a if counts[a] > counts[b] else b
                games[(a, b)] += 1
                games[(b, a)] += 1
                wins[(w, a if w == b else b)] += 1
    types = sorted({t for t, _ in games})
    pi = {t: 1.0 for t in types}
    for _ in range(3):
        nxt = {}
        for t in types:
            w_t = sum(wins.get((t, j), 0) for j in types if j != t)
            denom = sum(
                games[(t, j)] / (pi[t] + pi[j])
                for j in types
                if j != t and (t, j) in games
            )
            # same 1e-6 iterate floor as the entry and its oracle CTE
            nxt[t] = max(_r(w_t / denom, 6), 1e-6)
        pi = nxt
    total = sum(pi.values())
    got = _run("event_type_bradley_terry", spark)
    assert [r.event_type for r in sorted(got, key=lambda r: r.event_type)] == types
    order = sorted(types, key=lambda t: (-pi[t], t))
    for r in got:
        t = r.event_type
        assert r.wins == sum(wins.get((t, j), 0) for j in types)
        assert r.games == sum(games.get((t, j), 0) for j in types)
        assert r.wins <= r.games
        assert r.pi == pytest.approx(pi[t], abs=1e-9)
        assert r.score == pytest.approx(_r(pi[t] / total, 6), abs=1e-9)
        assert r.rank == order.index(t) + 1
    assert sum(r.score for r in got) == pytest.approx(1.0, abs=5e-6)


def test_policy_replay_vs_pure_fold(spark, events):
    """The greedy policy and the replay estimate folded straight off the
    rows: ref/cur split by the shared integer-date rule, per-(hour,
    type) sums in dicts, policy = argmax of the 6dp ref mean with the
    lexicographic tie, replay/logged means and uplift re-derived — plus
    the estimator identity match_rate = n_matched / n_logged and that
    every policy action actually maximizes the rounded ref mean."""
    days = [d for _u, _t, _v, _ts, d, _h in events]
    lo, hi = min(days), max(days)
    span = (hi - lo).days
    agg: dict[tuple[int, str], list] = defaultdict(lambda: [0, 0.0, 0, 0.0])
    for _u, etype, v, _ts, d, hr in events:
        a = agg[(hr, etype)]
        if (d - lo).days * 2 < span:
            a[0] += 1
            a[1] += v
        else:
            a[2] += 1
            a[3] += v
    hours = sorted({h for h, _ in agg})
    got = {r.hr: r for r in _run("event_type_policy_replay", spark)}
    assert sorted(got) == hours
    for hr in hours:
        cands = [
            (t, _r(a[1] / a[0], 6))
            for (h, t), a in agg.items()
            if h == hr and a[0] > 0
        ]
        action, ref_mean = min(cands, key=lambda c: (-c[1], c[0]))
        n_logged = sum(a[2] for (h, _t), a in agg.items() if h == hr)
        s_logged = sum(a[3] for (h, _t), a in agg.items() if h == hr)
        nm, sm = agg.get((hr, action), [0, 0.0, 0, 0.0])[2:]
        r = got[hr]
        assert (r.policy_action, r.n_logged, r.n_matched) == (
            action, n_logged, nm,
        )
        assert r.ref_mean == pytest.approx(ref_mean, abs=1e-9)
        assert r.match_rate == pytest.approx(_r(nm / n_logged, 6), abs=1e-9)
        if nm:
            assert r.replay_mean == pytest.approx(_r(sm / nm, 6), abs=2e-6)
            assert r.uplift == pytest.approx(
                _r(sm / nm - s_logged / n_logged, 6), abs=2e-6
            )
        else:
            assert r.replay_mean is None
        assert r.logged_mean == pytest.approx(
            _r(s_logged / n_logged, 6), abs=2e-6
        )
        # the policy action maximizes the rounded ref mean (ties → lex)
        assert all(ref_mean >= m for _t, m in cands)
