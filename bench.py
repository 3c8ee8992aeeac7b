"""Benchmark runner: every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Each query's full plan is forced with the noop sink (distributed execution,
no driver collect) TWICE: the first (cold) timing carries codegen,
Python-worker spin-up (pandas/stateful stages), and stream machinery
startup; the second (warm) timing is the plan's steady-state cost — the
number that attributes round-over-round changes to plan changes instead
of JVM/ordering noise. Reported as one JSON line:
{"metric": ..., "value": warm_total_sec, "unit": "sec",
 "queries": {name: warm_sec}, "cold_total": ...,
 "timing_mode": "warm-of-2+median3-sub1s", "sf": ..., "n_queries": ...,
 "detail": "BENCH_DETAIL.json"}

The harness that records this line keeps only the final ~2000 characters
of stdout, so the line is HARD-CAPPED at _STDOUT_LINE_BUDGET bytes: the
per-query map keeps the slowest queries first and drops the fastest ones
until the line fits ("queries_omitted" counts the drops). The FULL
warm+cold per-query numbers always go to BENCH_DETAIL.json at the repo
root (committed per round, diffable round-over-round).

The catalog cache is cleared after each query so per-operator persists
(shingle/gram-set materializations) can't accumulate across the battery
or leak one query's cache into the next one's cold run.

Machine-state evidence (round-8 verdict item 2): os.getloadavg() is
stamped before/after the battery, and a fixed-cost calibration probe (a
constant 10⁷-row local-range aggregate, median of 3) runs at battery
start and end. Both land in the JSON line ("calib", "load1m") and in
BENCH_DETAIL ("machine"), so the co-tenant adjudication — median ratio
across unchanged plans ≈ calibration-probe ratio ⇒ uniform contention —
is a one-line computation (tools/bench_compare.py prints it; its --gate
mode refuses an inflated BENCH_DETAIL commit).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from flight_radar_pipeline_spark.session import get_spark_session

# Total stdout-line budget in bytes. The recording harness keeps a 2000-char
# tail of stdout and parses the JSON line out of it; a line longer than the
# tail gets its head truncated and parses as nothing (this silently dropped
# the round-3 record once the battery passed ~65 queries). 1800 leaves slack
# for a trailing newline plus any console noise emitted after the line.
_STDOUT_LINE_BUDGET = 1800


def _time_with_retry(one_run) -> tuple[float, float]:
    """(cold, warm) from a zero-arg timing callable (negative = error).

    Warm physically cannot cost more than cold for an unchanged plan, so
    warm > cold means a one-off machine stall landed in the warm pass
    (round-4's CMS entry recorded 9.2s warm vs 3.0s cold that way). One
    retry on that signature; keep the better warm.

    Sub-second queries live inside the shared-machine jitter band (±2×
    scheduler noise on a ~0.3 s wall kept generating false movers in
    round-over-round comparisons — most_valuable_order,
    top_pmi_collocations in r6), so when the first warm pass lands under
    1 s the reported warm is the MEDIAN of three warm passes (still
    capped at cold). Queries ≥ 1 s keep the cheaper warm-of-2."""
    cold = one_run()
    if cold < 0:
        return cold, cold
    warm = one_run()
    if warm > cold:
        retry = one_run()
        if 0 <= retry < warm:
            warm = retry
        # Any completed run upper-bounds the steady-state plan cost, so
        # the cold time itself is the tightest remaining warm estimate if
        # both warm passes were slower (sub-ms jitter on fast queries).
        warm = min(warm, cold)
    if 0 <= warm < 1.0:
        samples = sorted(
            x for x in (warm, one_run(), one_run()) if x >= 0
        )
        warm = min(cold, samples[len(samples) // 2])
    return cold, warm


def _calibration_probe(spark) -> float:
    """Fixed-cost machine-state probe: a constant 10⁷-row local-range
    aggregate through the noop sink, median of 3. Identical work every
    round, so probe_new/probe_old measures MACHINE speed, not plan
    changes — run at battery start AND end, it makes the co-tenant
    adjudication ("median ratio across unchanged plans ≈ calibration
    ratio ⇒ uniform contention, not regressions") a one-line
    computation any round's judge can re-run (round-8 verdict item 2;
    the r8 phantom-mover incident is the motivating case)."""
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(10_000_000).selectExpr(
            "sum(id * 3 % 7)", "count(distinct id % 1024)"
        ).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return round(sorted(samples)[1], 3)


def _loadavg() -> list[float]:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:  # platform without getloadavg
        return []


def _fit_line(payload: dict, warm: dict[str, float]) -> str:
    """Serialize `payload` compactly, dropping fastest per-query entries
    until the line fits the stdout budget (slowest queries are the ones a
    baseline comparison needs; the detail file always has everything)."""
    keep = sorted(warm, key=lambda n: warm[n], reverse=True)
    while True:
        payload["queries"] = {n: warm[n] for n in keep}
        payload["queries_omitted"] = len(warm) - len(keep)
        line = json.dumps(payload, separators=(",", ":"))
        if len(line) <= _STDOUT_LINE_BUDGET or not keep:
            return line
        keep.pop()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # AMBIENT load snapshot taken before the session boots: JVM startup
    # and the warmups below burn cores for seconds, and a loadavg read
    # after them would stamp self-induced load as machine contention
    # (review findings, round 13) — the quiet-window gate consumes this.
    load_start = _loadavg()

    spark = get_spark_session(app_name="frp-spark-bench", timezone="UTC")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup so the first query's timing is query cost, not
    # session startup
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    # Calibration probe runs HERE — after the basic range warmup, before
    # the plan-machinery warmup below — exactly the conditions every
    # pre-round-13 record ran it under, so probe_new/probe_old stays a
    # pure machine-speed ratio across the warmup-change boundary
    # (review finding, round 13).
    calib_start = _calibration_probe(spark)

    # Plan-machinery JIT warmup (round-13 run-position adjudication):
    # entries at run positions 0-49 — exactly the correctness-window
    # seats, which every rotation reshuffles — used to read ~0.2-0.5 s
    # high because hash-agg / join / window / generate codepaths JIT
    # only as the battery progresses. Exercise each family once on
    # synthetic range() inputs (no battery table, file, or cache is
    # touched) so early seats are measured on the same warmth late
    # seats always had. Fixed ~5 s cost, paid before the calibration
    # probe (the ambient load stamp is taken above, before any warmup).
    _a = spark.range(2_000_000).selectExpr(
        "id", "id % 97 as k", "cast(id % 1009 as double) as v"
    )
    _b = spark.range(50_000).selectExpr("id as k2", "id % 13 as g")
    for _wdf in (
        _a.groupBy("k").agg(
            {"v": "sum", "id": "max"}
        ),  # partial+final hash aggregate
        _a.join(_b.hint("merge"), _a["k"] == _b["k2"]).groupBy("g").count(),
        _a.join(_b.hint("broadcast"), _a["k"] == _b["k2"]).select("g", "v"),
        _a.selectExpr(
            "k", "v", "row_number() over (partition by k order by v) as rn"
        ).filter("rn <= 2"),
        _a.selectExpr("k", "explode(sequence(1, 3)) as e").groupBy(
            "k"
        ).count(),
        _a.orderBy("v").limit(100),
    ):
        _wdf.write.format("noop").mode("overwrite").save()

    queries = entrymod.queries()
    # Optional subset filter (comma-separated names) for targeted runs,
    # e.g. the sf1 scale-up of the expensive families; unset = full battery.
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        queries = {n: queries[n] for n in names if n in queries}
    warm: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, fn in queries.items():

        def _one_run() -> float:
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)  # noqa: B023 — consumed before rebind
                df.write.format("noop").mode("overwrite").save()
                return round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001 — record, don't abort
                print(
                    f"# bench error {name}: {type(exc).__name__}: {exc}",
                    file=sys.stderr,
                )
                return -1.0

        cold[name], warm[name] = _time_with_retry(_one_run)
        spark.catalog.clearCache()

    calib_end = _calibration_probe(spark)
    load_end = _loadavg()
    machine = {
        "load_start": load_start,
        "load_end": load_end,
        "calib_start_sec": calib_start,
        "calib_end_sec": calib_end,
        "calib_probe": "range(1e7) sum(id*3%7)+count(distinct id%1024), median of 3",
    }

    warm_total = round(sum(v for v in warm.values() if v >= 0), 3)
    cold_total = round(sum(v for v in cold.values() if v >= 0), 3)
    sf_val = float(sf) if sf.replace(".", "", 1).isdigit() else sf

    detail = {
        "metric": "battery_total_wall",
        "value": warm_total,
        "unit": "sec",
        "queries": warm,
        "queries_cold": cold,
        "cold_total": cold_total,
        "timing_mode": "warm-of-2+median3-sub1s",
        "sf": sf_val,
        "n_queries": len(warm),
        "machine": machine,
    }
    root = os.path.dirname(os.path.abspath(__file__))
    # BENCH_DETAIL.json stays the "latest" pointer; a round-stamped copy
    # (BENCH_DETAIL_r{N}.json, round from $SPARK_GRAFT_ROUND or inferred
    # as max existing BENCH_r{N}.json) lands BESIDE it so round-over-round
    # per-query comparison never needs git archaeology of an overwritten
    # file. Subset runs (SPARK_GRAFT_ONLY) skip the stamped copy — they
    # are targeted experiments, not the round record.
    paths = [os.path.join(root, "BENCH_DETAIL.json")]
    if not only:
        rnd = os.environ.get("SPARK_GRAFT_ROUND")
        if rnd is None:
            stamped = [
                n for n in os.listdir(root)
                if n.startswith("BENCH_r") and n.endswith(".json")
            ]
            nums = [
                int(n[len("BENCH_r"):-len(".json")])
                for n in stamped
                if n[len("BENCH_r"):-len(".json")].isdigit()
            ]
            # BENCH_r{N}.json is written by the DRIVER (from this
            # script's stdout), normally after this run — so the next
            # round is max+1. But if the driver pre-wrote the current
            # round's BENCH_r{N}.json before bench.py ran, a bare max+1
            # would mis-file the detail one round ahead; the detail file
            # itself disambiguates: BENCH_DETAIL_r{max} already present
            # means round max is fully recorded (we are in max+1),
            # absent means we ARE round max.
            if not nums:
                rnd = "1"
            else:
                top = max(nums)
                has_detail = os.path.exists(
                    os.path.join(root, f"BENCH_DETAIL_r{top:02d}.json")
                )
                rnd = str(top + 1) if has_detail else str(top)
        paths.append(os.path.join(root, f"BENCH_DETAIL_r{int(rnd):02d}.json"))
    for p in paths:
        with open(p, "w") as fh:
            json.dump(detail, fh, indent=1)
            fh.write("\n")

    print(
        _fit_line(
            {
                "metric": "battery_total_wall",
                "value": warm_total,
                "unit": "sec",
                "cold_total": cold_total,
                "timing_mode": "warm-of-2+median3-sub1s",
                "sf": sf_val,
                "n_queries": len(warm),
                "calib": [calib_start, calib_end],
                "load1m": (
                    [load_start[0], load_end[0]]
                    if load_start and load_end
                    else []
                ),
                "detail": "BENCH_DETAIL.json",
            },
            warm,
        )
    )
    spark.stop()
    return 0 if all(v >= 0 for v in warm.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
