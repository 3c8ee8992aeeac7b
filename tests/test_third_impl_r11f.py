"""Third-implementation checks, batch 18 — the sketch family: the HLL++
regime audit, the KMV distinct-count estimator, count-min point
estimates, and SimHash fingerprints + Hamming pairs. Every sketch here
is deterministic by construction (md5-derived hashes), so a plain
imperative Python walk from the parquet — hashlib, bit twiddling, dict
counters — is a genuine third witness beside the Spark plan and the
DuckDB oracle.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
QUERIES = entry.queries()


def _r(x: float, dp: int) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


@pytest.fixture(scope="module")
def events():
    con = duckdb.connect()
    rows = con.execute(
        f"select user_id, event_id, event_type from '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


# --------------------------------------------------------------------------
# HyperLogLog++ regime audit
# --------------------------------------------------------------------------

_HLL_P, _HLL_M, _HLL_ALPHA = 6, 64, 0.709
_HLL_WBITS = 52 - _HLL_P


def test_hll_regime_audit_vs_pure_registers(spark, events):
    """52-bit md5 hash split into 6-bit bucket + 46-bit suffix, ρ = 47
    for a zero suffix else 47 − bitlength, register = max ρ; the raw
    harmonic estimate, the HLL++ regime rule, and the chosen estimate
    all recomputed with plain ints and dicts. Also asserts the audit's
    own claim: both regimes appear in the relation."""
    regs: dict[tuple, dict[int, int]] = defaultdict(dict)
    exact: dict[tuple, set] = defaultdict(set)
    for uid, eid, etype in events:
        for metric, key in (("users", str(uid)), ("events", str(eid))):
            h = int(_md5(f"hll9-{metric}-{key}")[:13], 16)
            bucket, w = h % _HLL_M, h // _HLL_M
            rho = _HLL_WBITS + 1 if w == 0 else _HLL_WBITS + 1 - w.bit_length()
            g = (etype, metric)
            regs[g][bucket] = max(regs[g].get(bucket, 0), rho)
            exact[g].add(key)
    got = {(r.event_type, r.metric): r for r in _run("user_hll_sparse_audit", spark)}
    assert set(got) == set(regs)
    modes = set()
    for g, buckets in regs.items():
        n_exact = len(exact[g])
        v_zero = _HLL_M - len(buckets)
        z = sum(1.0 / (1 << rho) for rho in buckets.values())
        e_raw = _HLL_ALPHA * _HLL_M * _HLL_M / (v_zero + z)
        lc = e_raw <= 2.5 * _HLL_M and v_zero > 0
        est = _HLL_M * math.log(_HLL_M / v_zero) if lc else e_raw
        r = got[g]
        assert (r.n_exact, r.v_zero) == (n_exact, v_zero), g
        assert r.est_raw == pytest.approx(_r(e_raw, 2), abs=2e-2)
        assert r.mode == ("linear_counting" if lc else "raw")
        assert r.est == pytest.approx(_r(est, 2), abs=2e-2)
        assert r.rel_err == pytest.approx(
            _r((_r(est, 2) - n_exact) / n_exact, 4), abs=2e-4
        )
        modes.add(r.mode)
    assert modes == {"linear_counting", "raw"}  # the audit's design point


# --------------------------------------------------------------------------
# KMV distinct-count sketch
# --------------------------------------------------------------------------

_KMV_K = 32


def test_kmv_estimates_vs_pure_kth_minimum(spark, events):
    """Unit hash (24-bit md5 prefix + 0.5)/2²⁴ per distinct user; the
    k-th smallest decides the estimate (k−1)/h_k; groups under k report
    exactly. Plus the estimator's sanity: the estimate is positive and
    within a loose multiplicative band of the exact count."""
    du: dict[str, set] = defaultdict(set)
    for uid, _eid, etype in events:
        du[etype].add(uid)
    got = {r.event_type: r for r in _run("user_kmv_distinct", spark)}
    assert sorted(got) == sorted(du)
    for etype, users in du.items():
        hs = sorted(
            ((int(_md5(f"kmv-{u}")[:6], 16) + 0.5) / 16777216.0, u)
            for u in users
        )
        n = len(users)
        if n <= _KMV_K:
            est = float(n)
        else:
            est = _r((_KMV_K - 1) / hs[_KMV_K - 1][0], 3)
        r = got[etype]
        assert r.n_exact == n
        assert r.kmv_estimate == pytest.approx(est, abs=1e-6)
        assert r.kmv_estimate > 0
        if n > _KMV_K:
            assert 0.4 * n <= r.kmv_estimate <= 2.5 * n


# --------------------------------------------------------------------------
# count-min sketch point estimates
# --------------------------------------------------------------------------

_CMS_D, _CMS_W, _CMS_PROBE = 4, 256, 20


def test_cms_estimates_vs_pure_counter_grid(spark, events):
    """The 4×256 counter grid folded with dict counters; point estimate
    = min over rows. Plus the count-min guarantee: never under-counts
    the true frequency."""
    grid: dict[tuple[int, int], int] = defaultdict(int)
    truth: dict[int, int] = defaultdict(int)
    for uid, _eid, _etype in events:
        truth[uid] += 1
        for row in range(_CMS_D):
            b = int(_md5(f"{row}-{uid}")[:12], 16) % _CMS_W
            grid[(row, b)] += 1
    got = {r.user_id: r.est for r in _run("user_count_cms_estimates", spark)}
    probe = sorted(u for u in truth if u < _CMS_PROBE)
    assert sorted(got) == probe
    for u in probe:
        est = min(
            grid[(row, int(_md5(f"{row}-{u}")[:12], 16) % _CMS_W)]
            for row in range(_CMS_D)
        )
        assert got[u] == est
        assert est >= truth[u]  # CMS never under-counts


# --------------------------------------------------------------------------
# SimHash fingerprints + Hamming pairs
# --------------------------------------------------------------------------


def _simhash(tokens: dict[str, int]) -> str:
    """64-bit SimHash as 16 hex chars: per nibble position np and bit
    position bp, tokens vote w·(2·bit−1) with bit taken from md5's
    np-th hex digit; the majority sign sets the output bit."""
    out = []
    for np_ in range(16):
        nv = 0
        votes = [0, 0, 0, 0]
        for tok, w in tokens.items():
            nib = int(_md5(tok)[np_], 16)
            for bp in range(4):
                bit = (nib >> (3 - bp)) & 1
                votes[bp] += w * (2 * bit - 1)
        for bp in range(4):
            if votes[bp] > 0:
                nv += 1 << (3 - bp)
        out.append("0123456789abcdef"[nv])
    return "".join(out)


@pytest.fixture(scope="module")
def doc_tokens():
    import re

    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, text from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    out = {}
    for i, t in rows:
        counts: dict[str, int] = defaultdict(int)
        for tok in re.split(r"\s+", t.strip()):
            counts[tok] += 1
        out[int(i)] = counts
    return out


def test_simhash_fingerprints_vs_pure_votes(spark, doc_tokens):
    want = {
        i: _simhash(toks) for i, toks in doc_tokens.items() if i < 100
    }
    got = {r.doc_id: r.simhash for r in _run("doc_simhash", spark)}
    assert got == want


def test_simhash_pairs_vs_pure_pigeonhole(spark, doc_tokens):
    """4-nibble pigeonhole blocks generate candidates; exact xor
    popcount verifies Hamming ≤ 3 — and the pigeonhole guarantee holds:
    any pair within distance 3 shares at least one of 4 blocks, so the
    candidate stage loses nothing (asserted by comparing against the
    ALL-pairs verify)."""
    sigs = {i: _simhash(toks) for i, toks in doc_tokens.items()}
    ids = sorted(sigs)
    want = []
    for x, a in enumerate(ids):
        for b in ids[x + 1 :]:
            ham = bin(int(sigs[a], 16) ^ int(sigs[b], 16)).count("1")
            if ham <= 3:
                # pigeonhole check: they must share a 4-nibble block
                assert any(
                    sigs[a][blk * 4 : blk * 4 + 4]
                    == sigs[b][blk * 4 : blk * 4 + 4]
                    for blk in range(4)
                )
                want.append((a, b, ham))
    got = [
        (r.id_a, r.id_b, r.hamming)
        for r in _run("simhash_near_dup_pairs", spark)
    ]
    assert sorted(got) == sorted(want)
