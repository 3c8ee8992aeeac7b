"""Third-implementation checks, batch 15 — BPE training/encoding,
geographic DBSCAN, and entity-resolution survivorship (round-10 verdict
directive 3). Each recomputes the answer in plain imperative Python from
the parquet (duckdb used only as a reader): the BPE walk operates on the
same wrapped-symbol strings with ``str.replace`` (left-to-right
non-overlapping, the engines' replace semantics), DBSCAN runs the naive
all-pairs radius scan + union-find, and the golden records run
Fellegi–Sunter scoring + union-find closure + explicit survivorship
picks — no SQL restatement anywhere.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
QUERIES = entry.queries()

_BPE_N = 3


def _run(name, spark):
    return QUERIES[name](spark, SF_DIR).collect()


# --------------------------------------------------------------------------
# BPE merges + encode
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def doc_words():
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, text from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    return [(int(i), re.split(r"\s+", t.strip())) for i, t in rows]


def _bpe_walk(doc_words):
    """(merges, final vocab seqs): the wrapped-symbol walk. Vocabulary =
    (word, freq); each round counts adjacent symbol pairs weighted by
    freq, picks (n desc, lhs asc, rhs asc), and fuses via str.replace on
    the wrapped string — the exact left-to-right non-overlap semantics
    both engines state (so '(a)(a)(a)' fuses its FIRST pair only)."""
    freq: dict[str, int] = defaultdict(int)
    for _i, words in doc_words:
        for w in words:
            freq[w] += 1
    seq = {w: re.sub(r"(.)", r"(\1)", w) for w in freq}
    merges = []
    for rank in range(1, _BPE_N + 1):
        counts: dict[tuple[str, str], int] = defaultdict(int)
        for w, s in seq.items():
            syms = re.findall(r"\(([^)]+)\)", s)
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freq[w]
        (lhs, rhs), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, lhs, rhs, n))
        old, new = f"({lhs})({rhs})", f"({lhs}{rhs})"
        seq = {w: s.replace(old, new) for w, s in seq.items()}
    return merges, seq


def test_bpe_merges_vs_pure_string_walk(spark, doc_words):
    merges, _seq = _bpe_walk(doc_words)
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.n)
        for r in _run("doc_bpe_merges", spark)
    ]
    assert got == merges


def test_bpe_encode_vs_pure_string_walk(spark, doc_words):
    """Encoding = per-word post-merge symbol count, exploded back to
    documents: n_words whitespace tokens, n_subwords = Σ symbols."""
    _merges, seq = _bpe_walk(doc_words)
    n_sym = {w: len(re.findall(r"\(([^)]+)\)", s)) for w, s in seq.items()}
    want = []
    for doc_id, words in sorted(doc_words):
        want.append(
            (doc_id, len(words), sum(n_sym[w] for w in words))
        )
    got = [
        (r.doc_id, r.n_words, r.n_subwords)
        for r in _run("doc_bpe_encode", spark)
    ]
    assert got == want
    # fusing can only shrink: every document's subword count lies in
    # [n_words, n_chars]
    for (_i, words), (_d, nw, ns) in zip(sorted(doc_words), want):
        assert nw <= ns <= sum(len(w) for w in words)


# --------------------------------------------------------------------------
# geographic DBSCAN
# --------------------------------------------------------------------------

_DB_EPS_KM = 120.0


def _md5_coord(salt: str, key: int, mod: int, half: float) -> float:
    h = int(hashlib.md5(f"{salt}-{key}".encode()).hexdigest()[:12], 16)
    return (h % mod) / 10.0 - half


def _hav_km(lat1, lon1, lat2, lon2) -> float:
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    return (
        2
        * 6371
        * math.asin(
            math.sqrt(
                math.sin((rl2 - rl1) / 2) ** 2
                + math.cos(rl1)
                * math.cos(rl2)
                * math.sin(
                    (math.radians(lon2) - math.radians(lon1)) / 2
                )
                ** 2
            )
        )
    )


class _UF:
    def __init__(self):
        self.p: dict = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def test_geo_dbscan_vs_pure_all_pairs_walk(spark):
    """Naive O(n²) radius scan over the md5-derived coordinates,
    self-sized min_pts, core = |eps-neighborhood incl. self| >= min_pts,
    clusters = union-find over core–core pairs labeled by min id,
    border = non-core with a core neighbor (min cluster id), noise
    otherwise — the imperative restatement of both the grid-bucketed
    Spark plan and the recursive-CTE oracle."""
    con = duckdb.connect()
    keys = [
        int(k)
        for (k,) in con.execute(
            f"select c_custkey from '{SF_DIR}/customer.parquet'"
        ).fetchall()
    ]
    con.close()
    pts = {
        k: (
            _md5_coord("lat", k, 900, 45.0),
            _md5_coord("lon", k, 600, 30.0),
        )
        for k in keys
    }
    nbrs: dict[int, set[int]] = {k: set() for k in keys}
    npairs = 0
    ks = sorted(keys)
    for i, a in enumerate(ks):
        for b in ks[i + 1 :]:
            if _hav_km(*pts[a], *pts[b]) <= _DB_EPS_KM:
                nbrs[a].add(b)
                nbrs[b].add(a)
                npairs += 1
    mp = max(3, math.ceil(2.0 * npairs / len(ks)) + 1)
    core = {k for k in ks if len(nbrs[k]) + 1 >= mp}
    uf = _UF()
    for a in core:
        uf.find(a)
        for b in nbrs[a]:
            if b in core:
                uf.union(a, b)
    # label = min id in the core component
    comp_min: dict[int, int] = {}
    for a in core:
        r = uf.find(a)
        comp_min[r] = min(comp_min.get(r, a), a)
    want = {}
    for k in ks:
        if k in core:
            want[k] = (comp_min[uf.find(k)], "core")
        else:
            cls = [comp_min[uf.find(b)] for b in nbrs[k] if b in core]
            want[k] = (min(cls), "border") if cls else (None, "noise")
    got = {
        r.id: (r.cluster_id, r.role)
        for r in _run("customer_geo_dbscan", spark)
    }
    assert got == want
    # sanity on the walk itself: every border point is eps-close to a
    # core point of its assigned cluster
    for k, (cid, role) in want.items():
        if role == "border":
            assert any(
                b in core and comp_min[uf.find(b)] == cid
                for b in nbrs[k]
            )


# --------------------------------------------------------------------------
# entity resolution → golden records
# --------------------------------------------------------------------------

_FS_MU = {
    "p_type": (0.9, 1 / 6),
    "p_name": (0.7, 0.08),
    "p_retailprice": (0.8, 0.1),
}
_ER_THRESHOLD = 5.0


def _fs_w(field):
    m, u = _FS_MU[field]
    return (
        math.log(m / u) / math.log(2.0),
        math.log((1 - m) / (1 - u)) / math.log(2.0),
    )


def test_golden_records_vs_pure_fs_walk(spark):
    """(brand, size)-blocked Fellegi–Sunter pair scoring, threshold 5.0,
    union-find transitive closure, then explicit survivorship picks
    (longest name / max price / modal type with the stated tiebreaks) —
    a dict-and-loop restatement of resolve_entities."""
    con = duckdb.connect()
    rows = con.execute(
        f"""select p_partkey, p_brand, p_size, p_type, p_name,
                   p_retailprice from '{SF_DIR}/part.parquet'"""
    ).fetchall()
    con.close()
    recs = {
        int(k): {
            "brand": br, "size": sz, "type": ty, "name": nm,
            "price": float(pr),
        }
        for k, br, sz, ty, nm, pr in rows
    }
    wt, wtd = _fs_w("p_type")
    wn, wnd = _fs_w("p_name")
    wp, wpd = _fs_w("p_retailprice")
    blocks: dict[tuple, list[int]] = defaultdict(list)
    for k, r in recs.items():
        blocks[(r["brand"], r["size"])].append(k)
    uf = _UF()
    for _blk, members in blocks.items():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                ra, rb = recs[a], recs[b]
                w = (
                    (wt if ra["type"] == rb["type"] else wtd)
                    + (
                        wn
                        if ra["name"].split(" ")[0]
                        == rb["name"].split(" ")[0]
                        else wnd
                    )
                    + (
                        wp
                        if abs(ra["price"] - rb["price"]) <= 10.0
                        else wpd
                    )
                )
                if w >= _ER_THRESHOLD:
                    uf.union(a, b)
    ents: dict[int, list[int]] = defaultdict(list)
    for k in recs:
        ents[uf.find(k)].append(k)
    want = []
    for _root, members in ents.items():
        eid = min(members)
        names = [recs[k]["name"] for k in members]
        name = max(names, key=lambda nm: (len(nm), nm))
        tc: dict[str, int] = defaultdict(int)
        for k in members:
            tc[recs[k]["type"]] += 1
        mtype = max(tc.items(), key=lambda kv: (kv[1], kv[0]))[0]
        want.append(
            (
                eid,
                len(members),
                ",".join(str(k) for k in sorted(members)),
                name,
                max(recs[k]["price"] for k in members),
                mtype,
            )
        )
    want.sort()
    got = [
        (
            r.entity_id, r.n_members, r.member_ids, r.p_name,
            float(r.p_retailprice), r.p_type,
        )
        for r in _run("part_golden_records", spark)
    ]
    assert got == want
    # closure sanity: entity ids are the min member and partition the key set
    all_members = [int(x) for r in want for x in r[2].split(",")]
    assert sorted(all_members) == sorted(recs)
