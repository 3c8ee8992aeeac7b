"""Z-order key properties: the interleave is a bijection on level pairs
(no two cells share a key), round-trips through de-interleaving, and
keeps curve locality (equal-level neighbors differ in low-order bits) —
the properties data skipping relies on. Engine parity is oracle-checked
in the battery (`event_zorder_keys`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.zorder import zorder_key

BITS = 4  # 2 cols × 4 bits → 256 cells, exhaustively checkable


def _deinterleave(key: int, n_cols: int, bits: int) -> tuple[int, ...]:
    vals = [0] * n_cols
    for i in range(bits):
        for c in range(n_cols):
            vals[c] |= ((key >> (i * n_cols + c)) & 1) << i
    return tuple(vals)


def test_zorder_bijective_and_roundtrips(spark):
    levels = 1 << BITS
    rows = [(x, y) for x in range(levels) for y in range(levels)]
    df = spark.createDataFrame(rows, "x int, y int")
    # domains sized so value v lands exactly in level v
    key = zorder_key(
        [F.col("x"), F.col("y")], [(0.0, float(levels)), (0.0, float(levels))],
        bits=BITS,
    )
    got = df.select("x", "y", key.alias("k")).collect()
    keys = {r["k"] for r in got}
    assert len(keys) == levels * levels  # bijection: every cell distinct
    assert max(keys) < 1 << (2 * BITS)
    for r in got:
        assert _deinterleave(r["k"], 2, BITS) == (r["x"], r["y"])


def test_zorder_clamps_out_of_domain(spark):
    df = spark.createDataFrame(
        [(-5.0, 2.0), (999.0, 2.0), (None, 2.0)], "x double, y double"
    )
    key = zorder_key([F.col("x"), F.col("y")], [(0.0, 16.0), (0.0, 16.0)], bits=BITS)
    ks = [r["k"] for r in df.select(key.alias("k")).collect()]
    lo = _deinterleave(ks[0], 2, BITS)
    hi = _deinterleave(ks[1], 2, BITS)
    nul = _deinterleave(ks[2], 2, BITS)
    assert lo == (0, 2) and hi == (15, 2) and nul == (0, 2)


def test_zorder_layout_prunes_every_dimension(spark, tmp_path):
    """Measured pruning claim (tools/zorder_bench.py in miniature): a
    time-sorted layout cannot prune a user-only predicate at all (every
    row group spans the full user range), while the z-ordered layout
    prunes SOME row groups on every dimension. The trade — z-order is
    worse than a perfect single-column sort on that column's own
    predicates — is recorded in BASELINE.md, not asserted here."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from zorder_bench import _overlapping_row_groups, write_layouts

    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    paths = write_layouts(
        spark,
        "/root/testdata/sf0.01",
        str(tmp_path),
        block_bytes=24 * 1024,
        uid_domain=(0.0, 150.0),  # sf0.01 has 150 users, not sf0.1's 1500
    )
    box_uid = (70, 77)  # ~5% of the sf0.01 user range
    hits = {
        (lname, dims): _overlapping_row_groups(p, *flags, box_uid=box_uid)
        for lname, p in paths.items()
        for dims, flags in {
            "user": (True, False),
            "time": (False, True),
            "both": (True, True),
        }.items()
    }
    total = hits[("zorder", "user")][1]
    assert total >= 8, f"need enough row groups to measure ({total})"
    # the one-column sort is blind on the other column
    assert hits[("ts_sorted", "user")][0] == total
    # z-order prunes on EVERY dimension
    for dims in ("user", "time", "both"):
        assert hits[("zorder", dims)][0] < total, dims
    # and beats the time-sorted layout on the dimension it cannot see
    assert hits[("zorder", "user")][0] < hits[("ts_sorted", "user")][0]


def test_write_zordered_clusters_both_dimensions(spark, tmp_path):
    """write_zordered output files each cover a narrow slice of EVERY
    clustered column's domain (that narrowness is what min/max pruning
    consumes); a ts-sorted write clusters only ts."""
    from flight_radar_pipeline_spark.sinks.writers import write_zordered
    from flight_radar_pipeline_spark.sources.readers import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events").withColumn(
        "ts_s", F.unix_timestamp("ts").cast("double")
    )
    out = str(tmp_path / "z")
    write_zordered(
        ev,
        out,
        cols=["user_id", "ts_s"],
        domains=[(0.0, 150.0), (1704067200.0, 1706659200.0)],
        target_records_per_file=1000,
    )
    back = spark.read.parquet(out)
    assert back.count() == ev.count()

    spans = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("user_id") - F.min("user_id")).alias("uspan"),
            (F.max("ts_s") - F.min("ts_s")).alias("tspan"),
        )
        .collect()
    )
    assert len(spans) >= 5
    # every per-file span is a fraction of the global domain, on BOTH dims
    avg_u = sum(r.uspan for r in spans) / len(spans)
    avg_t = sum(r.tspan for r in spans) / len(spans)
    assert avg_u < 0.6 * 150.0, avg_u
    assert avg_t < 0.6 * (1706659200.0 - 1704067200.0), avg_t
