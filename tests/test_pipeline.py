"""Pipeline parity: silver dedup/time semantics and the gold join+distance
build, each checked against an independent DuckDB oracle over the same
parquet (SURVEY.md §5 tier 2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle import compare


def test_silver_unique_ids(spark, flight_tables):
    silver = spark.read.parquet(flight_tables["flights_silver"])
    assert silver.count() == silver.select("id").distinct().count()


def test_silver_dedup_keeps_latest(spark, flight_tables, duck):
    # winners must carry the max time per id (dedup orders by time desc)
    silver = spark.read.parquet(flight_tables["flights_silver"])
    import flightgen

    dup_ids = duck.sql(
        "select id from flights_silver group by id having count(*) > 1"
    ).df()
    assert len(dup_ids) == 0
    # duplicated raw ids got time+7200; silver must hold the later one.
    pdfs = flightgen.generate()
    raw = pdfs["flights_raw"]
    dups = raw[raw.duplicated("id", keep=False)]
    latest = dups.groupby("id")["time"].max()
    got = {
        r.id: r.time
        for r in silver.filter(F.col("id").isin(list(latest.index))).collect()
    }
    from_unix = duck.sql(
        "select strftime(timezone('Europe/Paris', to_timestamp(?)), "
        "'%Y-%m-%d %H:%M:%S') s",
        params=[int(latest.iloc[0])],
    ).fetchone()[0]
    assert got[latest.index[0]] == from_unix


def test_gold_row_count_inner_join_drops(duck, gold):
    want = duck.sql(
        """
        select count(*) c
        from flights_silver s
        join airports ao on s.origin_airport_iata = ao.iata
        join airports ad on s.destination_airport_iata = ad.iata
        join airlines al on s.airline_icao = al.ICAO
        """
    ).fetchone()[0]
    assert gold.count() == want
    assert want < duck.sql("select count(*) from flights_silver").fetchone()[0]


def test_gold_schema(gold):
    from flight_radar_pipeline_spark import schemas

    assert [f.name for f in gold.schema.fields] == [
        f.name for f in schemas.FLIGHTS_GOLD.fields
    ]
    types = {f.name: f.dataType.simpleString() for f in gold.schema.fields}
    assert types["distance"] == "float"
    assert types["origin_latitude"] == "float"
    assert types["on_ground"] == "int"
    assert types["time"] == "string"


def test_gold_distance_matches_oracle_f32(gold, duck):
    """Distance parity: double-precision haversine cast to float32, exactly
    reproducible by DuckDB (REAL = float32)."""
    got = gold.select("id", "distance")
    sql = """
        select id,
               cast(2 * 6371 * asin(sqrt(
                   pow(sin((radians(destination_latitude) - radians(origin_latitude)) / 2), 2)
                   + cos(radians(origin_latitude)) * cos(radians(destination_latitude))
                   * pow(sin((radians(destination_longitude) - radians(origin_longitude)) / 2), 2)
               )) as real) as distance
        from flights_gold
    """
    compare(got, sql, duck, float_rtol=1e-6)


def test_observed_counts_single_pass(spark):
    from flight_radar_pipeline_spark.pipeline.metrics import observed_counts

    df, obs = observed_counts(spark.range(123).select("id"), "silver_rows")
    df.write.format("noop").mode("overwrite").save()
    assert obs.get["rows"] == 123
