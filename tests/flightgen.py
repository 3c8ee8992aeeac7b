"""Deterministic synthetic flight-domain fixture generator (seed-fixed).

Produces airlines / airports / flights_raw shaped exactly like the
reference's declared schemas (FIXTURES.md §§1-3) without copying any
reference data. Includes the awkward cases on purpose: duplicate flight ids
(dedup), IATA/ICAO codes that miss the dimensions (inner-join drops), junk
countries (continent → "Unknown").
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from flight_radar_pipeline_spark.functions.continents import COUNTRY_TO_CONTINENT

SEED = 7
N_AIRLINES = 150
N_AIRPORTS = 200
N_FLIGHTS = 5000
N_DUP_IDS = 200  # extra rows re-using an existing id
SNAPSHOT_EPOCH = 1713453420  # 2024-04-18 17:17:00 UTC — single-snapshot feel

_LETTERS = np.array(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ"))


def _codes(rng: np.random.Generator, n: int, length: int) -> list[str]:
    """n unique uppercase codes of the given length."""
    seen: set[str] = set()
    out: list[str] = []
    while len(out) < n:
        code = "".join(rng.choice(_LETTERS, size=length))
        if code not in seen:
            seen.add(code)
            out.append(code)
    return out


def gen_airlines(rng: np.random.Generator) -> pd.DataFrame:
    icao = _codes(rng, N_AIRLINES, 3)
    return pd.DataFrame(
        {"Name": [f"Airline {c}" for c in icao], "ICAO": icao}
    )


def gen_airports(rng: np.random.Generator) -> pd.DataFrame:
    iata = _codes(rng, N_AIRPORTS, 3)
    countries = list(COUNTRY_TO_CONTINENT)
    picks = [countries[i] for i in rng.integers(0, len(countries), N_AIRPORTS)]
    # a few junk countries → continent "Unknown" via lookup miss
    for j in range(0, N_AIRPORTS, 37):
        picks[j] = f"Atlantis-{j}"
    return pd.DataFrame(
        {
            "name": [f"Airport {c}" for c in iata],
            "iata": iata,
            "latitude": (rng.uniform(-90, 90, N_AIRPORTS)).astype(np.float32),
            "longitude": (rng.uniform(-180, 180, N_AIRPORTS)).astype(np.float32),
            "country": picks,
        }
    )


def gen_flights_raw(
    rng: np.random.Generator, airports: pd.DataFrame, airlines: pd.DataFrame
) -> pd.DataFrame:
    n = N_FLIGHTS
    ids = [f"{v:08x}" for v in rng.integers(0, 2**32, n, dtype=np.uint64)]
    aircraft = [f"A{c}" for c in _codes(rng, 30, 3)]
    iatas = list(airports["iata"]) + ["XX1", "XX2"]  # dimension misses
    icaos = list(airlines["ICAO"]) + ["ZZZ"]

    df = pd.DataFrame(
        {
            "id": ids,
            "aircraft_code": [aircraft[i] for i in rng.integers(0, len(aircraft), n)],
            "time": (SNAPSHOT_EPOCH + rng.integers(0, 3600, n)).astype(np.int32),
            "latitude": rng.uniform(-90, 90, n).astype(np.float32),
            "longitude": rng.uniform(-180, 180, n).astype(np.float32),
            "origin_airport_iata": [iatas[i] for i in rng.integers(0, len(iatas), n)],
            "destination_airport_iata": [
                iatas[i] for i in rng.integers(0, len(iatas), n)
            ],
            "number": [f"FL{v:04d}" for v in rng.integers(0, 10000, n)],
            "on_ground": rng.integers(0, 2, n).astype(np.int32),
            "airline_icao": [icaos[i] for i in rng.integers(0, len(icaos), n)],
        }
    )
    # duplicate-id rows with a later `time` — silver dedup must keep these
    dup = df.sample(n=N_DUP_IDS, random_state=SEED).copy()
    dup["time"] = dup["time"] + 7200
    dup["latitude"] = dup["latitude"] + np.float32(0.5)
    return pd.concat([df, dup], ignore_index=True)


def generate() -> dict[str, pd.DataFrame]:
    rng = np.random.default_rng(SEED)
    airlines = gen_airlines(rng)
    airports = gen_airports(rng)
    flights = gen_flights_raw(rng, airports, airlines)
    return {"airlines": airlines, "airports": airports, "flights_raw": flights}
