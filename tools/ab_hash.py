"""Old-vs-new result-identity check at an arbitrary SF: runs the named
entries from TWO repo checkouts (old first on sys.path, then new) in one
Spark session and compares canonicalized collected rows exactly.

Usage: python tools/ab_hash.py <old_repo> <new_repo> <sf_dir> n1,n2,...
"""

from __future__ import annotations

import importlib
import sys


def load_registry(repo: str):
    # wipe any previously imported repo modules so the other checkout's
    # code actually loads
    for mod in list(sys.modules):
        if mod.startswith("flight_radar_pipeline_spark") or mod == "__spark_entry__":
            del sys.modules[mod]
    sys.path.insert(0, repo)
    entry = importlib.import_module("__spark_entry__")
    reg = entry._registry()
    sys.path.remove(repo)
    return reg


def canon(df):
    return sorted(tuple(r) for r in df.collect())


def main() -> int:
    old_repo, new_repo, sf_dir, names_csv = sys.argv[1:5]
    names = [n for n in names_csv.split(",") if n]

    sys.path.insert(0, new_repo)
    from flight_radar_pipeline_spark.session import get_spark_session

    spark = get_spark_session(app_name="ab-hash", timezone="UTC")
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.remove(new_repo)

    rc = 0
    for name in names:
        rows = {}
        for label, repo in (("old", old_repo), ("new", new_repo)):
            reg = load_registry(repo)
            rows[label] = canon(reg[name].build(spark, sf_dir))
            spark.catalog.clearCache()
        same = rows["old"] == rows["new"]
        print(f"{'OK ' if same else 'DIFF'} {name}: {len(rows['new'])} rows")
        if not same:
            rc = 1
            for a, b in zip(rows["old"], rows["new"]):
                if a != b:
                    print("  first diff:\n   old", a, "\n   new", b)
                    break
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
