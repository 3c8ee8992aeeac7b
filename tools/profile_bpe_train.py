"""Second-stage adjudication profiler: where inside train_bpe_merges does
the time go, and does the persist discipline cost more than it saves at
this SF? Times (a) vocabulary materialization into the block-manager
cache, (b) each winner-argmax collect on the cached vocab, (c) the same
train loop with NO persist (recompute from corpus each iteration), and
(d) plan-build/analysis overhead (DataFrame construction wall with no
job run)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flight_radar_pipeline_spark.session import get_spark_session
from flight_radar_pipeline_spark.plans.battery import load_table
from flight_radar_pipeline_spark.operators import bpe

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def train_once(docs, persist: bool) -> list[float]:
    """[materialize_or_first_iter, iter..., total] wall splits."""
    ts = []
    t_all = time.monotonic()
    base = bpe.word_vocabulary(docs)
    if persist:
        base = base.persist()
        t0 = time.monotonic()
        base.count()
        ts.append(("cache_build", time.monotonic() - t0))
    vocab = base
    for rank in range(1, 4):
        t0 = time.monotonic()
        win = (
            bpe._pair_counts(vocab)
            .orderBy(F.desc("n"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        ts.append((f"iter{rank}", time.monotonic() - t0))
        lhs, rhs = win[0]["lhs"], win[0]["rhs"]
        vocab = vocab.withColumn(
            "seq",
            F.replace(
                F.col("seq"), F.lit(f"({lhs})({rhs})"), F.lit(f"({lhs}{rhs})")
            ),
        )
    if persist:
        base.unpersist()
    ts.append(("total", time.monotonic() - t_all))
    return ts


def main() -> None:
    spark = get_spark_session()
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    docs.count()
    # JVM warmup
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    for persist in (True, False):
        print(f"\n== persist={persist} ==")
        for rep in range(REPS):
            spark.catalog.clearCache()
            parts = train_once(docs, persist)
            print(
                f"rep{rep}: "
                + " ".join(f"{k}={v:.3f}" for k, v in parts)
            )

    # plan-build overhead: construct the full entry DataFrame, never run it
    print("\n== DataFrame build+analysis wall (no job) ==")
    for rep in range(3):
        t0 = time.monotonic()
        df = bpe.encode_token_counts(docs, 3)  # runs train's jobs too
        t1 = time.monotonic()
        df.schema  # force analysis
        print(f"rep{rep}: build(incl train jobs)={t1 - t0:.3f}")
    print("loadavg:", os.getloadavg())


if __name__ == "__main__":
    main()
