"""One-off adjudication profiler for the doc_bpe_encode watch item
(BASELINE.md round-11 close): split the entry into its physical phases
and name where the ~1.7x elevation over the r10 record (1.57 s) lives.

Phases (matching operators/bpe.py::encode_token_counts):
  train   - train_bpe_merges: vocab persist + 3 argmax collect jobs
  final   - the encode job: vocab recompute -> replace chain -> n_sym,
            corpus explode -> broadcast join -> per-doc aggregate
Also runs the final phase with whole-stage codegen OFF to split
codegen-compile cost from execution cost, and with the vocab side
pre-materialized to split the duplicate corpus scan.

Usage: python tools/profile_bpe_encode.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flight_radar_pipeline_spark.session import get_spark_session
from flight_radar_pipeline_spark.plans.battery import load_table
from flight_radar_pipeline_spark.operators import bpe

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark_session()
    docs = load_table(spark, SF_DIR, "documents")
    docs.count()  # warm the scan

    rows = []
    for rep in range(REPS):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        merges = bpe.train_bpe_merges(docs, 3)
        mrows = merges.collect()
        t1 = time.monotonic()
        enc = bpe.encode_token_counts(docs, 3)
        _force(enc)
        t2 = time.monotonic()
        rows.append((t1 - t0, t2 - t1))
        print(f"rep{rep}: train={t1 - t0:.3f}s full_encode={t2 - t1:.3f}s")

    # full_encode re-trains internally; isolate the FINAL job by timing
    # encode_token_counts minus a fresh train on the same rep.
    print("\n-- codegen split on the final job (reuses trained merges) --")
    from pyspark.sql import functions as F
    from flight_radar_pipeline_spark.functions import text as T

    def final_df():
        seq = F.col("seq")
        for r in mrows:
            seq = F.replace(
                seq,
                F.lit(f"({r['lhs']})({r['rhs']})"),
                F.lit(f"({r['lhs']}{r['rhs']})"),
            )
        n_sym = F.size(
            F.expr(f"regexp_extract_all(__seq, '{bpe._SYM_RE_SQL}', 1)")
        )
        vocab = bpe.word_vocabulary(docs)
        encoded = vocab.select("word", seq.alias("__seq")).select(
            "word", n_sym.alias("n_sym")
        )
        words = docs.select(
            F.col("doc_id"), F.explode(T.tokens("text")).alias("word")
        )
        return (
            words.join(F.broadcast(encoded), "word")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_words"),
                F.sum("n_sym").cast("bigint").alias("n_subwords"),
            )
        )

    for flag in ("true", "false"):
        spark.conf.set("spark.sql.codegen.wholeStage", flag)
        ts = []
        for _ in range(REPS):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            _force(final_df())
            ts.append(time.monotonic() - t0)
        ts.sort()
        print(
            f"final job wholeStage={flag}: median={ts[len(ts) // 2]:.3f}s"
            f" all={[round(t, 3) for t in ts]}"
        )
    spark.conf.set("spark.sql.codegen.wholeStage", "true")

    # Split the 3 train collects individually on one more rep
    print("\n-- per-iteration train split --")
    base = bpe.word_vocabulary(docs).persist()
    base.count()
    vocab = base
    for rank in range(1, 4):
        t0 = time.monotonic()
        win = (
            bpe._pair_counts(vocab)
            .orderBy(F.desc("n"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        dt = time.monotonic() - t0
        lhs, rhs = win[0]["lhs"], win[0]["rhs"]
        print(f"iter{rank}: {dt:.3f}s winner=({lhs},{rhs})")
        vocab = vocab.withColumn(
            "seq",
            F.replace(
                F.col("seq"), F.lit(f"({lhs})({rhs})"), F.lit(f"({lhs}{rhs})")
            ),
        )
    base.unpersist()

    tr = sorted(r[0] for r in rows)
    fe = sorted(r[1] for r in rows)
    print(
        f"\nmedians over {REPS} reps: train={tr[len(tr) // 2]:.3f}s"
        f" full_encode={fe[len(fe) // 2]:.3f}s"
        f" entry_total~={tr[len(tr) // 2] + fe[len(fe) // 2]:.3f}s"
        " (entry runs train inside encode; bench times encode only)"
    )
    print("loadavg:", os.getloadavg())


if __name__ == "__main__":
    main()
