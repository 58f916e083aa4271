"""Measure the skew utilities' actual wall-clock win on a hot-keyed frame.

Generates a deliberately skewed dataset (one key owns 50% of rows) at
sf0.1-like scale and times:
  1. groupBy sum: plain vs salted_agg
  2. equi-join against an above-broadcast build side: plain shuffle join
     vs replicated_skew_join
Each timing is the median of 3 runs after a warmup, same discipline as
bench.py. Results go into PLANS.md (skew section).

Usage: python tools/measure_skew.py [n_rows] [n_salts ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wsspark.session import get_session
from wsspark.skew import replicated_skew_join, salted_agg


def timed(fn) -> float:
    fn()
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(sorted(samples)[1], 3)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    salt_choices = [int(s) for s in sys.argv[2:]] or [8, 16, 32]
    spark = get_session(app_name="wsspark-skew-measure")
    spark.sparkContext.setLogLevel("ERROR")
    # No broadcast: the build side must shuffle, which is the regime the
    # utilities target (broadcast needs no skew handling at all).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    # 50% of rows on key 0, rest uniform over 1..999
    probe = (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(999)) + 1)
            .alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
            F.col("id").alias("rid"),
        )
        .localCheckpoint()  # freeze inputs so generation cost isn't timed
    )
    build = (
        spark.range(32_000)
        .select(
            F.pmod(F.col("id"), F.lit(1000)).alias("k"),
            (F.col("id") % 7).cast("double").alias("w"),
        )
        .localCheckpoint()
    )

    results: list[tuple[str, float]] = []

    results.append(
        (
            "agg plain groupBy-sum",
            timed(lambda: materialize(probe.groupBy("k").agg(F.sum("v").alias("s")))),
        )
    )
    for ns in salt_choices:
        results.append(
            (
                f"agg salted_agg n_salts={ns}",
                timed(
                    lambda ns=ns: materialize(
                        salted_agg(
                            probe, ["k"], {"s": "sum(v)"}, n_salts=ns,
                            salt_source=["rid"],
                        )
                    )
                ),
            )
        )

    results.append(
        (
            "join plain shuffle join",
            timed(lambda: materialize(probe.join(build, "k"))),
        )
    )
    for ns in salt_choices:
        results.append(
            (
                f"join replicated_skew_join n_salts={ns}",
                timed(
                    lambda ns=ns: materialize(
                        replicated_skew_join(
                            probe, build, ["k"], n_salts=ns,
                            probe_salt_source=["rid"],
                        )
                    )
                ),
            )
        )

    print(f"\nn_rows={n_rows:,}, hot key = 50% of rows, build=32k rows")
    for label, sec in results:
        print(f"  {label:42s} {sec:7.3f} s")
    spark.stop()


if __name__ == "__main__":
    main()
