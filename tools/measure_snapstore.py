"""Measure snapstore manifest-stats file skipping — the evidence behind
``snapstore.snap_read_between``.

Two stores over the same sf lineitem rows:
  A) range-clustered on l_shipdate (repartitionByRange) + stats_cols
  B) naturally laid out (hash repartition, same file count) + stats_cols

For a 1-month shipdate predicate we report files planned vs total
(driver-side manifest pruning — zero footer reads) and the wall time of
the pruned read vs the full-scan-filter read, medians of 5. Result
equality is asserted, not assumed.

A third store measures the EQUALITY path (`snap_read_where_eq`): hash-
clustered on l_partkey with a manifest bloom, needle lookups report
files planned vs total — the min/max-useless case (every file's partkey
range spans the domain) where only the bloom prunes.

Run:  python tools/measure_snapstore.py [sf_dir] [workdir]
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wsspark import snapstore as ss
from wsspark.io import read_table
from wsspark.session import get_session

N_FILES = 32
LO = dt.datetime(1996, 3, 1)
HI = dt.datetime(1996, 3, 31, 23, 59, 59)


def median_time(fn, n=5):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return statistics.median(times), min(times), max(times)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/measure_snapstore"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_session()

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate"
    )
    n_rows = li.count()

    clustered = os.path.join(work, "clustered")
    natural = os.path.join(work, "natural")
    ss.snap_commit(
        li.repartitionByRange(N_FILES, "l_shipdate"),
        clustered,
        stats_cols=["l_shipdate"],
    )
    ss.snap_commit(
        li.repartition(N_FILES), natural, stats_cols=["l_shipdate"]
    )

    kept_c, total_c = ss.snap_prune_files(clustered, "l_shipdate", LO, HI)
    kept_n, total_n = ss.snap_prune_files(natural, "l_shipdate", LO, HI)

    def pruned():
        ss.snap_read_between(spark, clustered, "l_shipdate", LO, HI).agg(
            F.sum("l_quantity")
        ).collect()

    def full():
        ss.snap_read(spark, clustered).filter(
            F.col("l_shipdate").between(F.lit(LO), F.lit(HI))
        ).agg(F.sum("l_quantity")).collect()

    # equality first
    a = ss.snap_read_between(spark, clustered, "l_shipdate", LO, HI).count()
    b = (
        ss.snap_read(spark, clustered)
        .filter(F.col("l_shipdate").between(F.lit(LO), F.lit(HI)))
        .count()
    )
    assert a == b, (a, b)

    pruned()  # warm
    full()
    mp = median_time(pruned)
    mf = median_time(full)

    print(f"rows={n_rows}  predicate=[{LO:%Y-%m-%d} .. {HI:%Y-%m-%d}]  match_rows={a}")
    print(
        f"clustered: planned {len(kept_c)}/{total_c} files "
        f"({100 * len(kept_c) / total_c:.0f}%)"
    )
    print(
        f"natural:   planned {len(kept_n)}/{total_n} files "
        f"({100 * len(kept_n) / total_n:.0f}%) — random layout degrades to full read"
    )
    print(
        f"pruned read  median {mp[0]:.3f}s  (min {mp[1]:.3f} max {mp[2]:.3f})"
    )
    print(
        f"full filter  median {mf[0]:.3f}s  (min {mf[1]:.3f} max {mf[2]:.3f})"
    )
    print(f"speedup {mf[0] / mp[0]:.2f}x")

    # equality path: hash layout (min/max prunes nothing), manifest bloom
    hashed = os.path.join(work, "hashed")
    ss.snap_commit(
        li.repartition(N_FILES, "l_partkey"),
        hashed,
        stats_cols=["l_partkey"],
        bloom_cols=["l_partkey"],
        bloom_bits=1 << 17,  # ~6k distinct keys/file at sf0.1 -> fp ~1%
    )
    needles = [r[0] for r in li.select("l_partkey").distinct().limit(5).collect()]
    planned = []
    for needle in needles:
        kept_b, total_b = ss.snap_prune_files_eq(hashed, "l_partkey", needle)
        n_pruned = ss.snap_read_where_eq(
            spark, hashed, "l_partkey", needle
        ).count()
        n_full = (
            ss.snap_read(spark, hashed)
            .filter(F.col("l_partkey") == needle)
            .count()
        )
        assert n_pruned == n_full, (needle, n_pruned, n_full)
        planned.append(len(kept_b))
    print(
        f"eq-lookup (hash layout, bloom): planned "
        f"{planned} of {total_b} files across {len(needles)} needles "
        f"(min/max alone would plan {total_b}/{total_b})"
    )

    # honest cost of the Python Data Source paths vs the native ones
    from wsspark.snapsource import register

    register(spark)

    def ds_read():
        spark.read.format("snapstore").load(clustered).agg(
            F.sum("l_quantity")
        ).collect()

    def native_read():
        ss.snap_read(spark, clustered).agg(F.sum("l_quantity")).collect()

    ds_read()
    native_read()
    mds = median_time(ds_read, 3)
    mnat = median_time(native_read, 3)
    print(
        f"full-scan agg: format('snapstore') {mds[0]:.3f}s vs native "
        f"snap_read {mnat[0]:.3f}s ({mds[0] / mnat[0]:.1f}x — the Python "
        f"read path trades the JVM scanner for API integration; use "
        f"snap_read for raw batch throughput)"
    )

    wtgt1 = os.path.join(work, "w-native")
    wtgt2 = os.path.join(work, "w-pyds")

    def native_write():
        shutil.rmtree(wtgt1, ignore_errors=True)
        ss.snap_commit(li.repartition(8), wtgt1, stats_cols=["l_shipdate"])

    def ds_write():
        shutil.rmtree(wtgt2, ignore_errors=True)
        li.repartition(8).write.format("snapstore").mode("append").option(
            "statsCols", "l_shipdate"
        ).save(wtgt2)

    native_write()
    ds_write()
    mw1 = median_time(native_write, 3)
    mw2 = median_time(ds_write, 3)
    print(
        f"stats-commit write (8 files): writer {mw2[0]:.3f}s vs "
        f"snap_commit+stats-job {mw1[0]:.3f}s ({mw2[0] / mw1[0]:.2f}x — "
        f"message-carried stats remove the second job)"
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
