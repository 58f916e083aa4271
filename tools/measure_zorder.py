"""Measure row-group pruning for three lineitem layouts (natural /
single-column sort / z-order) — the evidence behind wsspark/layout.py.

For each layout we write the same rows, then read every parquet footer
with pyarrow and compute, for a predicate on each dimension, the fraction
of row groups whose [min, max] statistics already exclude it — exactly
the statistics parquet readers (Spark included, via filter pushdown) use
to skip row groups without touching data pages.

Run:  python tools/measure_zorder.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from wsspark.io import read_table
from wsspark.layout import write_zordered
from wsspark.session import get_session


def rowgroup_stats(path: str, col: str):
    out = []
    for root, _, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            pf = pq.ParquetFile(os.path.join(root, f))
            idx = pf.schema_arrow.get_field_index(col)
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(idx).statistics
                mn, mx = st.min, st.max
                if hasattr(mn, "tzinfo") and mn.tzinfo is not None:
                    mn, mx = mn.replace(tzinfo=None), mx.replace(tzinfo=None)
                out.append((mn, mx, pf.metadata.row_group(rg).num_rows))
    return out


def prunable(path: str, col: str, lo, hi) -> tuple[int, int]:
    """Row groups skippable for predicate col BETWEEN lo AND hi."""
    stats = rowgroup_stats(path, col)
    skip = sum(1 for mn, mx, _ in stats if mx < lo or mn > hi)
    return skip, len(stats)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/zorder_bench"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_session(app_name="measure-zorder", master="local[8]",
                        shuffle_partitions=32)
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"
    )
    pk_max = li.agg(F.max("l_partkey")).first()[0]
    d_lo, d_hi = li.agg(
        F.unix_date(F.min("l_shipdate").cast("date")),
        F.unix_date(F.max("l_shipdate").cast("date")),
    ).first()

    n_files = 32
    layouts = {
        "natural": lambda df, p: df.repartition(n_files)
        .write.mode("overwrite").parquet(p),
        "sort_partkey": lambda df, p: df.repartitionByRange(
            n_files, "l_partkey"
        ).sortWithinPartitions("l_partkey").write.mode("overwrite").parquet(p),
        "zorder": lambda df, p: write_zordered(
            df, p, "l_partkey", "l_shipdate",
            (0.0, float(pk_max)), (float(d_lo), float(d_hi)),
            n_files=n_files,
        ),
    }

    # predicates: a 1% partkey band; a 60-day shipdate window
    pk_band = (int(pk_max * 0.40), int(pk_max * 0.41))
    import datetime

    mid = datetime.datetime(1997, 6, 1)
    date_band = (mid, mid + datetime.timedelta(days=60))

    print(f"{'layout':<14}{'partkey-band prune':>22}{'date-window prune':>22}")
    for name, writer in layouts.items():
        p = os.path.join(work, name)
        writer(li, p)
        s1 = prunable(p, "l_partkey", *pk_band)
        s2 = prunable(p, "l_shipdate", *date_band)
        print(
            f"{name:<14}"
            f"{s1[0]:>8}/{s1[1]:<3} ({s1[0]/s1[1]:>6.1%})"
            f"{s2[0]:>8}/{s2[1]:<3} ({s2[0]/s2[1]:>6.1%})"
        )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
