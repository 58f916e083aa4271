"""Phase-separated wall clock for the change-data-feed path — the
numbers bench q32's end-to-end row cannot show.

q32_cdf_ivm times the WHOLE fixture (fact commit + DML + two
refreshes + driver materialization); its sf1 point is also capped by
the driver-row guard. This tool times the phases that carry the scale
claims, materializing with noop writes (nothing collected):

- ``feed_read``: the COALESCED ``snap_read_changes_cdf`` span scan
  (r13: plan legs bounded by schema epochs, not commits);
- ``ivm_refresh``: ``snapstore_mv_refresh_cdf`` consuming that span —
  the O(changed rows) claim; compare against
- ``full_recompute``: the same rollup recomputed from the whole fact —
  what a non-incremental engine pays per refresh.

Usage: python tools/measure_cdf.py [sf_dir ...]
       (default /root/testdata/sf0.1; add .testdata_sf1 for the slope)

Prints one JSON line per sf_dir.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wsspark import adapters as ad  # noqa: E402
from wsspark import snapstore as ss  # noqa: E402
from wsspark.io import read_table  # noqa: E402
from wsspark.ops import incremental as ivm  # noqa: E402
from wsspark.session import get_session  # noqa: E402


def _materialize(df) -> None:
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        df.count()


MIXES = {
    # the shape IVM exists for: a point-ish DML touching ~1% of rows —
    # the feed is tiny and the refresh should beat the full recompute
    "narrow": (
        "quantity > 30 AND reference_id % 101 = 0",
        "reference_id % 997 = 3",
    ),
    # adversarial wide delta (~80% of rows): O(changed rows) means the
    # refresh degrades toward (and past) the recompute — recorded so
    # the crossover is on the record, not hidden
    "wide": ("quantity > 30", "reference_id % 7 = 3"),
}


def run(spark, sf_dir: str, mix: str) -> dict:
    upd_cond, del_cond = MIXES[mix]
    fact_root = tempfile.mkdtemp(prefix="cdfmeas-f-")
    mv_root = tempfile.mkdtemp(prefix="cdfmeas-v-")
    try:
        mvs = ad.movements_from_lineitem(read_table(spark, sf_dir, "lineitem"))
        t0 = time.perf_counter()
        ss.snap_commit(mvs.repartition(16), fact_root)
        t_commit = time.perf_counter() - t0
        v_en = ss.snap_enable_cdf(fact_root)
        ivm.snapstore_mv_refresh_cdf(spark, fact_root, mv_root)  # initial MV
        t0 = time.perf_counter()
        ss.snap_update_where(
            spark, fact_root, upd_cond, {"quantity": "quantity - 30"}
        )
        ss.snap_delete_where(spark, fact_root, del_cond)
        t_dml = time.perf_counter() - t0
        # the coalesced span read, isolated
        t0 = time.perf_counter()
        _materialize(ss.snap_read_changes_cdf(spark, fact_root, since=v_en))
        t_feed = time.perf_counter() - t0
        n_changes = ss.snap_read_changes_cdf(
            spark, fact_root, since=v_en
        ).count()
        # incremental refresh through the feed
        t0 = time.perf_counter()
        ivm.snapstore_mv_refresh_cdf(spark, fact_root, mv_root)
        t_ivm = time.perf_counter() - t0
        # what a full recompute would pay for the same refresh — SAME
        # contract as the incremental side (aggregate + publish the MV
        # as a commit), only the input differs: the whole fact instead
        # of the change feed
        full_root = tempfile.mkdtemp(prefix="cdfmeas-r-")
        try:
            t0 = time.perf_counter()
            ss.snap_commit(
                ivm.movement_mv_cdf(ss.snap_read(spark, fact_root)),
                full_root,
                mode="overwrite",
            )
            t_full = time.perf_counter() - t0
        finally:
            shutil.rmtree(full_root, ignore_errors=True)
        return {
            "sf_dir": sf_dir,
            "mix": mix,
            "fact_rows": ss.snap_count(fact_root),
            "change_rows": n_changes,
            "fact_commit_s": round(t_commit, 3),
            "dml_s": round(t_dml, 3),
            "feed_read_s": round(t_feed, 3),
            "ivm_refresh_s": round(t_ivm, 3),
            "full_recompute_s": round(t_full, 3),
        }
    finally:
        shutil.rmtree(fact_root, ignore_errors=True)
        shutil.rmtree(mv_root, ignore_errors=True)


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_session(app_name="measure-cdf")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        for mix in MIXES:
            print(json.dumps(run(spark, d, mix)))


if __name__ == "__main__":
    main()
