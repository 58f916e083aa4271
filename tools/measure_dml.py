"""sf0.1 -> sf1 slopes for the snapstore DML ops — the wall-clock
decade behind the discovery pre-prune claims.

One key-range-clustered store per sf (movements fact keyed by
reference_id, repartitionByRange + stats on the key), then three
narrow DML shapes over ~1% of the key domain:

- ``snap_merge`` (upsert, key-range pre-prune from the source frame);
- ``snap_update_where`` (COW over the pruned candidate files);
- ``snap_overwrite_where`` (replaceWhere of the same region);
- ``snap_delete_where`` with an IN-list (the r13 point-DML shape).

Each row reports candidate files planned vs total (the pruning ratio)
and the op's wall time. The scale claim: on a clustered table the
planned-file count tracks REGION size, not table size, so the decade
shows ~flat planned counts while total files grow 10x.

Usage: python tools/measure_dml.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from wsspark import adapters as ad  # noqa: E402
from wsspark import snapstore as ss  # noqa: E402
from wsspark.io import read_table  # noqa: E402
from wsspark.session import get_session  # noqa: E402

N_FILES = 32


def _fresh_store(spark, sf_dir: str) -> tuple[str, int, int]:
    """(root, key_lo, key_hi) — movements fact clustered on reference_id.
    File COUNT scales with the data (constant ~19k rows/file, like a
    production table with a fixed target file size) so the decade can
    show planned-files tracking REGION size while total files grow."""
    root = tempfile.mkdtemp(prefix="dmlmeas-")
    mvs = ad.movements_from_lineitem(read_table(spark, sf_dir, "lineitem"))
    n_files = max(8, mvs.count() // 19000)
    ss.snap_commit(
        mvs.repartitionByRange(n_files, "reference_id"),
        root,
        stats_cols=["reference_id"],
    )
    bounds = mvs.agg(
        F.min("reference_id").alias("lo"), F.max("reference_id").alias("hi")
    ).collect()[0]
    return root, int(bounds["lo"]), int(bounds["hi"])


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def run(spark, sf_dir: str) -> dict:
    out: dict = {"sf_dir": sf_dir}
    # ~1% key region in the middle of the domain
    root, lo, hi = _fresh_store(spark, sf_dir)
    try:
        span = hi - lo
        a = lo + span // 2
        b = a + max(1, span // 100)
        m = ss._read_manifest(root, ss.snap_current_version(root))
        out["total_files"] = len(m["files"])
        cond = f"reference_id >= {a} AND reference_id <= {b}"
        out["update_planned"] = len(ss._dml_candidate_files(m, cond))
        out["update_s"] = _t(
            lambda: ss.snap_update_where(
                spark, root, cond, {"quantity": "quantity + 1"}
            )
        )
        # merge: source keys confined to the same region
        src = (
            ss.snap_read(spark, root)
            .filter(f"reference_id >= {a} AND reference_id <= {b}")
            .dropDuplicates(["reference_id"])
            .limit(2000)
            .localCheckpoint()
        )
        out["merge_src_keys"] = src.count()
        out["merge_s"] = _t(
            lambda: ss.snap_merge(spark, root, src, on=["reference_id"])
        )
        out["replace_where_s"] = _t(
            lambda: ss.snap_overwrite_where(
                spark,
                root,
                cond,
                ss.snap_read(spark, root).filter(cond).withColumn(
                    "quantity", F.col("quantity") + F.lit(0)
                ),
            )
        )
        # the r13 IN-list point-delete shape
        keys = [a + i for i in range(0, 50)]
        in_cond = f"reference_id IN ({', '.join(str(k) for k in keys)})"
        m2 = ss._read_manifest(root, ss.snap_current_version(root))
        out["in_delete_planned"] = len(ss._dml_candidate_files(m2, in_cond))
        out["in_delete_s"] = _t(
            lambda: ss.snap_delete_where(spark, root, in_cond)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_session(app_name="measure-dml")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        print(json.dumps(run(spark, d)))


if __name__ == "__main__":
    main()
