"""Distributed bulk-commit metadata (``wsspark.snapdist``).

The rung that removes the last O(files) driver term from the snapstore
metadata plane: on a fresh-detail commit past
``WSSPARK_SNAP_DISTRIBUTED_COMMIT_MIN`` files, the per-file stats/bloom
aggregations stay a DataFrame, the exact ``_json_stat``/``_widen_float``
Python runs executor-side in an Arrow ``mapInArrow`` pass, and Spark
tasks write the sidecar parts. These tests pin:

- BIT-exact equivalence with the legacy driver pass per file (stats
  JSON text, bloom hex, rows/bytes) across every supported stats type —
  including >2^53 integers, decimals needing directional rounding,
  session-timezone timestamps, NTZ, dates, and booleans;
- exactness of the part chain (files list == concatenated part paths in
  order -> O(1) ``files_in_detail`` heads);
- multi-part chains (forced small parts) reconstruct and prune
  identically;
- zero-row part files (invisible to a _metadata-grouped aggregation)
  merge into SORTED position (driver-built gap parts or a part rewrite)
  with rows=0 — the published list stays globally sorted (r16);
- unsupported stats types fall back to the legacy path, never diverge;
- the full DML lifecycle (deferred append, COW update, DV delete,
  restore, vacuum) is unchanged atop a distributed-written chain;
- bulk WAP stages (r16): past the threshold, ``snap_stage`` writes its
  detail parts via Spark tasks under the staged dir (O(1) staged JSON),
  ``snap_publish_staged`` adopts them by hard-link (lost races keep the
  originals — retryable), aborts/vacuum/relocation keep their contracts.
"""

from __future__ import annotations

import json
import os
import re

import pytest
from pyspark.sql import functions as F

from wsspark import snapstore as ss
from wsspark import snapdist as sd

STATS = ["id", "big", "x", "s", "ts", "d", "b", "dec"]
BLOOMS = ["s", "id"]


@pytest.fixture()
def dist_mode(monkeypatch):
    monkeypatch.setenv("WSSPARK_SNAP_DETAIL_INLINE_MAX", "0")
    monkeypatch.setenv("WSSPARK_SNAP_FILES_INLINE_MAX", "0")
    monkeypatch.setenv("WSSPARK_SNAP_DISTRIBUTED_COMMIT_MIN", "0")


def _typed_df(spark, n=800, parts=6):
    return (
        spark.range(0, n)
        .select(
            F.col("id"),
            (F.col("id") * 2 + 9_007_199_254_740_993).alias("big"),
            (F.col("id").cast("double") / 3).alias("x"),
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string")).alias(
                "s"
            ),
            F.timestamp_seconds(F.col("id") * 37 + 1_700_000_000).alias(
                "ts"
            ),
            F.to_date(
                F.timestamp_seconds(F.col("id") * 1337 + 1_600_000_000)
            ).alias("d"),
            (F.col("id") % 7 == 0).alias("b"),
            (F.col("id").cast("decimal(38,4)") / 7).alias("dec"),
        )
        .repartition(parts)
    )


def _commit_both(spark, tmp_path, monkeypatch, df, **kw):
    """The same df committed through the legacy driver pass and the
    distributed rung; returns the two roots."""
    legacy, dist = str(tmp_path / "legacy"), str(tmp_path / "dist")
    monkeypatch.setenv("WSSPARK_SNAP_DISTRIBUTED_COMMIT_MIN", "999999999")
    ss.snap_commit(df, legacy, mode="overwrite", **kw)
    monkeypatch.setenv("WSSPARK_SNAP_DISTRIBUTED_COMMIT_MIN", "0")
    ss.snap_commit(df, dist, mode="overwrite", **kw)
    return legacy, dist


def _by_part_index(d: dict) -> dict:
    """Detail dict re-keyed by the stable part index in Spark file names
    (part-00003-<uuid>...) so two writes of the same deterministic df
    compare file-to-file despite differing uuids/roots."""
    out = {}
    for p, v in d.items():
        m = re.match(r"part-(\d+)-", os.path.basename(p))
        assert m, p
        out[int(m.group(1))] = v
    return out


def _load(root):
    m = ss._read_manifest(root, ss.snap_current_version(root))
    return (
        m["files"],
        m["file_stats"],
        m["file_blooms"],
        m["file_meta"],
    )


def test_distributed_matches_legacy_bitexact(
    spark, tmp_path, monkeypatch, dist_mode
):
    df = _typed_df(spark)
    legacy, dist = _commit_both(
        spark,
        tmp_path,
        monkeypatch,
        df,
        stats_cols=STATS,
        bloom_cols=BLOOMS,
        bloom_bits=1 << 12,
        bloom_k=4,
    )
    fl, sl, bl, ml = _load(legacy)
    fd, sdic, bd, md = _load(dist)
    assert len(fl) == len(fd)
    sl_i, sd_i = _by_part_index(sl), _by_part_index(sdic)
    assert sl_i.keys() == sd_i.keys()
    for i in sl_i:
        # the stats dict round-trips through its JSON text — compare the
        # canonical dumps, which is exactly what the sidecar stores
        assert json.dumps(sl_i[i], sort_keys=True) == json.dumps(
            sd_i[i], sort_keys=True
        ), f"stats diverge for part {i}"
    assert _by_part_index(bl) == _by_part_index(bd)
    assert _by_part_index(ml) == _by_part_index(md)
    # O(1) head with the file list dropped, chain marked exact
    head = json.load(open(ss._manifest_path(dist, 0)))
    assert head.get("files_in_detail") and head.get("detail_exact")
    assert head.get("file_count") == len(fl)
    # exactness: reconstructed list == concatenated part paths in order
    mdir = ss._manifest_dir(dist)
    chain = ss._load_part_path_lists(
        [os.path.join(mdir, n) for n in head["detail_files"]]
    )
    assert chain == fd
    # reads and value content agree
    a = ss.snap_read(spark, legacy).orderBy("id").collect()
    b = ss.snap_read(spark, dist).orderBy("id").collect()
    assert a == b


def test_distributed_prune_parity(spark, tmp_path, monkeypatch, dist_mode):
    df = _typed_df(spark)
    legacy, dist = _commit_both(
        spark,
        tmp_path,
        monkeypatch,
        df,
        stats_cols=STATS,
        bloom_cols=BLOOMS,
        bloom_bits=1 << 12,
        bloom_k=4,
    )

    def kept_ids(root, *args, eq=None):
        if eq is not None:
            files, _ = ss.snap_prune_files_eq(root, *eq)
        else:
            files, _ = ss.snap_prune_files(root, *args)
        return sorted(
            int(re.match(r"part-(\d+)-", os.path.basename(f)).group(1))
            for f in files
        )

    for probe in [
        ("id", 10, 50),
        ("big", 9_007_199_254_740_993, 9_007_199_254_741_100),
        ("x", 1.0, 2.0),
        ("ts", "2023-11-15T00:00:00", "2023-11-15T06:00:00"),
        ("dec", 1, 2),
    ]:
        assert kept_ids(legacy, *probe) == kept_ids(dist, *probe), probe
    for eq in [("s", "k13"), ("id", 123)]:
        assert kept_ids(legacy, eq=eq) == kept_ids(dist, eq=eq), eq


def test_session_timezone_stats_match(
    spark, tmp_path, monkeypatch, dist_mode
):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = _typed_df(spark, n=300, parts=3)
        legacy, dist = _commit_both(
            spark, tmp_path, monkeypatch, df, stats_cols=["ts", "id"]
        )
        _, sl, _, _ = _load(legacy)
        _, sdic, _, _ = _load(dist)
        sl_i, sd_i = _by_part_index(sl), _by_part_index(sdic)
        assert sl_i == sd_i
        # the stored domain really is the session timezone (ISO strings
        # shifted -5/-4h from the UTC epoch seconds the df was built on)
        any_stat = next(iter(sd_i.values()))["ts"]
        assert any_stat[0] < "2023-11-15"  # NY is behind UTC
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_multi_part_chain_exact(spark, tmp_path, monkeypatch, dist_mode):
    monkeypatch.setenv("WSSPARK_SNAP_DETAIL_PART_MIN_ROWS", "2")
    monkeypatch.setenv("WSSPARK_SNAP_DETAIL_PART_BYTES", "1")
    root = str(tmp_path / "t")
    df = _typed_df(spark, n=500, parts=10)
    v = ss.snap_commit(
        df, root, mode="overwrite", stats_cols=["id"], bloom_cols=["s"]
    )
    head = json.load(open(ss._manifest_path(root, v)))
    assert len(head["detail_files"]) > 1, "forced multi-part chain"
    assert head.get("files_in_detail") and head.get("detail_exact")
    files, stats, blooms, meta = _load(root)
    mdir = ss._manifest_dir(root)
    chain = ss._load_part_path_lists(
        [os.path.join(mdir, n) for n in head["detail_files"]]
    )
    assert chain == files == sorted(files)
    assert set(stats) == set(files) and set(meta) == set(files)
    assert ss.snap_read(spark, root).count() == 500
    assert sum(m["rows"] for m in meta.values()) == 500
    # pruning over the multi-part chain keeps a strict subset
    kept, total = ss.snap_prune_files(root, "id", 0, 10)
    assert 0 < len(kept) < total


def test_zero_row_part_files_merge_sorted(
    spark, tmp_path, monkeypatch, dist_mode
):
    """Zero-row files never reach the _metadata-grouped aggregation;
    they must still land in SORTED position in the published file list
    (r16 — previously they rode an out-of-order tail part, silently
    breaking the globally-sorted manifest property every driver path
    inherits from _list_parquet). Three placements covered: before the
    first part (gap part), inside a task-written part's range (part
    rewrite), and after the last (tail gap part)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "data"))
    commit_dir = os.path.join(root, "data", "commit-fab")
    os.makedirs(commit_dir)
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 5).cast("string").alias("s")
    )
    df.coalesce(2).write.mode("append").parquet(commit_dir)
    # zero-row files Spark's scan will never group on: one sorting
    # before every data file, one between part-00000-* and part-00001-*
    # (inside the single task part's range), one after every data file
    empty = pa.table(
        {"id": pa.array([], pa.int64()), "s": pa.array([], pa.string())}
    )
    for name in (
        "a-empty.parquet",
        "part-00000zz-empty.parquet",
        "z-empty.parquet",
    ):
        pq.write_table(empty, os.path.join(commit_dir, name))
    new_files = ss._list_parquet(commit_dir)
    os.makedirs(ss._manifest_dir(root), exist_ok=True)
    res = sd.build_detail_parts_distributed(
        spark, commit_dir, new_files, ["id"], [], 1 << 12, 4,
        ss._manifest_dir(root), 0,
    )
    assert res is not None
    part_names, files_ordered = res
    assert files_ordered == sorted(new_files), (
        "empties merge into sorted position"
    )
    mdir = ss._manifest_dir(root)
    chain = ss._load_part_path_lists(
        [os.path.join(mdir, n) for n in part_names]
    )
    assert chain == files_ordered
    stats, _, meta = {}, {}, {}
    for n in part_names:
        s, _, fm = ss._detail_to_dicts(
            ss._load_detail_table(os.path.join(mdir, n))
        )
        stats.update(s)
        meta.update(fm)
    for f in files_ordered:
        if f.endswith("-empty.parquet"):
            assert meta[f]["rows"] == 0
    assert sum(m["rows"] for m in meta.values()) == 100
    # the rewritten part kept every data file's stats row
    assert set(meta) == set(new_files)


def test_unsupported_shapes_decline_to_legacy(
    spark, tmp_path, monkeypatch, dist_mode
):
    # 1) an exotic stats type (array) makes the rung DECLINE, not guess
    # — the legacy (inline) path defines behavior for such columns
    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "data"))
    commit_dir = os.path.join(root, "data", "commit-fab")
    df = spark.range(0, 50).select(
        F.col("id"), F.array(F.col("id"), F.col("id") + 1).alias("arr")
    ).repartition(2)
    df.write.parquet(commit_dir)
    os.makedirs(ss._manifest_dir(root), exist_ok=True)
    assert (
        sd.build_detail_parts_distributed(
            spark, commit_dir, ss._list_parquet(commit_dir),
            ["arr", "id"], [], 1 << 12, 4, ss._manifest_dir(root), 0,
        )
        is None
    )
    # 2) a session timezone Spark accepts but zoneinfo cannot parse:
    # the legacy pass would keep the SYSTEM domain, so the rung declines
    # rather than silently publish the session domain — and the full
    # commit still succeeds through the legacy path
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "GMT+08:00")
    try:
        assert ss._session_ts_normalizer(spark) is None
        root2 = str(tmp_path / "t2")
        dfts = _typed_df(spark, n=100, parts=2)
        v = ss.snap_commit(
            dfts, root2, mode="overwrite", stats_cols=["ts", "id"]
        )
        assert v == 0
        _, stats, _, _ = _load(root2)
        assert all("ts" in per and "id" in per for per in stats.values())
        assert ss.snap_read(spark, root2).count() == 100
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_dml_lifecycle_atop_distributed_chain(
    spark, tmp_path, monkeypatch, dist_mode
):
    root = str(tmp_path / "t")
    df = _typed_df(spark, n=400, parts=4)
    ss.snap_commit(
        df, root, mode="overwrite", stats_cols=["id"], bloom_cols=["s"]
    )
    # deferred append atop the Spark-written exact O(1)-head chain
    extra = _typed_df(spark, n=100, parts=2).withColumn(
        "id", F.col("id") + 10_000
    )
    v1 = ss.snap_commit(extra, root, stats_cols=["id"], bloom_cols=["s"])
    assert ss.snap_count(root) == 500
    head = json.load(open(ss._manifest_path(root, v1)))
    assert head.get("files_in_detail"), "append kept the O(1) head"
    # DV delete + read
    ss.snap_delete_dv(spark, root, "id < 10")
    assert ss.snap_count(root) == 490
    # restore to the distributed-written initial version
    ss.snap_restore(root, 0)
    assert ss.snap_count(root) == 400
    # vacuum keeps every referenced data file readable
    ss.snap_vacuum(root, keep_last=99, staged_grace_minutes=0)
    assert ss.snap_read(spark, root).count() == 400


def test_exec_stat_matches_json_stat_on_plain_values():
    import datetime
    import decimal

    vals = [
        None,
        7,
        2**60 + 1,
        -(2**60) - 1,
        3.25,
        decimal.Decimal("123456789012345678.1234"),
        decimal.Decimal("-1") / decimal.Decimal("3"),
        "text",
        datetime.date(2024, 5, 6),
        datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
        True,
    ]
    for v in vals:
        for d in (-1, 1):
            assert sd._exec_stat(v, d) == ss._json_stat(v, direction=d)
    # the one divergence _exec_stat exists for: tz-aware values drop to
    # the session wall clock BEFORE formatting
    import datetime as dt

    aware = dt.datetime(2024, 1, 2, 3, 4, 5, tzinfo=dt.timezone.utc)
    assert sd._exec_stat(aware, -1) == "2024-01-02T03:04:05"


def test_maintenance_overwrite_through_distributed_path(
    spark, tmp_path, monkeypatch, dist_mode
):
    """snap_compact / snap_optimize are fresh-detail overwrites, so they
    ride the distributed rung past the threshold — table CHECK
    constraints, the CDF flag, and content must all survive the
    Spark-task-written metadata pass exactly as they survive the legacy
    one (maintenance commits are content-preserving)."""
    root = str(tmp_path / "t")
    df = _typed_df(spark, n=300, parts=3)
    ss.snap_commit(df, root, mode="overwrite", stats_cols=["id"])
    ss.snap_add_constraint(spark, root, "id_nonneg", "id >= 0")
    ss.snap_enable_cdf(root)
    v = ss.snap_compact(spark, root, target_file_mb=1, stats_cols=["id"])
    m = ss._read_manifest(root, v)
    assert "id_nonneg" in m.get("constraints", {}), "constraint survived"
    assert m.get("cdf") is True, "CDF flag survived"
    assert m.get("content_preserving") is True
    assert ss.snap_read(spark, root).count() == 300
    # the constraint still gates data through the distributed plane
    bad = spark.createDataFrame([(-1,)], "id long")
    cols = [f.name for f in ss.snap_read(spark, root).schema.fields]
    bad_full = _typed_df(spark, n=1, parts=1).withColumn(
        "id", (F.col("id") - 5).cast("long")
    ).select(*cols)
    with pytest.raises(ss.ConstraintViolation):
        ss.snap_commit(bad_full, root, stats_cols=["id"])
    # prune still drives off the task-written sidecar of the compaction
    kept, total = ss.snap_prune_files(root, "id", 0, 5)
    assert 0 < len(kept) <= total


# ---------------------------------------------------------------------------
# Bulk WAP stages through the distributed rung (r16)


def _staged_json(root, sid):
    with open(ss._staged_path(root, sid)) as f:
        return json.load(f)


def test_bulk_stage_distributed_lifecycle(spark, tmp_path, dist_mode):
    """Stage past the threshold: the staged JSON stays O(1) (part names
    + file count, no path list, no stats/bloom dicts), the audit reads
    the staged frame, and publish adopts the Spark-written parts into an
    O(1) files_in_detail head whose pruning matches a direct commit."""
    root = str(tmp_path / "t")
    df = _typed_df(spark, 800, 6)
    sid = ss.snap_stage(df, root, stats_cols=STATS, bloom_cols=BLOOMS,
                        bloom_bits=1 << 12)
    st = _staged_json(root, sid)
    assert st["detail_parts"] and st["file_count"] == 6
    assert "files" not in st and "file_stats" not in st, (
        "bulk staged JSON must stay O(1)"
    )
    assert ss.snap_read_staged(spark, root, sid).count() == 800
    v = ss.snap_publish_staged(root, sid)
    assert v == 0
    assert ss.snap_count(root) == 800
    assert ss.snap_read(spark, root).count() == 800
    head = json.load(open(ss._manifest_path(root, v)))
    assert head.get("files_in_detail") and head["file_count"] == 6
    # pruning parity with a DIRECT distributed commit of the same data
    root2 = str(tmp_path / "direct")
    ss.snap_commit(df, root2, stats_cols=STATS, bloom_cols=BLOOMS,
                   bloom_bits=1 << 12)
    kept_a, total_a = ss.snap_prune_files(root, "id", 0, 100)
    kept_b, total_b = ss.snap_prune_files(root2, "id", 0, 100)
    assert total_a == total_b == 6
    assert len(kept_a) == len(kept_b)
    kq_a, _ = ss.snap_prune_files_eq(root, "s", "k13")
    kq_b, _ = ss.snap_prune_files_eq(root2, "s", "k13")
    assert len(kq_a) == len(kq_b)
    # the staged originals were dropped after adoption
    st_dir = os.path.join(st["commit_dir"], "_detail")
    assert not os.path.exists(st_dir)
    # staged marker gone
    assert not os.path.exists(ss._staged_path(root, sid))


def test_bulk_stage_publish_lost_race_is_retryable(spark, tmp_path, dist_mode):
    """A lost publish race removes only the hard-linked parts — the
    staged originals survive and a second publish succeeds."""
    root = str(tmp_path / "t")
    ss.snap_commit(_typed_df(spark, 60, 1), root, stats_cols=["id"])
    sid = ss.snap_stage(_typed_df(spark, 300, 3), root, stats_cols=["id"])
    st = _staged_json(root, sid)
    assert st.get("detail_parts")
    # a concurrent commit advances CURRENT past the expected parent
    ss.snap_commit(_typed_df(spark, 30, 1), root, stats_cols=["id"])
    with pytest.raises(ss.SnapshotConflict):
        ss.snap_publish_staged(root, sid, expected_parent=0)
    # originals intact, marker intact -> retry publishes
    sdir = os.path.join(st["commit_dir"], "_detail")
    assert sorted(os.listdir(sdir)) == sorted(st["detail_parts"])
    v = ss.snap_publish_staged(root, sid)
    assert v == 2
    assert ss.snap_count(root) == 390


def test_bulk_stage_abort_removes_parts(spark, tmp_path, dist_mode):
    root = str(tmp_path / "t")
    sid = ss.snap_stage(_typed_df(spark, 200, 2), root, stats_cols=["id"])
    st = _staged_json(root, sid)
    assert st.get("detail_parts")
    ss.snap_abort_staged(root, sid)
    assert not os.path.exists(st["commit_dir"])
    assert not os.path.exists(ss._staged_path(root, sid))
    assert ss.snap_current_version(root) is None


def test_bulk_stage_survives_relocation(spark, tmp_path, dist_mode):
    """stage -> move -> audit -> publish under the new root: the part
    path rows rebase via the staged JSON's recorded root, the adopted
    parts self-rebase at read via their schema stamp."""
    import shutil

    src = str(tmp_path / "src")
    sid = ss.snap_stage(
        _typed_df(spark, 400, 4).repartitionByRange(4, "id"), src,
        stats_cols=STATS, bloom_cols=["s"], bloom_bits=1 << 12,
    )
    dst = str(tmp_path / "dst")
    shutil.move(src, dst)
    assert ss.snap_read_staged(spark, dst, sid).count() == 400
    v = ss.snap_publish_staged(dst, sid)
    assert ss.snap_count(dst) == 400
    m = ss._read_manifest(dst, v)
    assert all(f.startswith(dst + os.sep) for f in m["files"])
    assert ss.snap_read(spark, dst).count() == 400
    kept, total = ss.snap_prune_files(dst, "id", 0, 50)
    assert 0 < len(kept) < total


def test_bulk_stage_append_onto_live_parent(spark, tmp_path, dist_mode):
    """A staged bulk APPEND onto a non-empty parent reconstructs the
    exact dicts from the parts (fresh-detail adoption needs an empty
    parent) — published reads, counts, and stats stay correct."""
    root = str(tmp_path / "t")
    ss.snap_commit(_typed_df(spark, 100, 2), root, stats_cols=["id"])
    sid = ss.snap_stage(
        _typed_df(spark, 1400, 3).where("id >= 1000"),
        root,
        stats_cols=["id"],
    )
    st = _staged_json(root, sid)
    assert st.get("detail_parts")
    parent_head = json.load(open(ss._manifest_path(root, 0)))
    parent_parts = ss._pointer_names(parent_head)
    v = ss.snap_publish_staged(root, sid)
    assert ss.snap_count(root) == 500
    assert ss.snap_read(spark, root).count() == 500
    m = ss._read_manifest(root, v)
    assert set(m["file_stats"]) >= set(
        f for f in m["files"] if "commit-s-" in f
    ), "staged files' stats survive the publish"
    # r16: the chain is parent parts + ADOPTED staged parts by name —
    # no dict rebuild, no driver-written part, however large the stage
    head = json.load(open(ss._manifest_path(root, v)))
    chain = ss._pointer_names(head)
    assert chain[: len(parent_parts)] == parent_parts
    assert len(chain) == len(parent_parts) + len(st["detail_parts"])


def test_bulk_stage_vacuumed_publish_raises(spark, tmp_path, dist_mode):
    """Grace-expired staged parts collected by vacuum make publish raise
    the retryable StagedCommitVacuumed, never a silent partial commit."""
    root = str(tmp_path / "t")
    ss.snap_commit(_typed_df(spark, 50, 1), root, stats_cols=["id"])
    sid = ss.snap_stage(_typed_df(spark, 200, 2), root, stats_cols=["id"])
    st = _staged_json(root, sid)
    assert st.get("detail_parts")
    ss.snap_vacuum(root, keep_last=1, staged_grace_minutes=0)
    assert not os.path.exists(
        os.path.join(st["commit_dir"], "_detail", st["detail_parts"][0])
    )
    with pytest.raises((ss.StagedCommitVacuumed, FileNotFoundError)):
        ss.snap_publish_staged(root, sid)


def test_bulk_stage_vacuum_grace_protects_parts(spark, tmp_path, dist_mode):
    """Inside the grace window the staged dir (data AND parts) is kept
    whole — the retained-parts contract extends to live staged parts."""
    root = str(tmp_path / "t")
    ss.snap_commit(_typed_df(spark, 50, 1), root, stats_cols=["id"])
    sid = ss.snap_stage(_typed_df(spark, 200, 2), root, stats_cols=["id"])
    st = _staged_json(root, sid)
    ss.snap_vacuum(root, keep_last=1, staged_grace_minutes=60)
    sdir = os.path.join(st["commit_dir"], "_detail")
    assert sorted(os.listdir(sdir)) == sorted(st["detail_parts"])
    v = ss.snap_publish_staged(root, sid)
    assert ss.snap_count(root) == 250
