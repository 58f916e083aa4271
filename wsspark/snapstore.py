"""Versioned snapshot store over parquet — manifest-pinned atomic commits
with time travel, the lightweight table-format layer the repo's
stage-then-swap sinks generalize into.

Why an engine needs it at 100 TB: plain ``spark.read.parquet(dir)``
couples readers to a DIRECTORY LISTING — concurrent writers, partial
failures, and compaction all leak in-flight files into queries, and the
listing itself is O(files) metadata calls on object stores. Here every
commit publishes an immutable MANIFEST (the explicit file list + schema
+ parent version) and readers plan from the manifest alone:

- snapshot isolation: a query pinned to version N sees exactly N's
  files, forever — later commits, orphaned task outputs, and in-flight
  writes are invisible by construction (no listing happens);
- atomic publish: data files land under a per-commit directory first,
  the manifest is created with O_EXCL (optimistic concurrency — the
  SECOND committer of version N+1 fails cleanly and must re-read +
  retry), and the CURRENT pointer advances via ``os.replace`` (atomic
  on POSIX/HDFS; on S3-like stores swap this single pointer write for a
  conditional put — the manifests themselves are already immutable);
- O(1)-ish planning: the file list rides in one small JSON, not a
  recursive listing;
- time travel: any retained version remains readable (incremental
  reprocessing, audits, reproducible training snapshots);
- ``snap_vacuum`` deletes data files no retained manifest references —
  compaction/rewrite garbage collection with readers still safe on
  retained versions;
- incremental (CDC) reads: for an append-only lineage the delta between
  two versions is exactly the manifest file-list difference, so
  ``snap_read_changes`` yields the new rows without a watermark column
  and without scanning resident data (``snap_tail`` is the one-arg
  "everything since my last checkpoint" form);
- data skipping: ``snap_commit(stats_cols=[...])`` records per-FILE
  min/max for the named columns in the manifest (one aggregation over
  the just-written files — no footer reads at query time), and
  ``snap_read_between`` plans only the files whose [min, max] overlaps
  the predicate range, applying the exact residual filter after. With a
  range-clustered write (``repartitionByRange`` / ``layout.write_zordered``)
  this is the Delta/Iceberg skipping story in one JSON field;
- exactly-once streaming publish: ``snap_sink(root)`` is a foreachBatch
  target that stamps each commit with the micro-batch id (``tag``) and
  skips any batch id at-or-below the last published tag, closing the
  replay window between sink write and checkpoint commit — the commit
  IS the idempotence marker, no side log.

Append commits validate the schema against the parent manifest (exact
StructType match — evolution is an explicit overwrite, not an accident).
This is deliberately a SINGLE-TABLE, linear-history format: no
partition-level conflict resolution, no branch merges — the 20% of a
lakehouse table format an analytics engine needs for exactly-once batch
publishing, in ~150 lines a reviewer can actually audit.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SnapshotConflict(RuntimeError):
    """Another committer published this version first — re-read and retry."""


def _manifest_dir(root: str) -> str:
    return os.path.join(root, "_manifests")


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(_manifest_dir(root), f"v{version:012d}.json")


def _current_path(root: str) -> str:
    return os.path.join(_manifest_dir(root), "CURRENT")


def snap_current_version(root: str) -> int | None:
    """The published version, or None for an empty/uninitialized store."""
    try:
        with open(_current_path(root)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def _read_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as f:
        return json.load(f)


def _list_parquet(d: str) -> list[str]:
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


def _json_stat(v):
    """Manifest-serializable min/max: datetimes/dates become ISO strings
    (lexicographic order == temporal order, so range overlap tests stay
    plain string comparisons)."""
    return v.isoformat() if hasattr(v, "isoformat") else v


def _collect_file_stats(
    spark: SparkSession, commit_dir: str, stats_cols: list[str]
) -> dict:
    """Per-file min/max of ``stats_cols`` over the just-written commit
    directory: ONE distributed aggregation grouped on the hidden
    ``_metadata.file_path`` column — output is O(files x cols) rows, the
    only thing the driver ever holds."""
    from urllib.parse import unquote, urlparse

    df = spark.read.parquet(commit_dir)
    aggs = []
    for c in stats_cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    rows = (
        df.select(F.col("_metadata.file_path").alias("__path"), *stats_cols)
        .groupBy("__path")
        .agg(*aggs)
        .collect()
    )
    stats: dict = {}
    for r in rows:
        path = unquote(urlparse(r["__path"]).path)
        stats[path] = {
            c: [_json_stat(r[f"__min_{c}"]), _json_stat(r[f"__max_{c}"])]
            for c in stats_cols
        }
    return stats


def snap_commit(
    df: DataFrame,
    root: str,
    mode: str = "append",
    tag: int | str | None = None,
    stats_cols: list[str] | None = None,
) -> int:
    """Publish ``df`` as the next version; returns the version number.

    ``append`` extends the parent's file list (schema must match the
    parent exactly); ``overwrite`` replaces it. Data files are written
    once under an immutable per-commit directory — an append never
    rewrites resident data. ``tag`` rides in the manifest (e.g. a
    streaming batch id) so idempotent writers can detect an
    already-published attempt: the commit IS the marker, closing the
    crash window a separate apply-log would leave. ``stats_cols``
    records per-file min/max for those columns in the manifest (see
    ``snap_read_between``); appends keep the parent's stats for resident
    files untouched."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode}")
    os.makedirs(_manifest_dir(root), exist_ok=True)
    parent = snap_current_version(root)
    version = 0 if parent is None else parent + 1

    parent_files: list[str] = []
    parent_stats: dict = {}
    if mode == "append" and parent is not None:
        pm = _read_manifest(root, parent)
        if json.loads(pm["schema"]) != json.loads(df.schema.json()):
            raise ValueError(
                "append schema mismatch vs parent manifest; use "
                "mode='overwrite' for an explicit schema change"
            )
        parent_files = pm["files"]
        parent_stats = pm.get("file_stats", {})

    commit_dir = os.path.join(
        root, "data", f"commit-{version:012d}-{uuid.uuid4().hex[:8]}"
    )
    df.write.mode("error").parquet(commit_dir)
    new_files = _list_parquet(commit_dir)
    file_stats = dict(parent_stats)
    if stats_cols and new_files:
        file_stats.update(
            _collect_file_stats(df.sparkSession, commit_dir, list(stats_cols))
        )
    manifest = {
        "version": version,
        "parent": parent,
        "mode": mode,
        "tag": tag,
        "schema": df.schema.json(),
        "files": parent_files + new_files,
        "file_stats": file_stats,
    }
    try:
        # O_EXCL publish: exactly one committer wins version N
        with open(_manifest_path(root, version), "x") as f:
            json.dump(manifest, f)
    except FileExistsError:
        import shutil

        shutil.rmtree(commit_dir, ignore_errors=True)
        raise SnapshotConflict(
            f"version {version} already committed — reload and retry"
        ) from None
    tmp = _current_path(root) + f".{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, _current_path(root))
    return version


def snap_tag(root: str) -> int | str | None:
    """The CURRENT manifest's tag (None if untagged or empty store)."""
    v = snap_current_version(root)
    return None if v is None else _read_manifest(root, v).get("tag")


def snap_read(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a pinned version (default: CURRENT) from its manifest's
    explicit file list — no directory listing, so concurrent commits and
    orphaned files can never leak into the frame. Names/types come from
    the manifest schema; nullability is relaxed to True, as on every
    Spark file-source read."""
    if version is None:
        version = snap_current_version(root)
        if version is None:
            raise FileNotFoundError(f"no committed version in {root}")
    m = _read_manifest(root, version)
    schema = T.StructType.fromJson(json.loads(m["schema"]))
    if not m["files"]:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*m["files"])


def snap_read_changes(
    spark: SparkSession, root: str, since: int, until: int | None = None
) -> DataFrame:
    """Rows added after version ``since`` up to ``until`` (default
    CURRENT) — the CDC read: for an append-only lineage the delta is
    EXACTLY the manifest file-list difference, so incremental consumers
    scan only new files, no watermark column and no resident-data scan.

    Raises if any version in (since, until] is an ``overwrite`` — there
    the delta is not expressible as added files (rows may have been
    removed or rewritten) and the honest answer is "re-read the
    snapshot", not a silently wrong diff."""
    if until is None:
        until = snap_current_version(root)
        if until is None:
            raise FileNotFoundError(f"no committed version in {root}")
    if not 0 <= since <= until:
        raise ValueError(f"need 0 <= since <= until, got {since}..{until}")
    for v in range(since + 1, until + 1):
        if _read_manifest(root, v)["mode"] != "append":
            raise ValueError(
                f"version {v} is an overwrite — the {since}..{until} delta "
                "is not an append set; re-read the full snapshot instead"
            )
    m = _read_manifest(root, until)
    base = set(_read_manifest(root, since)["files"])
    new_files = [f for f in m["files"] if f not in base]
    schema = T.StructType.fromJson(json.loads(m["schema"]))
    if not new_files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*new_files)


def snap_tail(spark: SparkSession, root: str, since: int) -> tuple[DataFrame, int]:
    """Convenience CDC cursor: ``(changes since <since>, CURRENT)`` — the
    caller persists the returned version as its next checkpoint."""
    cur = snap_current_version(root)
    if cur is None:
        raise FileNotFoundError(f"no committed version in {root}")
    return snap_read_changes(spark, root, since, cur), cur


def snap_prune_files(
    root: str, col: str, lo, hi, version: int | None = None
) -> tuple[list[str], int]:
    """The planning half of data skipping: ``(files whose [min, max]
    overlaps [lo, hi], total files in the manifest)``. Files with no
    recorded stats for ``col`` (written without ``stats_cols``, or an
    all-NULL file) are KEPT — skipping must never change results.
    Driver-side dict lookups over the manifest only; no file is opened."""
    if version is None:
        version = snap_current_version(root)
        if version is None:
            raise FileNotFoundError(f"no committed version in {root}")
    m = _read_manifest(root, version)
    lo, hi = _json_stat(lo), _json_stat(hi)
    stats = m.get("file_stats", {})
    kept = []
    for f in m["files"]:
        mm = stats.get(f, {}).get(col)
        if mm is None or mm[0] is None or mm[1] is None:
            kept.append(f)  # unknown -> must read
        elif not (mm[0] > hi or mm[1] < lo):
            kept.append(f)
    return kept, len(m["files"])


def snap_read_between(
    spark: SparkSession, root: str, col: str, lo, hi, version: int | None = None
) -> DataFrame:
    """Range read with manifest-stats file skipping: plan ONLY the files
    whose recorded [min, max] for ``col`` overlaps [lo, hi], then apply
    the exact residual ``BETWEEN`` filter (skipping is a superset
    optimization, never the semantics). With a range-clustered write
    (``repartitionByRange`` or ``layout.write_zordered``) the kept set is
    ~selectivity x files; with random layout it degrades safely to a
    full read. At 100 TB this is the difference between a metadata
    lookup and a million footer reads."""
    if version is None:
        version = snap_current_version(root)
        if version is None:
            raise FileNotFoundError(f"no committed version in {root}")
    files, _total = snap_prune_files(root, col, lo, hi, version)
    schema = T.StructType.fromJson(json.loads(_read_manifest(root, version)["schema"]))
    if not files:
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema)
        .parquet(*files)
        .filter(F.col(col).between(F.lit(lo), F.lit(hi)))
    )


def snap_sink(root: str, stats_cols: list[str] | None = None):
    """Exactly-once foreachBatch publisher: commit each micro-batch as an
    append tagged with its batch id, skipping any batch at-or-below the
    last published tag. Structured Streaming replays a micro-batch when
    the job dies between the sink write and the checkpoint commit
    (at-least-once delivery); because the tag rides IN the atomic
    manifest publish, a replayed batch sees itself already committed and
    becomes a no-op — no separate apply-log with its own crash window.
    Contract: this sink is the store's only writer (tags must be
    monotone).

        q = (df.writeStream.foreachBatch(snap_sink(root))
               .option("checkpointLocation", ckpt).start())
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        last = snap_tag(root)
        if isinstance(last, int) and batch_id <= last:
            return
        snap_commit(
            batch_df, root, mode="append", tag=int(batch_id), stats_cols=stats_cols
        )

    return _apply


def snap_compact(
    spark: SparkSession,
    root: str,
    target_file_mb: int = 256,
    stats_cols: list[str] | None = None,
) -> int:
    """Small-file compaction as JUST ANOTHER COMMIT: read CURRENT,
    rewrite into ~``target_file_mb`` files, publish as an overwrite
    version. Because readers are manifest-pinned, in-flight queries and
    time-travel reads keep their exact snapshot while the compaction
    lands; the superseded small files stay on disk (still referenced by
    older manifests) until ``snap_vacuum`` retires them — the
    listing-coupled ``io.compact_parquet`` cannot offer either property.
    Pass ``stats_cols`` to (re)record skipping stats — compaction is the
    natural moment, and ``repartitionByRange`` on the stats column before
    calling makes the rewritten files skippable. Returns the new
    version."""
    version = snap_current_version(root)
    if version is None:
        raise FileNotFoundError(f"no committed version in {root}")
    m = _read_manifest(root, version)
    size_bytes = sum(os.path.getsize(f) for f in m["files"])
    n_files = max(1, -(-size_bytes // (target_file_mb * 1024 * 1024)))
    df = snap_read(spark, root, version)
    return snap_commit(
        df.repartition(int(n_files)), root, mode="overwrite", stats_cols=stats_cols
    )


def snap_versions(root: str) -> list[int]:
    try:
        return sorted(
            int(f[1:-5])
            for f in os.listdir(_manifest_dir(root))
            if f.startswith("v") and f.endswith(".json")
        )
    except FileNotFoundError:
        return []


def snap_vacuum(root: str, keep_last: int = 1) -> int:
    """Drop manifests older than the last ``keep_last`` versions and
    delete every data file (and empty commit dir) no retained manifest
    references. Returns the number of files deleted. Readers pinned to a
    RETAINED version are unaffected — that is the contract vacuum must
    keep, pinned in tests."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = snap_versions(root)
    retained = versions[-keep_last:]
    referenced: set[str] = set()
    for v in retained:
        referenced.update(_read_manifest(root, v)["files"])
    removed = 0
    data_root = os.path.join(root, "data")
    if os.path.isdir(data_root):
        for commit_dir in sorted(os.listdir(data_root)):
            d = os.path.join(data_root, commit_dir)
            for f in list(os.listdir(d)):
                p = os.path.join(d, f)
                if f.endswith(".parquet") and p not in referenced:
                    os.remove(p)
                    removed += 1
                elif not f.endswith(".parquet"):
                    os.remove(p)  # _SUCCESS etc. ride along
            if not os.listdir(d):
                os.rmdir(d)
    for v in versions[:-keep_last]:
        os.remove(_manifest_path(root, v))
    return removed
