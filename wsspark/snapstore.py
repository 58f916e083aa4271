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
  retained versions.

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


def snap_commit(
    df: DataFrame, root: str, mode: str = "append", tag: int | str | None = None
) -> int:
    """Publish ``df`` as the next version; returns the version number.

    ``append`` extends the parent's file list (schema must match the
    parent exactly); ``overwrite`` replaces it. Data files are written
    once under an immutable per-commit directory — an append never
    rewrites resident data. ``tag`` rides in the manifest (e.g. a
    streaming batch id) so idempotent writers can detect an
    already-published attempt: the commit IS the marker, closing the
    crash window a separate apply-log would leave."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode}")
    os.makedirs(_manifest_dir(root), exist_ok=True)
    parent = snap_current_version(root)
    version = 0 if parent is None else parent + 1

    parent_files: list[str] = []
    if mode == "append" and parent is not None:
        pm = _read_manifest(root, parent)
        if json.loads(pm["schema"]) != json.loads(df.schema.json()):
            raise ValueError(
                "append schema mismatch vs parent manifest; use "
                "mode='overwrite' for an explicit schema change"
            )
        parent_files = pm["files"]

    commit_dir = os.path.join(
        root, "data", f"commit-{version:012d}-{uuid.uuid4().hex[:8]}"
    )
    df.write.mode("error").parquet(commit_dir)
    manifest = {
        "version": version,
        "parent": parent,
        "mode": mode,
        "tag": tag,
        "schema": df.schema.json(),
        "files": parent_files + _list_parquet(commit_dir),
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


def snap_compact(
    spark: SparkSession, root: str, target_file_mb: int = 256
) -> int:
    """Small-file compaction as JUST ANOTHER COMMIT: read CURRENT,
    rewrite into ~``target_file_mb`` files, publish as an overwrite
    version. Because readers are manifest-pinned, in-flight queries and
    time-travel reads keep their exact snapshot while the compaction
    lands; the superseded small files stay on disk (still referenced by
    older manifests) until ``snap_vacuum`` retires them — the
    listing-coupled ``io.compact_parquet`` cannot offer either property.
    Returns the new version."""
    version = snap_current_version(root)
    if version is None:
        raise FileNotFoundError(f"no committed version in {root}")
    m = _read_manifest(root, version)
    size_bytes = sum(os.path.getsize(f) for f in m["files"])
    n_files = max(1, -(-size_bytes // (target_file_mb * 1024 * 1024)))
    df = snap_read(spark, root, version)
    return snap_commit(df.repartition(int(n_files)), root, mode="overwrite")


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
