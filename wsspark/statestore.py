"""Atomic versioned parquet state for foreachBatch sinks — ONE shared
exactly-once guard for every streaming member that accumulates state.

Why: ``df.write.mode("overwrite").parquet(path)`` is not a swap — Spark
deletes the old directory before writing the new one, so a crash during
the second write of a "stage-then-swap" loses ALL accumulated state
(round-9 advice: kmv/regress/corpus/streaming all carried the pattern).
And keeping the replay guard in a SEPARATE marker file (the old
``_BatchLog``) leaves a crash window between the state swap and the
marker commit in which an at-least-once replay re-applies the batch to
already-updated state — a silent double-count for additive state (CMS
counters, MV deltas, movement snapshots).

``AtomicStateStore`` fixes both with the snapstore CURRENT discipline:

- every commit writes a NEW immutable version directory ``v{N}`` (an
  interrupted write can only leave garbage in a dir no pointer
  references; the retry overwrites the same dir);
- the ``CURRENT`` pointer — a one-line JSON ``{"version": N,
  "batch_id": B}`` — flips via ``os.replace`` (atomic on POSIX), so the
  state AND the last-applied batch id advance in the SAME instant:
  there is no interleaving in which a replay sees new state with an old
  batch id or vice versa;
- older versions are garbage-collected best-effort AFTER the flip
  (``keep`` latest retained), so a crash mid-cleanup costs disk, never
  correctness.

On a real cluster this role is played by a transactional table format
(the repo's snapstore ``snap_sink`` does exactly this with its manifest
``tag`` — the same contract, manifest-carried); this is the
dependency-free local equivalent for small driver-adjacent state.
Single-writer by design: foreachBatch invokes one batch at a time per
query. Concurrent writers need snapstore's O_EXCL manifests instead.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class AtomicStateStore:
    """Versioned parquet state + atomically co-committed batch cursor."""

    def __init__(self, root: str) -> None:
        self.root = root

    # -- pointer ----------------------------------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.root, "CURRENT")

    def _pointer(self) -> dict | None:
        try:
            with open(self._pointer_path()) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return None

    def last_batch(self) -> int:
        """The batch id committed WITH the current state (-1 if none):
        the foreachBatch replay guard — skip any batch_id <= this."""
        p = self._pointer()
        return -1 if p is None else int(p.get("batch_id", -1))

    def version(self) -> int | None:
        p = self._pointer()
        return None if p is None else int(p["version"])

    # -- read / commit -----------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame | None:
        """The current state frame, or None before the first commit."""
        v = self.version()
        if v is None:
            return None
        return spark.read.parquet(os.path.join(self.root, f"v{v:012d}"))

    def commit(self, df: DataFrame, batch_id: int = -1, keep: int = 2) -> int:
        """Publish ``df`` as the next state version, stamping ``batch_id``
        in the same atomic pointer flip. Returns the new version.

        The frame is fully materialized into the new version dir BEFORE
        the flip, so readers (and a crash at any instant) see either the
        complete old state or the complete new state — never a mixture,
        never an empty store."""
        cur = self.version()
        v = 0 if cur is None else cur + 1
        vdir = os.path.join(self.root, f"v{v:012d}")
        # overwrite: a previous crashed attempt may have left a partial dir
        df.write.mode("overwrite").parquet(vdir)
        os.makedirs(self.root, exist_ok=True)
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": v, "batch_id": int(batch_id)}, f)
        os.replace(tmp, self._pointer_path())
        # best-effort GC of superseded versions (crash here costs disk only)
        for name in os.listdir(self.root):
            if name.startswith("v") and name[1:].isdigit():
                if int(name[1:]) <= v - keep:
                    shutil.rmtree(
                        os.path.join(self.root, name), ignore_errors=True
                    )
        return v
