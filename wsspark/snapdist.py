"""Distributed bulk-commit metadata for the snapstore table format.

The legacy ``snap_commit`` metadata pass collects O(files x cols) stats
rows plus O(files x bloom_words) bitmap rows to the DRIVER and opens
every just-written footer there before serializing the detail sidecar —
~60 s of driver stall for a 1M-file initial commit, minutes at 10M.
This module is the distributed rung: the same per-file stats/bloom
aggregations stay a DataFrame, the exact ``_json_stat`` /
``_widen_float`` Python (the soundness-critical directional-widening /
ISO-format domain) runs executor-side in an Arrow ``mapInArrow`` pass —
bit-identical because it IS the same code — and each task writes its own
detail sidecar part with the same pyarrow writer the driver path uses
(so part schemas, struct field names, and the ``wsspark_stats_cols``
metadata key are byte-compatible with driver-written parts). The driver
touches only O(parts) summary rows plus one O(files) stat-syscall sweep
(the vacuum-race guard it already ran).

Precedent: Delta writes multi-part checkpoints from executors the same
way; Iceberg's manifest files are written by workers. Reference parity:
the reference engine has no table format at all — this extends
``etl/load`` semantics (full-table publishes) to cluster scale.

Exactness contract: the published file list is the concatenation of the
parts' path rows IN ORDER (what licenses ``files_in_detail`` O(1)
heads), and it is GLOBALLY SORTED — zero-row files, which never reach a
``_metadata``-grouped aggregation, are merged into sorted position
(driver-built gap parts at the right pointer index, or an
align-concat + sort rewrite of the one part whose range contains them;
r16). The tasks verify their partition is strictly ascending in the
PLAIN (unquoted) path domain and the driver verifies part ranges are
strictly ascending and row counts sum to the expected universe; any
mismatch (percent-encoded paths reordering under unquote, a typed-index
domain conflict, a lost sample) falls back to the exact legacy driver
path — never a silently different manifest.

The same rung backs bulk WAP stages (r16): ``snap_stage`` writes the
parts under the staged commit dir via ``part_root``/``name_prefix``
(grace-protected, abort-rmtree'd, O(1) staged JSON) and
``snap_publish_staged`` adopts them by hard-link under version names.
"""

from __future__ import annotations

import math
import os
import uuid
from urllib.parse import unquote, urlparse

from pyspark.sql import SparkSession, functions as F, types as T

# A parquet file smaller than this is footer-checked for zero rows
# driver-side: empty part files are invisible to a _metadata-grouped
# aggregation (no rows -> no group), so their detail rows ride in a
# driver-built tail part. Real bulk-commit files are MBs; typical
# commits footer-check nothing.
_EMPTY_CANDIDATE_BYTES = 65536

_NUM_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.BooleanType,
)
_STR_TYPES = (T.StringType, T.DateType, T.TimestampType, T.TimestampNTZType)


def _part_target_bytes() -> int:
    return int(
        os.environ.get("WSSPARK_SNAP_DETAIL_PART_BYTES", str(256 << 20))
    )


def _part_min_rows() -> int:
    """Floor on rows per Spark-written sidecar part (keeps tiny commits
    to one part); tests lower it to force multi-part chains on small
    tables."""
    return int(os.environ.get("WSSPARK_SNAP_DETAIL_PART_MIN_ROWS", "65536"))


def _plain_path(uri: str) -> str:
    """file:/x | file:///x | /x -> /x, percent-unquoted — the same
    normalization ``_collect_file_stats`` applies driver-side."""
    return unquote(urlparse(uri).path) if "://" in uri or uri.startswith("file:") else uri


def _exec_stat(v, direction: int):
    """Executor-side replica of ``_collect_file_stats``'s ``_stat``:
    Arrow hands TimestampType values tz-aware in the SESSION timezone
    (verified empirically), which is exactly the domain the driver's
    ``_session_ts_normalizer`` lands in — dropping tzinfo yields the
    identical naive wall clock, then the same ``_json_stat`` runs."""
    from wsspark.snapstore import _json_stat

    if v is not None and hasattr(v, "tzinfo") and v.tzinfo is not None:
        v = v.replace(tzinfo=None)
    return _json_stat(v, direction=direction)


def _batch_to_detail_dicts(
    batch, stats_cols: list[str], bloom_cols: list[str]
) -> tuple[list[str], dict, dict, dict]:
    """One aggregated Arrow batch (one row per file) -> the exact
    (paths, file_stats, file_blooms, file_meta) dicts the legacy driver
    pass would have built for those files. Shared by the mapInArrow
    tasks and the equivalence tests."""
    cols = {name: batch.column(name).to_pylist() for name in batch.schema.names}
    paths = [_plain_path(p) for p in cols["__path"]]
    stats: dict = {}
    if stats_cols:
        for i, p in enumerate(paths):
            stats[p] = {
                c: [
                    _exec_stat(cols[f"__min_{c}"][i], -1),
                    _exec_stat(cols[f"__max_{c}"][i], 1),
                ]
                for c in stats_cols
            }
    blooms: dict = {}
    for c in bloom_cols:
        words_col = cols[f"__bloom_{c}"]
        for i, p in enumerate(paths):
            words = words_col[i]
            if words is not None:
                blooms.setdefault(p, {})[c] = "".join(
                    f"{w:016x}" for w in words
                )
    meta = {
        p: {"rows": int(cols["__rows"][i]), "bytes": int(cols["__bytes"][i])}
        for i, p in enumerate(paths)
    }
    return paths, stats, blooms, meta


def _stats_agg_frame(
    df, stats_cols: list[str], bloom_cols: list[str], n_bits: int, k: int
):
    """ONE row per data file: rows, bytes, per-column min/max, per-column
    dense bloom words — the same aggregations ``_collect_file_stats`` /
    ``_collect_file_blooms`` run, kept as a DataFrame instead of
    collected. Bloom words use the identical explode + bit_or plan; the
    dense [n_words] layout is built with map_from_entries + transform
    (missing words = 0), matching the driver's ``[0]*n_words`` fill."""
    from wsspark.llmops.bloom import probe_positions

    need = list(dict.fromkeys(list(stats_cols) + list(bloom_cols)))
    base = df.select(
        F.col("_metadata.file_path").alias("__path"),
        F.col("_metadata.file_size").alias("__fsize"),
        *need,
    )
    aggs = [
        F.count(F.lit(1)).alias("__rows"),
        F.first("__fsize").alias("__bytes"),
    ]
    for c in stats_cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    out = base.groupBy("__path").agg(*aggs)
    if not bloom_cols:
        return out
    n_words = n_bits // 63 + 1
    pairs = []
    for ci, c in enumerate(bloom_cols):
        key = F.substring(F.md5(F.col(c).cast("string")), 1, 16)
        for p in probe_positions(key, n_bits, k):
            pairs.append(
                F.when(
                    F.col(c).isNotNull(),
                    F.struct(
                        F.lit(ci).alias("ci"), p.cast("long").alias("pos")
                    ),
                )
            )
    e = F.explode(F.filter(F.array(*pairs), lambda s: s.isNotNull())).alias(
        "_e"
    )
    by_word = (
        base.select("__path", e)
        .groupBy(
            "__path",
            F.col("_e.ci").alias("_ci"),
            F.floor(F.col("_e.pos") / 63).cast("long").alias("_w"),
        )
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    F.pmod(F.col("_e.pos"), F.lit(63)).cast("int"),
                )
            ).alias("_bits")
        )
    )
    dense = (
        by_word.groupBy("__path", "_ci")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_w", "_bits"))
            ).alias("_m")
        )
        .select(
            "__path",
            "_ci",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda i: F.coalesce(
                    F.element_at("_m", i.cast("long")),
                    F.lit(0).cast("long"),
                ),
            ).alias("_words"),
        )
    )
    per_col = dense.groupBy("__path").agg(
        *[
            F.first(
                F.when(F.col("_ci") == ci, F.col("_words")), ignorenulls=True
            ).alias(f"__bloom_{c}")
            for ci, c in enumerate(bloom_cols)
        ]
    )
    return out.join(per_col, "__path", "left")


def _make_part_writer(
    stats_cols: list[str],
    bloom_cols: list[str],
    mdir: str,
    version: int,
    part_root: str | None = None,
    name_prefix: str | None = None,
):
    """The mapInArrow function: fold the partition's aggregated batches
    through the EXACT dict->arrow serializer the driver path uses
    (``_detail_table_from_dicts`` — same struct field names, same
    widening, same schema metadata), write ONE sidecar part per
    partition, emit an O(1) summary row. Ascending-order violations in
    the plain-path domain are reported, not guessed around."""
    if part_root is None:
        part_root = os.path.dirname(mdir)
    if name_prefix is None:
        name_prefix = f"v{version:012d}"

    def _write_parts(batches):
        import pyarrow as pa

        from wsspark.snapstore import (
            _align_detail_tables,
            _detail_table_from_dicts,
        )

        tables = []
        first = last = None
        ordered = True
        n_rows = 0
        for batch in batches:
            if batch.num_rows == 0:
                continue
            paths, stats, blooms, meta = _batch_to_detail_dicts(
                batch, stats_cols, bloom_cols
            )
            for p in paths:
                if last is not None and p <= last:
                    ordered = False
                last = p
            if first is None:
                first = paths[0]
            n_rows += len(paths)
            tables.append(
                _detail_table_from_dicts(
                    {
                        "file_stats": stats,
                        "file_blooms": blooms,
                        "file_meta": meta,
                    },
                    paths=paths,
                )
            )
        if not tables:
            return
        t = tables[0]
        for nxt in tables[1:]:
            merged = _align_detail_tables(t, nxt)
            if merged is None:  # impossible within one schema; be loud
                raise RuntimeError(
                    "detail typed-index domain conflict within one commit"
                )
            t = merged
        import pyarrow.parquet as pq

        from wsspark.snapstore import _stamp_part_root

        name = f"{name_prefix}-{uuid.uuid4().hex[:8]}.detail.parquet"
        pq.write_table(
            _stamp_part_root(t, part_root),
            os.path.join(mdir, name),
        )
        yield pa.RecordBatch.from_pydict(
            {
                "name": [name],
                "n_rows": [n_rows],
                "first": [first],
                "last": [last],
                "ordered": [ordered],
            }
        )

    return _write_parts


_SUMMARY_SCHEMA = (
    "name string, n_rows long, first string, last string, ordered boolean"
)


def build_detail_parts_distributed(
    spark: SparkSession,
    commit_dir: str,
    new_files: list[str],
    stats_cols: list[str],
    bloom_cols: list[str],
    bloom_bits: int,
    bloom_k: int,
    mdir: str,
    version: int,
    part_root: str | None = None,
    name_prefix: str | None = None,
) -> tuple[list[str], list[str]] | None:
    """Write a fresh commit's detail sidecar parts via Spark tasks.

    Returns ``(part_names, files_in_part_order)`` — the manifest must
    publish exactly that file list so the chain is provably exact — or
    ``None`` when this commit's shape can't be proven equivalent to the
    legacy driver pass (unsupported stats type, unparseable session tz,
    an ordering/count verification failure), in which case the caller
    runs the legacy path; correctness is never traded for the shortcut.

    ``files_in_part_order`` is globally sorted — zero-row files (which
    never reach the _metadata-grouped aggregation) are MERGED into
    sorted position: rows landing inside a task-written part's range
    rewrite that part (concat + sort by path, row content untouched),
    rows falling between parts ride their own part at the right pointer
    position — so the chain keeps the same globally-sorted file-list
    property every driver path inherits from ``_list_parquet`` (r16,
    advisor finding; previously empties rode an out-of-order tail part).

    ``part_root``/``name_prefix`` let the WAP staging path write parts
    under the STAGED commit dir (protected by the staged-grace clock,
    removed by abort's rmtree) with stage-scoped names; publish links
    them into the manifest dir under version names
    (``snap_publish_staged``). Defaults preserve the direct-commit
    behavior: parts in ``mdir`` stamped with the store root."""
    import pyarrow.parquet as pq

    from wsspark import snapstore as ss

    if part_root is None:
        part_root = os.path.dirname(mdir)
    if name_prefix is None:
        name_prefix = f"v{version:012d}"
    df = spark.read.parquet(commit_dir)
    fields = {f.name: f.dataType for f in df.schema.fields}
    for c in stats_cols:
        if not isinstance(fields.get(c), _NUM_TYPES + _STR_TYPES):
            return None  # legacy path defines behavior for exotic types
    for c in bloom_cols:
        if not isinstance(fields.get(c), ss._BLOOM_TYPES):
            raise ValueError(
                f"bloom_cols[{c!r}] has type {fields.get(c)} — manifest "
                "blooms support string/integral columns only (the "
                "driver-side probe must hash the identical string form "
                "the build hashed)"
            )
    if any(isinstance(fields.get(c), T.TimestampType) for c in stats_cols):
        # the legacy pass keeps the SYSTEM-tz domain when the session tz
        # is set but unparseable; the Arrow pass can only produce the
        # session domain — don't silently diverge
        sess = None
        try:
            sess = spark.conf.get("spark.sql.session.timeZone")
        except Exception:
            pass
        if sess and ss._session_ts_normalizer(spark) is None:
            return None
    # zero-row part files never reach a _metadata-grouped aggregation;
    # identify them by footer (only files small enough to possibly be
    # empty are opened — typically none) and give them a tail part
    empties: list[str] = []
    for f in new_files:
        if os.path.getsize(f) < _EMPTY_CANDIDATE_BYTES:
            if pq.ParquetFile(f).metadata.num_rows == 0:
                empties.append(f)
    empty_set = set(empties)
    nonempty = [f for f in new_files if f not in empty_set]
    part_names: list[str] = []

    def _cleanup() -> None:
        for n in part_names:
            try:
                os.remove(os.path.join(mdir, n))
            except OSError:
                pass

    files_ordered: list[str] = []
    chunks: list[list[str]] = []
    summaries: list = []
    if nonempty:
        n_words = bloom_bits // 63 + 1
        est_row = (
            160
            + 96 * len(stats_cols)
            + (n_words * 8 + 32) * len(bloom_cols)
        )
        part_rows = max(
            _part_min_rows(), min(1 << 20, _part_target_bytes() // est_row)
        )
        k = max(1, math.ceil(len(nonempty) / part_rows))
        agg = _stats_agg_frame(df, stats_cols, bloom_cols, bloom_bits, bloom_k)
        # persist so repartitionByRange's boundary-sampling job reads the
        # aggregated rows, not a second full scan of the data
        agg = agg.persist()
        try:
            ordered = agg.repartitionByRange(
                k, "__path"
            ).sortWithinPartitions("__path")
            writer = _make_part_writer(
                list(stats_cols), list(bloom_cols), mdir, version,
                part_root, name_prefix,
            )
            summaries = sorted(
                ordered.mapInArrow(writer, _SUMMARY_SCHEMA).collect(),
                key=lambda r: r["first"],
            )
        finally:
            agg.unpersist()
        part_names = [r["name"] for r in summaries]
        total = sum(r["n_rows"] for r in summaries)
        ok = total == len(nonempty) and all(r["ordered"] for r in summaries)
        for a, b in zip(summaries, summaries[1:]):
            ok = ok and a["last"] < b["first"]
        # strictly-ascending parts over the exact universe => the
        # concatenation IS sorted(nonempty); splice against the sorted
        # list to recover the per-part file slices without reading parts
        if ok:
            off = 0
            for r in summaries:
                chunk = nonempty[off : off + r["n_rows"]]
                if chunk[0] != r["first"] or chunk[-1] != r["last"]:
                    ok = False
                    break
                chunks.append(chunk)
                files_ordered.extend(chunk)
                off += r["n_rows"]
        if not ok:
            _cleanup()
            return None
    if empties:
        from wsspark.snapstore import (
            _align_detail_tables,
            _detail_table_from_dicts,
            _stamp_part_root,
        )

        def _empties_table(group: list[str]):
            return _detail_table_from_dicts(
                {
                    "file_stats": {},
                    "file_blooms": {},
                    "file_meta": {
                        f: {"rows": 0, "bytes": os.path.getsize(f)}
                        for f in group
                    },
                },
                paths=list(group),
            )

        def _write_group(table) -> str:
            name = f"{name_prefix}-{uuid.uuid4().hex[:8]}.detail.parquet"
            pq.write_table(
                _stamp_part_root(table, part_root), os.path.join(mdir, name)
            )
            part_names.append(name)  # owned: cleaned up on failure
            return name

        # Merge the zero-row files into SORTED position so the chain
        # keeps the globally-sorted file-list property: an empty inside
        # a part's [first, last] range rewrites that part (concat +
        # sort by path — rows untouched, order fixed); empties falling
        # between parts ride their own part at that pointer position.
        inside: dict[int, list[str]] = {}
        gaps: dict[int, list[str]] = {}  # key i = before part i
        for e in sorted(empties):
            for i, r in enumerate(summaries):
                if e < r["first"]:
                    gaps.setdefault(i, []).append(e)
                    break
                if e <= r["last"]:
                    inside.setdefault(i, []).append(e)
                    break
            else:
                gaps.setdefault(len(summaries), []).append(e)
        final_names: list[str] = []
        final_files: list[str] = []
        for i, r in enumerate(summaries):
            if i in gaps:
                final_names.append(_write_group(_empties_table(gaps[i])))
                final_files.extend(gaps[i])
            if i in inside:
                old = os.path.join(mdir, r["name"])
                merged = _align_detail_tables(
                    pq.read_table(old), _empties_table(inside[i])
                )
                if merged is None:  # typed-index domain conflict: exact
                    _cleanup()  # legacy fallback, never a guessed chain
                    return None
                final_names.append(
                    _write_group(merged.sort_by("path"))
                )
                os.remove(old)
                part_names.remove(r["name"])
                final_files.extend(sorted(chunks[i] + inside[i]))
            else:
                final_names.append(r["name"])
                final_files.extend(chunks[i])
        if len(summaries) in gaps:
            tail = gaps[len(summaries)]
            final_names.append(_write_group(_empties_table(tail)))
            final_files.extend(tail)
        part_names = final_names
        files_ordered = final_files
    if not part_names:
        return None  # nothing to write (no files) — legacy handles
    return part_names, files_ordered
