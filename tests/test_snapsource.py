"""format("snapstore") — the Python Data Source over the snapshot
store: batch reads with manifest file-pruning pushdown, streaming reads
with versions-as-offsets and checkpointed exactly-once restart."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, In, LessThan

from wsspark import snapstore as ss
from wsspark.snapsource import SnapstoreBatchReader, register


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("val")
    )


def test_batch_read_matches_native_and_time_travels(spark, tmp_path):
    root = str(tmp_path / "s1")
    ss.snap_commit(_df(spark, 0, 100), root)
    ss.snap_commit(_df(spark, 100, 150), root, mode="append")
    register(spark)
    got = spark.read.format("snapstore").load(root)
    assert got.columns == ["id", "val"]
    assert {r.id for r in got.collect()} == set(range(150))
    pinned = (
        spark.read.format("snapstore").option("version", 0).load(root)
    )
    assert pinned.count() == 100


def test_batch_pushdown_prunes_through_blooms_and_stats(spark, tmp_path):
    """EqualTo/In prune through the manifest blooms on a hash layout;
    range predicates prune through min/max on a clustered layout. The
    reader reports every filter unhandled, so results stay exact."""
    root = str(tmp_path / "s2")
    ss.snap_commit(
        _df(spark, 0, 2000).repartition(16, "id"), root, bloom_cols=["id"]
    )
    reader = SnapstoreBatchReader(root, None)
    leftover = reader.pushFilters([EqualTo(("id",), 1234)])
    assert list(leftover) == [EqualTo(("id",), 1234)]  # superset contract
    assert len(reader.partitions()) < 16

    reader_in = SnapstoreBatchReader(root, None)
    reader_in.pushFilters([In(("id",), (3, 700, 1543))])
    assert len(reader_in.partitions()) < 16

    clustered = str(tmp_path / "s2r")
    ss.snap_commit(
        _df(spark, 0, 2000).repartitionByRange(8, "id"),
        clustered,
        stats_cols=["id"],
    )
    rr = SnapstoreBatchReader(clustered, None)
    rr.pushFilters([GreaterThanOrEqual(("id",), 1500), LessThan(("id",), 1700)])
    assert len(rr.partitions()) <= 2

    # end to end through Spark: pushdown happens inside Catalyst and the
    # exact predicate still applies
    register(spark)
    got = (
        spark.read.format("snapstore")
        .load(root)
        .filter(F.col("id") == 1234)
        .collect()
    )
    assert [(r.id, r.val) for r in got] == [(1234, 2468)]


def test_stream_versions_as_offsets_exactly_once(spark, tmp_path):
    """availableNow run 1 delivers the initial snapshot; appends land;
    run 2 from the SAME checkpoint delivers exactly the delta (no
    re-read of resident files, no duplicates)."""
    root = str(tmp_path / "s3")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    ss.snap_commit(_df(spark, 0, 50), root)
    register(spark)

    def run():
        q = (
            spark.readStream.format("snapstore")
            .load(root)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert {r.id for r in spark.read.parquet(sink).collect()} == set(range(50))
    ss.snap_commit(_df(spark, 50, 80), root, mode="append")
    ss.snap_commit(_df(spark, 80, 90), root, mode="append")
    run()
    out = spark.read.parquet(sink)
    assert out.count() == 90  # exactly once: 50 + 30 + 10
    assert {r.id for r in out.collect()} == set(range(90))


def test_stream_since_version_skips_resident_data(spark, tmp_path):
    root = str(tmp_path / "s4")
    sink = str(tmp_path / "sink4")
    ckpt = str(tmp_path / "ckpt4")
    ss.snap_commit(_df(spark, 0, 50), root)
    ss.snap_commit(_df(spark, 50, 60), root, mode="append")
    register(spark)
    q = (
        spark.readStream.format("snapstore")
        .option("sinceVersion", 0)
        .load(root)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert {r.id for r in spark.read.parquet(sink).collect()} == set(
        range(50, 60)
    )


def test_stream_refuses_overwrite_mid_lineage(spark, tmp_path):
    root = str(tmp_path / "s5")
    sink = str(tmp_path / "sink5")
    ckpt = str(tmp_path / "ckpt5")
    ss.snap_commit(_df(spark, 0, 10), root)
    register(spark)

    def run():
        q = (
            spark.readStream.format("snapstore")
            .load(root)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    ss.snap_commit(_df(spark, 100, 105), root, mode="overwrite")
    with pytest.raises(Exception, match="overwrite"):
        run()


def test_stream_initial_snapshot_aligns_evolved_files(spark, tmp_path):
    """A stream started on an evolved store reads pre-evolution files
    with the added column as NULL — the worker-side schema alignment."""
    root = str(tmp_path / "s6")
    sink = str(tmp_path / "sink6")
    ckpt = str(tmp_path / "ckpt6")
    ss.snap_commit(_df(spark, 0, 5), root)
    ss.snap_commit(
        _df(spark, 5, 8).withColumn("note", F.concat(F.lit("n"), F.col("id"))),
        root,
        mode="append",
        evolve=True,
    )
    register(spark)
    q = (
        spark.readStream.format("snapstore")
        .load(root)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    assert set(out.columns) == {"id", "val", "note"}
    rows = {r.id: r.note for r in out.collect()}
    assert len(rows) == 8
    assert all(rows[i] is None for i in range(5))
    assert rows[7] == "n7"
