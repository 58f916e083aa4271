"""Z-order layout (wsspark/layout.py): key correctness vs a Python
reference Morton encoder, and an end-to-end pruning check — the z-ordered
write must leave BOTH keyed columns prunable from row-group statistics,
where a single-column sort only prunes its own column."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from wsspark.io import read_table
from wsspark.layout import Z_BITS, write_zordered, zorder_key


def py_morton(x: int, y: int) -> int:
    out = 0
    for i in range(Z_BITS):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zkey_matches_reference_morton(spark):
    pts = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (255, 256)]
    df = spark.createDataFrame(pts, "x int, y int")
    # identity quantizer: range [0, 2**Z_BITS) maps bucket == value
    hi = float(1 << Z_BITS)
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y",
            zorder_key(F.col("x"), F.col("y"), (0.0, hi), (0.0, hi)).alias("z"),
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == py_morton(x, y), (x, y)


def test_zkey_locality_beats_lexicographic(spark):
    """Points in the same small (x, y) rectangle sit closer in z-rank than
    in (x)-then-(y) rank: the clustering property the layout exists for.
    Deterministic check: the max z-gap inside a 16x16 tile is bounded by
    the tile's z-range (tiles are CONTIGUOUS z intervals when aligned)."""
    hi = float(1 << Z_BITS)
    tile = [(x, y) for x in range(32, 48) for y in range(64, 80)]
    df = spark.createDataFrame(tile, "x int, y int")
    zs = [
        r.z
        for r in df.select(
            zorder_key(F.col("x"), F.col("y"), (0.0, hi), (0.0, hi)).alias("z")
        ).collect()
    ]
    # an aligned 16x16 tile occupies exactly one contiguous 256-key block
    assert max(zs) - min(zs) == 255
    assert len(set(zs)) == 256


def _prune_fraction(path: str, col: str, lo, hi) -> float:
    import os

    skip = total = 0
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
                total += 1
                if mx < lo or mn > hi:
                    skip += 1
    return skip / total


def test_zorder_write_prunes_both_dimensions(spark, sf_dir, tmp_path):
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_shipdate")
    pk_max = li.agg(F.max("l_partkey")).first()[0]
    d_lo, d_hi = li.agg(
        F.unix_date(F.min("l_shipdate").cast("date")),
        F.unix_date(F.max("l_shipdate").cast("date")),
    ).first()
    path = str(tmp_path / "z")
    write_zordered(
        li, path, "l_partkey", "l_shipdate",
        (0.0, float(pk_max)), (float(d_lo), float(d_hi)), n_files=16,
    )
    # narrow band on each dimension: most row groups must be skippable
    import datetime

    pk = _prune_fraction(path, "l_partkey", int(pk_max * 0.4), int(pk_max * 0.42))
    dt = _prune_fraction(
        path, "l_shipdate",
        datetime.datetime(1997, 6, 1), datetime.datetime(1997, 8, 1),
    )
    # Threshold 0.4, not 0.5: repartitionByRange draws its boundary
    # sample with a seed that varies by RDD id, so the fraction moves
    # run-to-run inside a shared session (observed 0.56-0.75 across
    # seeds at both n_files=16 and 32 — the flakiness that failed one
    # full-suite run at the old 0.5 line). The CONTRACT is "substantial
    # pruning in BOTH dimensions" vs ~0 for a single-column sort, and
    # 0.4 keeps seed variance out while still falsifying a broken
    # z-key (which collapses one dimension's fraction to ~0).
    assert pk >= 0.4, f"partkey prune fraction {pk:.0%}"
    assert dt >= 0.4, f"shipdate prune fraction {dt:.0%}"
    # the written data is intact (clustering is a rewrite, not a filter)
    assert spark.read.parquet(path).count() == li.count()


def test_zorder_nd_bijective_and_three_dim_pruning(spark, sf_dir, tmp_path):
    """K-dim Morton key: bijective on bucket tuples (no two distinct
    bucket combinations may collide), and a 3-column clustered write
    prunes row groups on EVERY dimension — the shape a 2-D curve cannot
    serve. Thresholds follow the key's bit geometry (later dims own the
    higher-order bits: 1/2/2 leading bits at 32 files), with seed-
    variance margin (see the 2-D test)."""
    import datetime

    from wsspark.layout import write_zordered_nd, zorder_key_nd

    grid = spark.range(1024).select(
        (F.col("id") % 32).alias("a"),
        (F.col("id") / 32).cast("long").alias("b"),
    )
    n = (
        grid.select(
            zorder_key_nd([F.col("a"), F.col("b")], [(0, 31), (0, 31)]).alias("z")
        )
        .distinct()
        .count()
    )
    assert n == 1024  # bijective on the bucket grid

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate"
    )
    pk = li.agg(F.max("l_partkey")).first()[0]
    sk = li.agg(F.max("l_suppkey")).first()[0]
    d_lo, d_hi = li.agg(
        F.unix_date(F.min("l_shipdate").cast("date")),
        F.unix_date(F.max("l_shipdate").cast("date")),
    ).first()
    path = str(tmp_path / "z3")
    write_zordered_nd(
        li,
        path,
        ["l_partkey", "l_suppkey", "l_shipdate"],
        [(0.0, float(pk)), (0.0, float(sk)), (float(d_lo), float(d_hi))],
        n_files=32,
    )
    f1 = _prune_fraction(path, "l_partkey", int(pk * 0.4), int(pk * 0.45))
    f2 = _prune_fraction(path, "l_suppkey", int(sk * 0.4), int(sk * 0.45))
    f3 = _prune_fraction(
        path, "l_shipdate",
        datetime.datetime(1997, 6, 1), datetime.datetime(1997, 9, 1),
    )
    assert f1 >= 0.2, f"dim0 prune {f1:.0%}"
    assert f2 >= 0.35, f"dim1 prune {f2:.0%}"
    assert f3 >= 0.45, f"dim2 prune {f3:.0%}"
    assert spark.read.parquet(path).count() == li.count()

    import pytest

    with pytest.raises(ValueError, match=">= 2"):
        zorder_key_nd([F.col("a")], [(0, 1)])
    with pytest.raises(ValueError, match="range per column"):
        zorder_key_nd([F.col("a"), F.col("b")], [(0, 1)])
