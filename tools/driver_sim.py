"""Strict local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry under a VANILLA SparkSession
(no wsspark.session configs — exactly what the external harness does) and
its DuckDB oracle at the given sf dir, then compares row count, column
names, and an order-insensitive value hash (columns sorted by name, rows
sorted, values stringified). A hash mismatch here predicts a driver
hash mismatch; exact float equality is required — rounding discipline in
the queries is what makes that achievable.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd


def canonical(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            out[c] = s.map(
                lambda v: v.isoformat()
                if isinstance(v, (dt.date, dt.datetime))
                else (json.dumps(v) if isinstance(v, (list, dict)) else str(v))
                if v is not None
                else None
            )
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
    out = out[sorted(out.columns)]
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )


def value_hash(pdf: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in pdf.itertuples(index=False):
        for v in row:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                h.update(b"\x00NULL")
            elif isinstance(v, float):
                # repr, NOT %.10g: the driver stringifies dtypes as-is, so
                # float 0.0 must hash differently from int 0 or the sim
                # passes where the driver fails (the r04 pii_summary red).
                h.update(repr(v).encode())
            else:
                h.update(str(v).encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    results: dict[str, dict] = {}
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canonical(fn(spark, sf_dir).toPandas())
        except Exception as e:
            results[name] = {"status": "ERR", "err": repr(e)[:300]}
            n_fail += 1
            print(f"ERR   {name}: {repr(e)[:200]}")
            continue
        if name not in oracles:
            results[name] = {"status": "rows_only", "rows": len(got)}
            n_weak += 1
            print(f"weak  {name}: rows_only rows={len(got)} ({time.time()-t0:.1f}s)")
            continue
        try:
            want = canonical(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            results[name] = {"status": "ORACLE_ERR", "err": repr(e)[:300]}
            n_fail += 1
            print(f"OERR  {name}: {repr(e)[:200]}")
            continue
        rows_ok = len(got) == len(want)
        cols_ok = list(got.columns) == list(want.columns)
        # int-vs-float divergence stringifies differently in the driver's
        # hash even when values are numerically equal — fail it here.
        dtypes_ok = cols_ok and [str(t) for t in got.dtypes] == [
            str(t) for t in want.dtypes
        ]
        hash_ok = cols_ok and rows_ok and value_hash(got) == value_hash(want)
        status = "pass" if (rows_ok and cols_ok and dtypes_ok and hash_ok) else "FAIL"
        results[name] = {
            "status": status,
            "rows": len(got),
            "oracle_rows": len(want),
            "cols_ok": cols_ok,
            "dtypes_ok": dtypes_ok,
            "hash_ok": hash_ok,
        }
        if status == "pass":
            n_pass += 1
            print(f"pass  {name}: rows={len(got)} ({time.time()-t0:.1f}s)")
        else:
            n_fail += 1
            print(
                f"FAIL  {name}: rows {len(got)}/{len(want)} cols_ok={cols_ok} "
                f"dtypes_ok={dtypes_ok} hash_ok={hash_ok}"
            )
            if cols_ok and not dtypes_ok:
                diverged = [
                    f"{c}: spark={gt} oracle={wt}"
                    for c, gt, wt in zip(got.columns, got.dtypes, want.dtypes)
                    if str(gt) != str(wt)
                ]
                print(f"      dtype divergence: {diverged}")
            if cols_ok and rows_ok and not hash_ok:
                # locate the first differing column for debugging
                for c in got.columns:
                    g, w = got[c], want[c]
                    same = (g == w) | (g.isna() & w.isna())
                    if not same.all():
                        print(
                            f"      first diff col={c}: "
                            f"{g[~same].head(3).tolist()} vs {w[~same].head(3).tolist()}"
                        )
                        break
            elif not cols_ok:
                print(f"      spark cols {list(got.columns)}")
                print(f"      oracle cols {list(want.columns)}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
