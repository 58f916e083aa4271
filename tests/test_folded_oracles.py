"""Folded queries keep their full oracle hash check — in pytest.

The registry-slot policy (wsspark/queries/llm.py FOLDED_QUERIES) removes
near-duplicate diagnostics from the driver's 50-slot rotation once a
stronger registered check covers them. This suite is the compensating
control: every folded query still runs its Spark implementation AND its
DuckDB oracle side-by-side with EXACTLY the driver's compare (the
canonical()/value_hash() functions from tools/driver_sim — columns sorted
by name, rows stable-sorted, repr-hashed floats, dtype-divergence fatal),
at sf0.001 so the suite stays fast.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "tools"))
try:
    from driver_sim import canonical, value_hash
finally:
    sys.path.pop(0)

from wsspark.queries.llm import FOLDED_QUERIES

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


@pytest.mark.parametrize("q", FOLDED_QUERIES, ids=lambda q: q.name)
def test_folded_query_matches_oracle(spark, sf_dir, oracle_con, q):
    assert q.oracle is not None, f"{q.name}: folded queries must keep an oracle"
    got = canonical(q.fn(spark, sf_dir).toPandas())
    want = canonical(oracle_con.execute(q.oracle).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert [str(t) for t in got.dtypes] == [str(t) for t in want.dtypes]
    assert len(got) == len(want)
    assert value_hash(got) == value_hash(want)


def test_folded_never_shadows_registry():
    from wsspark.queries import build_registry

    reg = set(build_registry())
    folded = {q.name for q in FOLDED_QUERIES}
    assert not (reg & folded), "a query may not be both registered and folded"
