"""Compression-ratio quality signal (wsspark/llmops/compress.py): exact
zlib parity, the ordering that makes it a curation gate, and the
band-filter semantics."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from wsspark.io import read_table
from wsspark.llmops import compress


def test_compression_ratio_matches_direct_zlib(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(50)
    got = {
        r.doc_id: (r.n_bytes, r.n_zbytes, r.zratio)
        for r in compress.compression_ratio(docs).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        raw = (r.text or "").encode("utf-8")
        z = len(zlib.compress(raw, 6))
        want = (len(raw), z, z / len(raw) if raw else None)
        assert got[r.doc_id] == want
    assert len(got) == 50


def test_compression_ratio_orders_text_quality(spark):
    rows = [
        (1, "spam " * 400),  # degenerate template
        (2, " ".join(f"w{i} token{i * 7 % 13}" for i in range(400))),  # prose-ish
        (3, "kq9x7!Rv2@Lp0#Zs8$Wn4%Jm6^" * 40),  # high-entropy-ish noise
        (4, ""),  # empty -> NULL ratio
        (5, None),  # NULL -> NULL ratio
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.zratio for r in compress.compression_ratio(docs).collect()}
    assert got[1] < got[2]  # repetition compresses far below prose
    assert got[4] is None and got[5] is None
    # determinism under layout changes
    again = {
        r.doc_id: r.zratio
        for r in compress.compression_ratio(docs.repartition(4)).collect()
    }
    assert again == got
    with pytest.raises(ValueError, match="level"):
        compress.compression_ratio(docs, level=0)

    kept = {
        r.doc_id
        for r in compress.repetition_gate(
            docs, min_ratio=got[1] + 1e-9, max_ratio=1.5
        ).collect()
    }
    assert 1 not in kept  # template gated out
    assert 2 in kept and 3 in kept
    assert 4 not in kept and 5 not in kept  # NULL ratio never passes
