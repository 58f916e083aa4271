"""Derive an sf1-scale spot-bench dataset (10x sf0.1) for the worst-scaler
slope extension — PLANS.md round-11 addendum.

The driver provides testdata only up to sf0.1; extending the measured
scaling slope one more decade needs a faithful 10x of the two tables the
five worst-scaling headline queries read (q17/q5/q7/q21 -> lineitem,
q27 -> documents). Construction (documented because fairness IS the
point):

- ``lineitem`` + ``orders`` + ``part`` + ``supplier``: 10 replicas each,
  with every key shifted by the key's OWNING table's (max+1) — l_partkey
  and p_partkey both shift by max(p_partkey)+1, l_suppkey/s_suppkey by
  max(s_suppkey)+1, l_orderkey/o_orderkey by max(o_orderkey)+1 — so
  replica k's foreign keys land exactly on replica k's dimension rows
  and every join measures genuine 10x growth, not phantom or dangling
  keys. Key CARDINALITY grows 10x while per-key group sizes and value
  distributions stay exactly sf0.1's — the same shape TPC-H itself
  scales by (more orders/parts/suppliers, not fatter groups). The
  remaining dims (customer/nation/region) are NOT replicated:
  o_custkey stays unshifted, so per-customer order counts grow 10x —
  fine for the lineitem-grain spot-bench queries, but do not use this
  dir for customer-grain scaling claims.
- ``documents``: 10 replicas with doc_id shifted and every whitespace
  token suffixed ``~k`` for replica k>0 (pure JVM transform/array_join).
  Token-set equality structure within a replica is preserved verbatim
  (doc frequencies, shingle sets, jaccard values all replicate), while
  replicas are pairwise disjoint — near-dup PAIR COUNTS scale exactly
  10x, like a corpus growing with mostly-unrelated new content. A naive
  10x copy would instead create C(10,2)=45 exact-dup pairs per source
  doc and benchmark a different (pathological) workload.

- ``embeddings``: 10 replicas with vec_id shifted and replica k>0
  vectors coordinate-ROLLED by k — within-replica geometry (norms, dot
  products, cluster structure) replicates exactly while replicas stay
  near-dup disjoint, so ANN/IVF-PQ workloads scale like a genuinely
  grown corpus rather than a tie-degenerate 10x copy.

Writes /root/repo/.testdata_sf1/{lineitem,orders,part,supplier,
documents,embeddings}.parquet (dirs; read_table reads them
transparently). Gitignored — regenerate with:

    python tools/make_sf1.py

Spot-bench the five rows with:

    SPARK_GRAFT_SF_DIR=/root/repo/.testdata_sf1 SPARK_GRAFT_SECOND_SF= \
    SPARK_GRAFT_QUERIES=q17_salted_product_totals,q27_prefix_jaccard,\
q5_transfer_patterns,q7_snapshot_recompute,q21_dq_expectations \
    python bench.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SRC = "/root/testdata/sf0.1"
DST = str(Path(__file__).resolve().parents[1] / ".testdata_sf1")
REPLICAS = 10


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)
    reps = spark.range(REPLICAS).select(F.col("id").cast("long").alias("_k"))

    # Offsets come from the OWNING table of each key, so a replica's
    # foreign keys land exactly on that replica's dimension rows (a
    # lineitem-side max would misalign part keys and dangle supplier
    # keys, measuring different join selectivity than genuine growth).
    part = spark.read.parquet(os.path.join(SRC, "part.parquet"))
    supp = spark.read.parquet(os.path.join(SRC, "supplier.parquet"))
    orders = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    p_off = part.agg(F.max("p_partkey")).first()[0] + 1
    s_off = supp.agg(F.max("s_suppkey")).first()[0] + 1
    o_off = orders.agg(F.max("o_orderkey")).first()[0] + 1

    def replicate(df, key_offsets, n_out):
        big = df.crossJoin(F.broadcast(reps)).select(
            *[
                (F.col(c) + F.col("_k") * F.lit(key_offsets[c])).alias(c)
                if c in key_offsets
                else F.col(c)
                for c in df.columns
            ]
        )
        return big.repartition(n_out)

    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    replicate(
        li,
        {"l_orderkey": o_off, "l_partkey": p_off, "l_suppkey": s_off},
        16,
    ).write.mode("overwrite").parquet(os.path.join(DST, "lineitem.parquet"))
    n_li = spark.read.parquet(os.path.join(DST, "lineitem.parquet")).count()

    replicate(part, {"p_partkey": p_off}, 4).write.mode("overwrite").parquet(
        os.path.join(DST, "part.parquet")
    )
    replicate(supp, {"s_suppkey": s_off}, 2).write.mode("overwrite").parquet(
        os.path.join(DST, "supplier.parquet")
    )
    # o_custkey deliberately unshifted (customer is not replicated) —
    # see module docstring for the grain caveat
    replicate(orders, {"o_orderkey": o_off}, 8).write.mode(
        "overwrite"
    ).parquet(os.path.join(DST, "orders.parquet"))

    # embeddings: 10 replicas, vec_id shifted; replica k>0 vectors are the
    # source vector ROLLED by k components — a coordinate permutation
    # preserves every within-replica norm/dot-product (the cluster
    # geometry IVF/PQ trains on replicates exactly) while a rolled vector
    # is generically far from its source, so replicas are near-dup
    # disjoint the way a 10x-grown corpus would be. A verbatim copy would
    # instead plant 10 exact duplicates of every vector and benchmark a
    # degenerate tie-heavy ANN workload.
    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    v_off = emb.agg(F.max("vec_id")).first()[0] + 1
    dim = len(emb.select("embedding").first()[0])
    rolled = F.when(F.col("_k") == 0, F.col("embedding")).otherwise(
        F.concat(
            F.slice(
                F.col("embedding"),
                (F.col("_k") % dim).cast("int") + 1,
                dim,
            ),
            F.slice(
                F.col("embedding"), 1, (F.col("_k") % dim).cast("int")
            ),
        )
    )
    emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("_k") * F.lit(v_off)).alias("vec_id"),
        rolled.alias("embedding"),
        "label",
    ).repartition(4).write.mode("overwrite").parquet(
        os.path.join(DST, "embeddings.parquet")
    )

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    doc_off = docs.agg(F.max("doc_id")).first()[0] + 1
    salted_text = F.when(F.col("_k") == 0, F.col("text")).otherwise(
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit("~"), F.col("_k").cast("string")),
            ),
            " ",
        )
    )
    big_docs = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("_k") * F.lit(doc_off)).alias("doc_id"),
        salted_text.alias("text"),
        "lang",
        "source",
        F.length(salted_text).cast("long").alias("n_chars"),
    )
    big_docs.repartition(8).write.mode("overwrite").parquet(
        os.path.join(DST, "documents.parquet")
    )
    n_docs = spark.read.parquet(os.path.join(DST, "documents.parquet")).count()
    print(f"wrote {DST}: lineitem={n_li} rows, documents={n_docs} rows")


if __name__ == "__main__":
    main()
