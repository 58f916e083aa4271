"""Iterative graph analytics over the warehouse transfer network.

The reference treats transfers as flat route aggregates
(etl/transform/warehouse_performance.py:17-44 — per-route counts/qty).
The natural follow-up question a network of warehouses raises — which
warehouses are structurally central to the flow — is a fixpoint
computation, not a single aggregate. ``pagerank`` implements the weighted
PageRank iteration as a bounded loop of DataFrame joins:

    r_{t+1}(v) = (1-d)/N + d * ( Σ_{u→v} r_t(u) · w(u,v)/W(u)
                                 + Σ_{dangling u} r_t(u) / N )

Design for scale (the llmops dup_clusters pointer-jumping rules apply):

- The edge transition matrix (edge weight / source out-weight) is
  computed ONCE and ``localCheckpoint``-ed: every iteration reuses the
  materialized partitions instead of re-deriving the join lineage.
- Each iteration is one join (ranks ⨝ edges on src, both sides keyed the
  same way, so a co-partitioned layout shuffles ranks only) plus one
  groupBy(dst); rank state is localCheckpointed every
  ``checkpoint_interval`` iterations (default 3) so the plan stays
  O(interval) deep instead of O(iterations) while paying a third of the
  materialization jobs of per-iteration checkpointing — measured on the
  sf0.1 route graph: per-iteration checkpoints 1.6-2.5 s, interval 3
  ~1.5-2.0 s, no mid-loop checkpoint 0.9-1.5 s for the 5-iteration
  query; the fixed job/stage overhead dominates wall time on
  dimension-sized graphs. On a billion-edge graph the trade reverses
  toward more frequent checkpoints (lineage replay cost dominates), so
  the cadence is a parameter, and ``checkpoint_dir=`` switches every
  materialization point to the storage-backed ``checkpoint()`` for
  cluster fault tolerance (tests/test_graph.py pins result equality).
- Dangling mass is folded in via a 1-row aggregate cross-joined onto the
  update — NO driver-side collect inside the loop. The dangling-node
  flag is STATIC, so it is computed once and carried as a column of the
  rank state: the per-iteration dangling mass is then a plain filtered
  aggregate of ranks, no join at all. The only driver scalar is N
  (graph order), computed once up front.
- Iterations are a fixed count, mirroring the unrolled-CTE oracle; a
  convergence-threshold variant changes only the loop condition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    checkpoint_interval: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Weighted PageRank over ``edges`` (src, dst, weight); returns
    (node, rank) with Σ rank = 1 at every step.

    ``checkpoint_dir``: when set, every materialization point uses a
    RELIABLE storage-backed ``checkpoint()`` rooted there instead of
    ``localCheckpoint()`` — the billion-edge cluster mode, where executor
    loss must not force a full lineage replay (localCheckpoint blocks are
    gone with the executor; reliable checkpoints live in shared storage).
    Sets the context's checkpoint dir as a side effect (a
    SparkContext-global setting)."""
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint()
    else:

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()

    nodes = _ckpt(
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty edge frame (no nodes)")
    out_w = edges.groupBy(src).agg(F.sum(weight).alias("_ow"))
    trans = _ckpt(
        edges.join(out_w, src)
        .select(
            F.col(src).alias("_src"),
            F.col(dst).alias("_dst"),
            (F.col(weight).cast("double") / F.col("_ow")).alias("_p"),
        )
    )
    has_out = trans.select(
        F.col("_src").alias("node"), F.lit(True).alias("_has_out")
    ).distinct()
    # the dangling FLAG is static — resolve it once and carry it as a
    # column of the rank state, so each iteration's dangling mass is a
    # plain filtered aggregate (no join)
    nodes_f = _ckpt(
        nodes.join(has_out, "node", "left")
        .select(
            "node",
            (~F.coalesce(F.col("_has_out"), F.lit(False))).alias("_dang"),
        )
    )
    ranks = nodes_f.select("node", "_dang", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for it in range(n_iter):
        contrib = (
            trans.join(ranks, trans["_src"] == ranks["node"])
            .groupBy("_dst")
            .agg(F.sum(F.col("rank") * F.col("_p")).alias("_c"))
        )
        dangling = ranks.filter("_dang").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        ranks = (
            nodes_f.join(contrib, nodes_f["node"] == contrib["_dst"], "left")
            .crossJoin(dangling)
            .select(
                "node",
                "_dang",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_c"), F.lit(0.0)) + F.col("_dm") / n)
                ).alias("rank"),
            )
        )
        # bound plan depth without a materialization job per iteration
        if (it + 1) % checkpoint_interval == 0 and it != n_iter - 1:
            ranks = _ckpt(ranks)
    return ranks.select("node", "rank")
