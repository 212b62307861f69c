"""Connected components over near-duplicate pair edges.

Pair generators (operators/dedup.py: n-gram Jaccard, MinHash-LSH,
SimHash, embedding-cosine) emit EDGES; a real dedup pipeline needs the
transitive closure — duplicate GROUPS — so "keep one doc per group"
is well-defined even when A~B and B~C but A!~C. The reference has no
grouping stage (it stops at per-query search, main.go:351-404); this
is part of the training-data-pipeline extension surface (SURVEY §2.3).

Algorithm: iterated min-label propagation with pointer jumping —
each round every node takes the min label over {itself} ∪ neighbors
(one shuffle join on edges), then compresses label chains by looking
up its label's label (one shuffle join on the label table itself).
Propagation alone needs O(diameter) rounds; the pointer-jump step
doubles the hop distance covered per round, giving O(log n) rounds
(the Hash-to-Min bound, Rastogi et al., ICDE 2013). Per round the
work is two equi-joins sized |E| and |V| — no all-pairs, no driver
materialization; `localCheckpoint` truncates the growing lineage so
round k does not replay rounds 1..k-1.

At 100 TB the edge table (near-dup pairs) is orders of magnitude
smaller than the corpus — components run on pairs only; the corpus
is only touched by the final keep-rule semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, group_id) for every node appearing in ``edges``.

    ``group_id`` is the minimum node id of the component — a stable,
    deterministic canonical representative (the doc a keep-first rule
    retains). Iterates to a fixpoint (checked with a count action per
    round); raises if ``max_iter`` rounds do not converge, which for
    min-propagation + pointer jumping means a component of diameter
    > ~2^max_iter — unreachable in practice.
    """
    sym = edges.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).union(
        edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    )
    sym = sym.localCheckpoint(eager=True)
    # round 0 folded into init: lbl = min(node, min neighbor)
    labels = (
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.least(F.col("node"), F.min("dst")).alias("lbl"))
        .localCheckpoint(eager=True)
    )
    # labels only ever decrease, so sum(lbl) is a strictly-monotone
    # convergence witness — one cheap agg per round instead of an
    # old-vs-new change-detection join
    prev_sum = labels.agg(F.sum("lbl")).head()[0]

    for _ in range(max_iter):
        # min label over neighbors (shuffle join on |E|)
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("lbl").alias("nlbl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nlbl").alias("nbr_min"))
        )
        stepped = (
            labels.join(
                nbr_min.withColumnRenamed("src", "node"), "node", "left"
            )
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce("nbr_min", F.col("lbl"))
                ).alias("lbl"),
            )
        )
        # pointer jump: lbl <- lbl[lbl] (labels are node ids, so the
        # label table indexes itself); compresses chains geometrically
        jumped = (
            stepped.alias("s")
            .join(
                stepped.select(
                    F.col("node").alias("lbl"), F.col("lbl").alias("lbl2")
                ).alias("p"),
                "lbl",
                "left",
            )
            .select(
                F.col("s.node").alias("node"),
                F.least(
                    F.col("lbl"), F.coalesce("lbl2", F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        labels = jumped
        cur_sum = labels.agg(F.sum("lbl")).head()[0]
        if cur_sum == prev_sum:
            return labels.select("node", F.col("lbl").alias("group_id"))
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_groups(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """(doc_id, group_id, group_size) for every doc in a dup pair.

    ``group_id`` = min doc_id of the component; the keep-first rule is
    ``doc_id == group_id``. Docs in no pair are implicitly their own
    singleton group and are not emitted (join back with a left join
    and ``coalesce(group_id, doc_id)`` to label the full corpus).
    """
    comp = connected_components(pairs, a_col=a_col, b_col=b_col)
    # a window avoids a second relation entirely: one hash exchange on
    # group_id serves both the count and the join-back (sizes is
    # O(#components) — at corpus scale that's NOT broadcastable)
    w = Window.partitionBy("group_id")
    return (
        comp.withColumnRenamed("node", "doc_id")
        .withColumn("group_size", F.count("*").over(w))
        .select("doc_id", "group_id", "group_size")
    )
