"""Graph operators on pair/edge DataFrames.

Connected components is the step that turns pairwise near-dup evidence into
keep/drop (and leakage-safe grouping) decisions; it's iterative, so it lives
here as an operator rather than a declarative query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Min-label propagation to a fixed point: every node's label converges
    to the smallest doc_id in its component.  O(graph diameter) rounds —
    near-dup graphs are overwhelmingly tiny cliques, so 2-3 rounds in
    practice; each round is one shuffle join + aggregate, and an eager
    localCheckpoint truncates the growing lineage (the standard pattern for
    iterative algorithms on DataFrames)."""
    fwd = pairs.select(F.col("x").alias("src"), F.col("y").alias("dst"))
    rev = pairs.select(F.col("y").alias("src"), F.col("x").alias("dst"))
    edges = fwd.union(rev).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # a component with propagation distance > max_iter would otherwise
        # return silently-wrong labels and surface as a confusing
        # differential mismatch downstream
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("lbl").alias("cluster"))
