"""Connected components over a near-duplicate pair graph.

The missing last step of every dedup pipeline: LSH/Jaccard emit PAIRS,
but keeping one representative per duplicate GROUP needs the transitive
closure. Min-label propagation: every node repeatedly adopts the minimum
label among itself and its neighbors; converges in O(graph diameter)
iterations (near-dup graphs are shallow — dup clusters are cliques or
short chains, so typically 2-4 iterations).

Scale notes: each iteration is one equi join (edges x labels, both
hash-partitioned on the join key) + a partial/final min aggregation; the
edge list is materialized once (eager localCheckpoint) and label frames
are checkpointed per iteration to truncate lineage, so plan size stays
constant no matter how many iterations run. Convergence is detected with
a count of changed labels (one tiny action per iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iter: int = 50) -> DataFrame:
    """(id, cluster_id) for every node appearing in `pairs`, where
    cluster_id is the minimum node id of the connected component."""
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (e.unionAll(e.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst")))
              .distinct()
              .localCheckpoint(eager=True))
    labels = (edges.select("src").distinct()
                   .withColumn("label", F.col("src"))
                   .localCheckpoint(eager=True))
    for _ in range(max_iter):
        nbr = (edges.join(labels.select(F.col("src").alias("dst"),
                                        F.col("label").alias("nl")), "dst")
                    .groupBy("src").agg(F.min("nl").alias("min_nbr")))
        new = (labels.join(nbr, "src", "left")
                     .select("src",
                             F.least(F.col("label"),
                                     F.coalesce(F.col("min_nbr"),
                                                F.col("label")))
                             .alias("label"))
                     .localCheckpoint(eager=True))
        changed = (new.join(labels.select("src",
                                          F.col("label").alias("old")),
                            "src")
                      .filter(F.col("label") != F.col("old")).count())
        labels = new
        if changed == 0:
            break
    return labels.select(F.col("src").alias("id"),
                         F.col("label").alias("cluster_id"))


def dedup_representatives(pairs: DataFrame, id_a: str = "id_a",
                          id_b: str = "id_b") -> DataFrame:
    """Per duplicate cluster: representative (min id) + cluster size —
    the keep/drop decision table of a dedup pipeline."""
    cc = connected_components(pairs, id_a, id_b)
    return (cc.groupBy("cluster_id")
              .agg(F.count("*").alias("n_members"))
              .withColumnRenamed("cluster_id", "rep_id"))


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             n_iter: int = 5, damping: float = 0.85) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list. Returns
    (id, pr_scaled) where pr_scaled = rank * N (so a uniform graph
    reads 1.0 per node regardless of size).

    Assumes every node has out-degree >= 1 — true for symmetrized
    graphs (co-occurrence / co-purchase), the shape this engine feeds
    it; dangling-mass redistribution is deliberately out of scope so
    the per-iteration plan stays one join + one aggregation.

    Scale: each iteration is one equi join (edges x ranks, both hash
    partitioned on the key) + a map-side-combining sum — the standard
    distributed formulation; ranks are localCheckpoint()ed per
    iteration so plan size stays constant. A fixed iteration count
    (not convergence polling) keeps it one action at the end.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.localCheckpoint(eager=True)
    outdeg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    nodes = (e.select(F.col("src").alias("id"))
              .unionAll(e.select(F.col("dst").alias("id")))
              .distinct()
              .localCheckpoint(eager=True))
    n = nodes.count()
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contrib = (e.join(outdeg, "src")
                    .join(ranks.withColumnRenamed("id", "src"), "src")
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.sum(F.col("pr") / F.col("_deg"))
                         .alias("_in")))
        ranks = (nodes.join(contrib, "id", "left")
                      .select("id",
                              (F.lit(base)
                               + F.lit(damping)
                               * F.coalesce(F.col("_in"), F.lit(0.0)))
                              .alias("pr"))
                      .localCheckpoint(eager=True))
    return ranks.select("id",
                        F.round(F.col("pr") * n, 4).alias("pr_scaled"))
