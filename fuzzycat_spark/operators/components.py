"""Connected components over the verified-pair edge list.

The reference never needs real CC — its clusters ARE the key groups
(records sharing one blocking key, `/root/reference/notes/old_pipeline.md:23`).
Once multiple blocking strategies (LSH bands, SimHash buckets, containment)
can link records across blocks, transitive closure needs an actual CC
computation (SURVEY.md §2.9/§4) — this is the one genuinely custom
algorithm in the pipeline.

Algorithm: iterative min-label propagation with pointer jumping
(hash-to-min flavor): each node takes the min label over itself, its
neighbors, and its current label's label. Pointer jumping makes convergence
O(log diameter) instead of O(diameter), which matters for chain-shaped
containment families at web scale. Each iteration `localCheckpoint`s to cut
lineage (a 20-iteration lineage otherwise re-executes the whole DAG every
action); on a cluster these would be Iceberg/parquet checkpoints via
plans.checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    max_iterations: int = 25,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Return (id, cluster_id) where cluster_id = min node id (lexicographic
    for strings) over each connected component of the undirected edge set.

    Nodes appearing only as singletons are absent (callers union them back
    with cluster_id = own id if needed).
    """
    e = edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # materialize the edge set once — otherwise every iteration (and every
    # convergence-check action) re-executes the entire upstream pipeline
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )

    for _ in range(max_iterations):
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "dst"), on="dst")
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("src", "id")
        )
        # pointer jumping: label of my label
        hop = (
            labels.alias("l")
            .join(
                labels.select(
                    F.col("id").alias("label"), F.col("label").alias("hop_label")
                ).alias("r"),
                on="label",
            )
            .select("id", "label", "hop_label")
        )
        new_labels = (
            hop.join(nbr_min, on="id", how="left")
            .select(
                "id",
                F.least(
                    F.col("label"),
                    F.col("hop_label"),
                    F.coalesce(F.col("nbr_label"), F.col("label")),
                ).alias("new_label"),
                "label",
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("new_label") != F.col("label")).count()
        labels = new_labels.select("id", F.col("new_label").alias("label"))
        if changed == 0:
            break

    return labels.select("id", F.col("label").alias("cluster_id"))
