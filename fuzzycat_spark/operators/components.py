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
containment families at web scale.

Each iteration is checkpointed to parquet via StageCheckpointer — a HARD
lineage cut. `DataFrame.localCheckpoint` chains measurably fail to cut the
recompute chain on Spark 4.1 (per-iteration cost grows ~3x per iteration;
see plans/checkpoint.py) — on a cluster these checkpoints are the Iceberg
stage tables that also make the loop resumable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from fuzzycat_spark.plans.checkpoint import StageCheckpointer


def connected_components(
    edges: DataFrame,
    max_iterations: int = 25,
    id_a: str = "id_a",
    id_b: str = "id_b",
    checkpointer: StageCheckpointer | None = None,
) -> DataFrame:
    """Return (id, cluster_id) where cluster_id = min node id (lexicographic
    for strings) over each connected component of the undirected edge set.

    Nodes appearing only as singletons are absent (callers union them back
    with cluster_id = own id if needed).
    """
    spark = edges.sparkSession
    ck = checkpointer or StageCheckpointer(spark)

    e = edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    eobs = Observation("cc_n_edges")
    sym = ck.write(
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .observe(eobs, F.count(F.lit(1)).alias("n")),
        "cc_edges",
    )
    # initial label = min(self, neighbors) — the first propagation round
    # fused into label creation, so clique-shaped families converge after
    # a single confirming iteration
    labels = ck.write(
        sym.groupBy("src")
        .agg(F.least(F.col("src"), F.min("dst")).alias("label"))
        .withColumnRenamed("src", "id"),
        "cc_labels",
    )

    # size the loop's shuffles to the edge list, not the (much larger)
    # corpus: a per-iteration join over a few thousand edges at corpus-width
    # partitioning is pure scheduling overhead. ~100k edges per partition.
    # The reduced partition count lives in a CHILD session (newSession():
    # isolated SQL conf, shared SparkContext and block/cache state) — the
    # round-3 version set spark.sql.shuffle.partitions on the CALLER's
    # session with a try/finally restore, which races any concurrent query
    # on that session (streaming foreachBatch + an ad-hoc batch query is a
    # realistic pair). The edge count rides on the cc_edges write
    # (Observation), not a second job.
    n_edges = int(eobs.get["n"])
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    loop_parts = max(1, min(int(prev_parts), n_edges // 100_000 + 1))
    loop = spark.newSession()
    loop.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    lck = StageCheckpointer(loop, base_dir=ck.base_dir)
    # re-read the checkpointed frames in the loop session (frames from
    # different sessions must not mix in one plan)
    sym = lck.load("cc_edges")
    labels = lck.load("cc_labels")

    last_name = "cc_labels"
    for i in range(max_iterations):
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "dst"), on="dst")
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("src", "id")
        )
        # one pointer jump per round — label(label(v)) — doubles pointer
        # depth per materialized round (log2 convergence on chains); a
        # second hop costs a full extra shuffle per iteration for a
        # marginal depth win and was the #1 line in the round-1 bench
        lut1 = labels.select(
            F.col("id").alias("label"), F.col("label").alias("hop1")
        )
        hop = labels.join(lut1, on="label").select("id", "label", "hop1")
        # the convergence counter rides on the checkpoint write itself
        # (Observation fills during the write job) — iterations cost
        # exactly ONE Spark job, no separate count action
        obs = Observation(f"cc_changed_{i}")
        new_labels = lck.write(
            hop.join(nbr_min, on="id", how="left")
            .select(
                "id",
                F.least(
                    F.col("label"),
                    F.col("hop1"),
                    F.coalesce(F.col("nbr_label"), F.col("label")),
                ).alias("new_label"),
                "label",
            )
            .observe(
                obs,
                F.count(
                    F.when(F.col("new_label") != F.col("label"), F.lit(1))
                ).alias("changed"),
            ),
            # alternate two slots so the loop doesn't accumulate files
            f"cc_labels_{i % 2}",
        )
        changed = int(obs.get["changed"])
        last_name = f"cc_labels_{i % 2}"
        labels = new_labels.select("id", F.col("new_label").alias("label"))
        lck.record_counters(f"cc_iter_{i}", {"changed": changed})
        if changed == 0:
            break
    # the loop recorded its checkpoints/counters in the CHILD
    # checkpointer's manifest copy; fold them back so the caller's next
    # flush (e.g. the pipeline's verdict counters) doesn't clobber the
    # cc_iter_* convergence records out of the shared manifest file
    ck._manifest.update(lck._manifest)
    ck._flush()
    # hand the result back on the CALLER's session (and at its
    # partitioning) so downstream joins never mix sessions
    final = spark.read.parquet(lck.path(last_name))
    if last_name == "cc_labels":
        return final.select("id", F.col("label").alias("cluster_id"))
    return final.select("id", F.col("new_label").alias("cluster_id"))
