"""Connected components over the verified-pair edge list.

The reference never needs real CC — its clusters ARE the key groups
(records sharing one blocking key, `/root/reference/notes/old_pipeline.md:23`).
Once multiple blocking strategies (LSH bands, SimHash buckets, containment)
can link records across blocks, transitive closure needs an actual CC
computation (SURVEY.md §2.9/§4) — this is the one genuinely custom
algorithm in the pipeline.

Algorithm: min-label edge contraction + pointer doubling on the COMPOSED
label map. Each round:

1. per current super-node, take the min over its closed neighborhood in
   the CONTRACTED graph and fold it into the cumulative node→label map;
2. pointer-double the cumulative map T times (label ← label(label));
3. relabel both edge endpoints through the map, drop self-loops, dedup.

Contraction handles random-id chains (local minima absorb their basins;
the surviving path shrinks geometrically) and doubling on the CUMULATIVE
map handles monotone-id chains (where contraction alone removes O(1)
nodes per round but the map's reach multiplies ~2^T per round). Each
mechanism alone has a linear-convergence pathology — measured on
1,000-node paths: static-edge min propagation with one hop (the previous
formulation here) needs >60 rounds on a shuffled-id path, and contraction
with only in-round jumps needs >25 on a monotone-id path; the composition
converges in ≤6 rounds on both. Web containment chains (A contains B
contains C …) are exactly these shapes at 100 TB, where every extra round
is a full shuffle+checkpoint. The edge set — the big side — SHRINKS every
round instead of being re-shuffled at full size per iteration.

Convergence is certain (every component contracts to its min, which is a
fixed point of every round map), so exhausting `max_iterations` means an
astronomically deep graph — that now raises instead of silently returning
partial labels.

Each round is checkpointed to parquet via StageCheckpointer — a HARD
lineage cut. `DataFrame.localCheckpoint` chains measurably fail to cut
the recompute chain on Spark 4.1 (per-iteration cost grows ~3x per
iteration; see plans/checkpoint.py) — on a cluster these checkpoints are
the Iceberg stage tables that also make the loop resumable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from fuzzycat_spark.plans.checkpoint import StageCheckpointer

# pointer-doubling steps per round on the cumulative map: reach grows
# ~(2^T)x per round ACROSS rounds (round k reaches ~2^(T(k+1)) on a
# monotone chain), so with T=3 a 10^9-node chain needs ~10 rounds even if
# contraction contributed nothing. Each step is one self-join of the
# fixed-width (id, label) map, fused into the round's single labels write.
_JUMPS_PER_ROUND = 3
# Round-6 experiment, measured then REVERTED: dropping to 1 jump/round
# once the contracted edge set is tiny (< ~4k rows) saved ~10% CC wall on
# the dedup tail (every jump self-joins the FULL label map regardless of
# how few edges remain) and produced byte-identical assignments — but it
# weakens the operator's round bound from ~log8 to ~log3 of the surviving
# chain depth, which the convergence tests pin (a 33-node chain must
# finish within 8 rounds). Bounded rounds are the contract; the tail
# savings were not worth trading it.


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
    with cluster_id = own id if needed). Raises RuntimeError if
    max_iterations rounds do not converge (practically unreachable —
    rounds needed ≈ log_8(diameter)).
    """
    spark = edges.sparkSession
    ck = checkpointer or StageCheckpointer(spark)

    e = edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    eobs = Observation("cc_n_edges")
    # NO distinct on the symmetrized input: it cost a full shuffle+sort of
    # the largest table this loop ever touches and bought nothing — the
    # round-0 neighborhood min is duplicate-insensitive (groupBy), and the
    # first contraction's own distinct removes any input dups from the
    # surviving edge set. The write below is therefore shuffle-free.
    # Symmetrize with ONE Generate (each input row explodes into both
    # directions), not e.unionByName(e.swap): a union plans the upstream
    # subtree twice, and the caller's edge list is typically a LAZY verify
    # plan (dedup_stages no longer materializes the verified table), so
    # the union form re-ran the terminal verify tier + verdict dedup for
    # the second copy inside this checkpoint write. Measured on the sf0.1
    # components query (idle machine, interleaved, warm): 6.89s mean
    # union-form vs 6.12s explode-form; same row multiset either way.
    sym = ck.write(
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
                )
            ).alias("_e")
        )
        .select("_e.src", "_e.dst")
        .observe(eobs, F.count(F.lit(1)).alias("n")),
        "cc_edges_0",
    )
    # size the loop's shuffles to the edge list, not the (much larger)
    # corpus: a per-round join over a few thousand edges at corpus-width
    # partitioning is pure scheduling overhead. ~100k edges per partition.
    # The reduced partition count lives in a CHILD session (newSession():
    # isolated SQL conf, shared SparkContext and block/cache state) — a
    # conf set on the CALLER's session would race any concurrent query on
    # it (streaming foreachBatch + an ad-hoc batch query is a realistic
    # pair). The edge count rides on the cc_edges_0 write (Observation),
    # not a second job.
    n_edges = int(eobs.get["n"])
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    loop_parts = max(1, min(int(prev_parts), n_edges // 100_000 + 1))
    loop = spark.newSession()
    loop.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    lck = StageCheckpointer(loop, base_dir=ck.base_dir)
    e_cur = lck.load("cc_edges_0")

    labels: DataFrame | None = None
    labels_name = None
    for i in range(max_iterations):
        if n_edges == 0:
            break
        # per-super-node min over its closed neighborhood in the current
        # contracted graph (sym edges → every node appears as src)
        lab = (
            e_cur.groupBy("src")
            .agg(F.least(F.col("src"), F.min("dst")).alias("to"))
            .withColumnRenamed("src", "node")
        )
        if labels is None:
            labels = lab.select(
                F.col("node").alias("id"), F.col("to").alias("label")
            )
        else:
            # fold the round map into the cumulative one: label ← lab(label)
            # (left join: nodes in already-contracted components keep theirs)
            labels = labels.join(
                lab, labels["label"] == lab["node"], "left"
            ).select(
                "id", F.coalesce(F.col("to"), F.col("label")).alias("label")
            )
        # pointer doubling on the CUMULATIVE map: label ← label(label), T
        # times — reach compounds across rounds. All T self-joins fuse into
        # this round's one labels write job. Round 0 skips it: the dedup
        # workload's components are star/clique-shaped and finish in the
        # first contraction, so doubling there runs 3 self-joins over the
        # LARGEST (pre-contraction) labels map for nothing. Measured at 1M
        # edges/8 cores: star 7.5s → 5.4s (-28%), clique forest flat; the
        # adversarial 1M-node path pays one extra round (7 → 8, 69s →
        # 79s) — the worst-diameter shape trades ~15% for the realistic
        # shapes' win and still converges in log rounds.
        for _ in range(_JUMPS_PER_ROUND if i > 0 else 0):
            r = labels.select(F.col("id").alias("_n"), F.col("label").alias("_t"))
            labels = labels.join(r, labels["label"] == r["_n"], "left").select(
                "id", F.coalesce(F.col("_t"), F.col("label")).alias("label")
            )
        labels_name = f"cc_labels_{i % 2}"
        labels = lck.write(labels, labels_name)
        # contract: relabel both endpoints through the cumulative map, drop
        # self-loops, dedup. The edge set SHRINKS every round; the round
        # count rides on the write's Observation (no separate count job).
        ma = labels.select(F.col("id").alias("src"), F.col("label").alias("_s"))
        mb = labels.select(F.col("id").alias("dst"), F.col("label").alias("_d"))
        obs = Observation(f"cc_round_{i}")
        e_cur = lck.write(
            e_cur.join(ma, on="src")
            .join(mb, on="dst")
            .select(F.col("_s").alias("src"), F.col("_d").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .observe(obs, F.count(F.lit(1)).alias("n")),
            f"cc_edges_{1 + (i % 2)}",
        )
        n_edges = int(obs.get["n"])
        lck.record_counters(f"cc_iter_{i}", {"remaining_edges": n_edges})
    if n_edges > 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"rounds ({n_edges} contracted edges remain) — rounds needed "
            "grow ~log_8(diameter); raise max_iterations"
        )

    # fold the loop's checkpoints/counters back so the caller's next
    # manifest flush doesn't clobber the cc_iter_* convergence records
    ck._manifest.update(lck._manifest)
    ck._flush()

    if labels_name is None:
        # no edges at all: empty assignment typed like the input's ids
        return edges.select(
            F.col(id_a).alias("id"), F.col(id_a).alias("cluster_id")
        ).limit(0)
    # hand the result back on the CALLER's session (and at its
    # partitioning) so downstream joins never mix sessions. When the last
    # contraction emptied the edge set, labels IS the component-min
    # assignment: the component min is a fixed point of every round map,
    # and edge-set emptiness means the map is constant on each component.
    return (
        spark.read.parquet(lck.path(labels_name))
        .select("id", F.col("label").alias("cluster_id"))
    )
