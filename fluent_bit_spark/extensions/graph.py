"""Connected components over candidate-pair edge lists — the cluster
consolidation stage of near-duplicate dedup.

MinHash/SimHash candidate generation emits PAIRS; keeping one document per
transitive cluster (A~B, B~C => {A,B,C} keep one) needs connectivity, not
pairs. This is the hash-min label-propagation algorithm used by the
standard large-graph frameworks: every node repeatedly adopts the minimum
label among itself and its neighbors, converging to the component's
minimum node id in O(component diameter) rounds, each round one shuffle
join + one aggregate. Near-dup clusters have tiny diameters (stars/cliques
from banded LSH), so 3-5 rounds settle real corpora; `max_iter` bounds the
worst case.

Scale shape per round: edges join labels on src (shuffle keyed by node
id), then min-aggregate on dst — no driver-side state except a one-row
convergence count per round (a scalar job, same class as the k-means
centroid state in similarity.py). At 100 TB the edge list is orders of
magnitude smaller than the corpus (only candidate pairs), so the rounds
run on the small derived table, never the raw docs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
    hops_per_round: int = 2,
) -> DataFrame:
    """Resolve an undirected edge list into (id, component) where
    ``component`` is the minimum node id reachable from ``id``. Nodes not
    present in ``pairs`` are absent (join back with coalesce(id) for the
    full assignment)."""
    # partition-explosion guard: a pairs plan built from a cartesian or
    # a many-way join can carry n x m near-empty partitions; evaluating
    # it twice (both edge directions) then costs task-launch overhead
    # proportional to partitions, not rows. Coalescing to a few tasks
    # per core preserves parallelism while bounding launches.
    par = pairs.sparkSession.sparkContext.defaultParallelism
    if pairs.rdd.getNumPartitions() > 4 * par:
        pairs = pairs.coalesce(4 * par)
    edges = (
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("lbl"), F.lit(True).alias("chg"))
    )
    edges = edges.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)

    def one_hop(lbls: DataFrame) -> DataFrame:
        # FRONTIER propagation: a node's label can only improve via a
        # neighbor whose label improved since it last propagated, so only
        # changed nodes feed the join (round 1: everyone). Propagation
        # stays monotone-min, so the fixpoint is identical to the dense
        # join while late rounds shrink to the few still-active nodes.
        frontier = lbls.filter("chg").select("id", "lbl")
        neigh = (
            edges.join(frontier, edges.src == frontier.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        return lbls.select("id", "lbl").join(neigh, "id", "left").select(
            "id",
            F.least("lbl", F.coalesce("nlbl", "lbl")).alias("lbl"),
            (F.coalesce("nlbl", F.col("lbl")) < F.col("lbl")).alias("chg"),
        )

    # ``hops_per_round`` propagation steps compose lazily between
    # checkpoints: small-diameter duplicate graphs (stars/cliques from
    # banded LSH) settle in 1-2 hops, so batching halves the number of
    # eager materialization jobs while lineage depth stays bounded. The
    # convergence probe checks only the LAST hop — propagation is
    # monotone, so a no-change hop is a fixpoint regardless of what the
    # earlier hops in the same round did.
    for _ in range(max(1, math.ceil(max_iter / hops_per_round))):
        stepped = labels
        for _h in range(hops_per_round):
            stepped = one_hop(stepped)
        # the convergence count rides the eager checkpoint's own job via
        # observe() — no extra join or probe job per round
        obs = Observation()
        labels = stepped.observe(
            obs, F.sum(F.col("chg").cast("long")).alias("changed")
        ).localCheckpoint(eager=True)
        if (obs.get["changed"] or 0) == 0:
            break
    return labels.select("id", F.col("lbl").alias("component"))


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Full-corpus component assignment: every doc gets its transitive
    cluster representative (min doc_id; itself when unpaired) plus a
    keep/drop flag. Filter ``is_representative`` for the dedup pass."""
    comp = connected_components(pairs, src_col, dst_col, max_iter)
    return (
        df.join(comp, df[id_col] == comp.id, "left")
        .select(
            df["*"],
            F.coalesce("component", F.col(id_col)).alias("component"),
        )
        .withColumn("is_representative", F.col(id_col) == F.col("component"))
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 3,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list — the domain/
    page authority signal crawl-curation pipelines rank by (quality
    weighting by site, seed selection, spam demotion).

    Simple power-iteration form: rank'(v) = (1-d)/N + d * sum over
    in-edges of rank(u)/outdeg(u). Dangling nodes (no out-edges) leak
    their damped mass rather than redistributing it — the documented
    contract here, chosen so a fixed iteration count is exactly
    replayable in portable SQL (the redistribution variant needs a
    per-iteration global scalar).

    Scale shape per iteration: one shuffle keyed by ``dst`` (map-side
    combinable sum) plus a broadcast-or-shuffle join of ranks to edges
    keyed by ``src``; lineage is cut with an eager localCheckpoint every
    ``checkpoint_every`` rounds so the plan stays bounded (the same
    discipline as connected_components). Multigraph edges are
    deduplicated first. Returns (node, rank), one row per distinct node.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("empty edge list")
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(int(iterations)):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outdeg, "src")
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
