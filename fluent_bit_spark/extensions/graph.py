"""Connected components over candidate-pair edge lists — the cluster
consolidation stage of near-duplicate dedup.

MinHash/SimHash candidate generation emits PAIRS; keeping one document per
transitive cluster (A~B, B~C => {A,B,C} keep one) needs connectivity, not
pairs. Two interchangeable algorithms compute the same min-reachable-id
fixpoint: large-star/small-star alternation (the default — edge-set
rewriting, O(log n) rounds, per-round work shrinks as components
star-ify) and frontier hash-min label propagation (O(component
diameter) rounds over a static edge table). Near-dup clusters have tiny
diameters (stars/cliques from banded LSH), so ~2 rounds settle real
corpora either way; `max_iter` bounds the worst case. Measured A/B at
1.5M edges in BASELINE.md: alternating α=0.14 vs labelprop α=0.26 over
a 30x scale-up.

Scale shape per round: node-keyed min-aggregates and joins only — no
driver-side state except a one-row convergence metric riding each
round's checkpoint job via observe(). At 100 TB the edge list is orders
of magnitude smaller than the corpus (only candidate pairs), so the
rounds run on the small derived table, never the raw docs.
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
    algorithm: str = "alternating",
    hops_per_round: int = 2,
) -> DataFrame:
    """Resolve an undirected edge list into (id, component) where
    ``component`` is the minimum node id reachable from ``id``. Nodes not
    present in ``pairs`` are absent (join back with coalesce(id) for the
    full assignment).

    ``algorithm``:
      * ``"alternating"`` (default) — large-star/small-star alternation
        (Kiveris et al., "Connected Components in MapReduce and Beyond",
        SoCC'14). Each round REWRITES the edge set toward a star forest,
        so (a) the per-round working set shrinks as components
        star-ify, and (b) round count is O(log n) in the worst case and
        ~2 on the small-diameter clique/star graphs banded LSH emits —
        label rounds shrink with component diameter instead of paying a
        full label-table join per hop.
      * ``"labelprop"`` — frontier hash-min label propagation
        (O(diameter) rounds over a static edge table); kept for A/B and
        for callers that want the bounded-hop semantics of
        ``hops_per_round``.
    Both converge to the identical min-reachable-id fixpoint.
    """
    if algorithm == "alternating":
        return _cc_alternating(pairs, src_col, dst_col, max_iter)
    if algorithm != "labelprop":
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    return _cc_labelprop(pairs, src_col, dst_col, max_iter, hops_per_round)


def _cc_alternating(
    pairs: DataFrame, src_col: str, dst_col: str, max_iter: int
) -> DataFrame:
    """Two-phase alternating connected components (SoCC'14).

    large-star: every node u attaches its strictly-LARGER neighbors to
    the minimum of its closed neighborhood m(u) = min({u} ∪ Γ(u)).
    small-star (on edges oriented big→small): every node u attaches its
    (all smaller) neighbors plus itself to m(u) = min Γ(u). Both phases
    preserve connectivity and never create cross-component edges; the
    composition converges to a star forest whose centers are the
    component minima.

    Per-phase cost: one min-aggregate keyed by u + one join keyed by u
    (same key — AQE reuses the exchange) + a distinct on the REWRITTEN
    (smaller each round) edge set. No collect_list: hub nodes cost a
    combinable min, not a materialized neighbor array. Convergence is
    detected from (edge count, order-independent edge-hash sum) riding
    the eager checkpoint's job via observe() — no extra probe job."""
    edges = (
        pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    par = pairs.sparkSession.sparkContext.defaultParallelism
    if edges.rdd.getNumPartitions() > 4 * par:
        edges = edges.coalesce(4 * par)
    edges = edges.localCheckpoint(eager=True)
    init = edges

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", "u").alias("m"))
        )
        # no distinct here: duplicate (v, m) rows (two neighbors of v
        # sharing a minimum) are absorbed by small-star's min-aggregate
        # and its final distinct — one less shuffle per round
        return (
            sym.where(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )

    def small_star(e: DataFrame) -> DataFrame:
        dirped = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = dirped.groupBy("u").agg(F.min("v").alias("m"))
        return (
            dirped.join(m, "u")
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                        F.struct(F.col("u").alias("u"), F.col("m").alias("v")),
                    )
                ).alias("s")
            )
            .select("s.u", "s.v")
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    prev = (None, None)
    for _ in range(max(1, max_iter)):
        stepped = small_star(large_star(edges))
        obs = Observation()
        edges = stepped.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            # decimal sum: long would ANSI-overflow on a few billion hashes
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).localCheckpoint(eager=True)
        cur = (obs.get["n"], obs.get["h"])
        if cur == prev:
            break
        prev = cur
    # converged: edges are (node -> component-min) star pointers. Root
    # nodes carry no pointer, so self-pointers for every ORIGINAL node
    # are unioned in before the min — which also keeps the labelprop
    # contract (one row per node in ``pairs``, minima mapping to
    # themselves) and guards the never-observed pre-max_iter cutoff.
    selfp = (
        init.select(F.col("u"))
        .unionAll(init.select(F.col("v").alias("u")))
        .select("u", F.col("u").alias("v"))
    )
    return (
        edges.unionAll(selfp)
        .groupBy(F.col("u").alias("id"))
        .agg(F.min("v").alias("component"))
    )


def _cc_labelprop(
    pairs: DataFrame,
    src_col: str,
    dst_col: str,
    max_iter: int,
    hops_per_round: int,
) -> DataFrame:
    """Frontier hash-min label propagation (see connected_components)."""
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
    clash = {"component", "is_representative"} & set(df.columns)
    if clash:
        # a df already carrying the output columns (e.g. the result of
        # a previous dedup_clusters pass) would either raise
        # AMBIGUOUS_REFERENCE mid-plan or emit duplicate column names —
        # fail here with the fix instead (the gopher_quality guard)
        raise ValueError(
            f"input columns collide with dedup_clusters outputs: "
            f"{sorted(clash)}; drop or rename them first"
        )
    comp = connected_components(pairs, src_col, dst_col, max_iter)
    # resolve through comp[...] explicitly: a df with its own 'id'
    # column would make the bare-name reference ambiguous
    return (
        df.join(comp, df[id_col] == comp["id"], "left")
        .select(
            df["*"],
            F.coalesce(comp["component"], df[id_col]).alias("component"),
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
    # pin the shared tables once (the _cc_alternating/triangle_count
    # discipline): e feeds every iteration's join AND outdeg, nodes
    # feeds the count and the rank init — un-pinned, each checkpoint/
    # final materialization replays the source scan + distinct per
    # accumulated consumer
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("empty edge list")
    # out-degree is ITERATION-INVARIANT: attach it to the edge list once
    # — the former shape re-ran the e-outdeg join inside every one of the
    # ``iterations`` per-round plans. (An explicit pre-repartition by the
    # join keys was tried and reverted: it costs two real exchanges up
    # front while AQE's runtime join planning rarely gets to reuse the
    # checkpointed partitioning — measured ~1.4x slower on the bench
    # graph.)
    ew = (
        e.join(e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")), "src")
        .localCheckpoint(eager=True)
    )
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(int(iterations)):
        contrib = (
            ew.join(ranks, ew["src"] == ranks["node"])
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


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph — the
    clustering signal crawl/spam pipelines use (link farms are
    triangle-dense; legitimate hub pages are star-shaped and
    triangle-sparse).

    Spark-first shape (the classic MapReduce formulation — Suri &
    Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW'11): orient every edge from the lower-(degree, id)
    endpoint to the higher, so each triangle is counted exactly once at
    its lowest-degree corner and the wedge join's fan-out per node is
    bounded by ORIENTED out-degree — O(sqrt(m)) even for celebrity
    nodes, which is what kills the naive neighbor-join at scale. Plan:
    one degree aggregate, two joins keyed by node to attach (deg, id)
    ranks, a self-join of the oriented edge list on its source (wedge
    generation), and a semi-join of wedges against oriented edges
    (closure test). Returns (node, triangles) for every node of the
    graph, zero included — so the output domain is the node set, not
    the triangle set.

    Self-loops are dropped; duplicate/reverse edges collapse via the
    canonical (min, max) form.
    """
    e = (
        edges.select(
            F.least(src_col, dst_col).alias("a"),
            F.greatest(src_col, dst_col).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        # the canonical edge list feeds five consumers (degree, both
        # orientation joins, wedge closure, node domain); like the CC
        # edge table it is derived and small relative to the corpus, so
        # one eager materialization beats five recomputes of the scan
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient lower (deg, id) -> higher (deg, id)
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
        # three consumers (both wedge sides + closure); same size as e
        .localCheckpoint(eager=True)
    )
    # wedges at u: (v, w) both out-neighbors of u; closure iff v-w oriented
    o1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    o2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = o1.join(o2, "u").where(F.col("x") < F.col("y"))
    closing = oriented.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"], "inner").select("u", "x", "y")
    per_node = (
        tri.select(F.explode(F.array("u", "x", "y")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.select("n")
        .join(per_node, "n", "left")
        .select(
            F.col("n").alias("node"),
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
        )
    )
