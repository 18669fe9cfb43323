"""Iterative DataFrame algorithms: connected components for dedup
clustering.

Near-dup detection (exact/Jaccard/MinHash/embedding) yields PAIRS; the
pipeline-usable artifact is CLUSTERS (each doc -> canonical id, so one
representative survives). Connected components via iterative min-label
propagation: each node adopts the smallest label among itself and its
neighbors until fixpoint. O(diameter) joins — near-dup graphs have
tiny diameters (dup groups are near-cliques), so 2-4 iterations
typically converge; every iteration is one shuffle on node id.

This is the alternating-large-star/small-star family simplified to
label propagation — iterative algorithms on DataFrames, no GraphX
dependency (GraphX is Scala-only and RDD-based)."""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Returns (id, component) where component = min node id reachable.
    Nodes appearing only as isolated points must be unioned by the
    caller if they need rows."""
    # materialize the raw edge list BEFORE the symmetrizing union: its
    # two branches prune different columns, so without this the (often
    # expensive) upstream edge-building subtree is evaluated twice in
    # the same action — and the old lazy persist of `sym` additionally
    # let the label seed and the first iteration race to fill the
    # cache (r6 opt, same fix as pagerank)
    e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(eager=True)
    sym = e0.unionByName(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.filter(F.col("a") != F.col("b")).distinct()
    sym = sym.persist()
    sym.count()
    labels = sym.select(F.col("a").alias("id")).distinct().withColumn("component", F.col("id"))
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym.b == labels.id)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("neigh_min"))
        )
        updated = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("neigh_min"), F.col("component"))).alias(
                    "component"
                ),
            )
        )
        # fixpoint check: any label still shrinking?
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "id")
            .filter(F.col("u.component") != F.col("l.component"))
            .limit(1)
            .count()
        )
        # materialize the new labels to cut lineage growth across
        # iterations (each loop otherwise doubles the plan depth)
        labels = updated.localCheckpoint(eager=True)
        if changed == 0:
            break
    return labels


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Every doc -> (id, cluster_id, is_canonical): connected components
    over the near-dup pair graph; docs without any pair are their own
    cluster. Downstream keeps `is_canonical` rows only."""
    comps = connected_components(pairs, src, dst)
    all_ids = df.select(F.col(id_col).alias("id"))
    labeled = all_ids.join(comps, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce(F.col("component"), F.col("id")).alias("cluster_id"),
    )
    return labeled.withColumn("is_canonical", (F.col(id_col) == F.col("cluster_id")).cast("boolean"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iterations: int = 3,
    scale: int = 1_000_000,
    damping_permille: int = 850,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Weighted PageRank with a FIXED iteration count and pure integer
    arithmetic, so two engines replaying the same recurrence agree
    bit-for-bit (no IEEE accumulation order to disagree on).

    Recurrence (all integer, scaled by ``scale``):
        contrib(e) = (r[src] * w[e]) DIV out_weight[src]
        r'[n]      = base + (damping_permille * sum(contrib into n)) DIV 1000
    with ``base = scale*(1000-damping_permille) DIV 1000``. Dangling
    mass is dropped (same on both engines).

    Scale shape: each iteration is one join of the rank vector against
    the edge list plus one aggregation — O(iterations) shuffles, the
    standard DataFrame PageRank layout. Lineage is cut with
    ``localCheckpoint`` every ``checkpoint_every`` rounds (same trick
    as connected_components) — NOT every round: an eager checkpoint is
    a full Spark job, and for small iteration counts one lazily-fused
    job beats per-round materialization by the per-job floor. The final
    result is always checkpointed so the persisted inputs can be
    released. Returns (node, rank_scaled).
    """
    base = scale * (1000 - damping_permille) // 1000
    # materialize the EDGE LIST itself before fanning out: outw, the
    # per-edge join and the node union all re-reference `edges`, and
    # persisting only the derived frames still evaluated the (often
    # expensive) upstream edge-building subtree once per derived cache
    # fill — the nodes union alone re-ran it twice, its two branches
    # pruning different columns so ReusedExchange never fired; a LAZY
    # persist is not enough either (concurrent consumer stages race to
    # fill it, each computing its own copy). The eager localCheckpoint
    # runs the build exactly once and truncates the iteration plans'
    # lineage (r6 opt).
    edges = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), F.col(weight).alias("__w")
    ).localCheckpoint(eager=True)
    outw = edges.groupBy("__src").agg(F.sum("__w").alias("__ow"))
    # the edge list and node set are re-read every iteration (each
    # localCheckpoint is an action): persist them once or the upstream
    # edge-building joins re-execute O(iterations) times
    e = edges.join(outw, "__src").persist()
    nodes = (
        edges.select(F.col("__src").alias("node"))
        .unionByName(edges.select(F.col("__dst").alias("node")))
        .distinct()
        .persist()
    )
    ranks = nodes.withColumn("r", F.lit(scale).cast("long"))
    for i in range(iterations):
        contrib = e.join(ranks, e["__src"] == ranks["node"]).select(
            F.col("__dst").alias("node"),
            F.expr("(r * __w) DIV __ow").alias("__c"),
        )
        agg = contrib.groupBy("node").agg(F.sum("__c").alias("__agg"))
        ranks = (
            nodes.join(agg, "node", "left")
            .select(
                "node",
                F.coalesce("__agg", F.lit(0)).alias("__agg"),
            )
            .select(
                "node",
                F.expr(f"CAST({base} + ({damping_permille} * __agg) DIV 1000 AS BIGINT)").alias("r"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    # final ranks are checkpoint-materialized, so the inputs can be
    # released immediately
    e.unpersist()
    nodes.unpersist()
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def tree_paths(
    nodes: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    rounds: int = 6,
) -> DataFrame:
    """Resolve every node of a forest to its (root, depth) by pointer
    jumping: each round every node's ancestor pointer jumps to its
    ancestor's ancestor while accumulating the jumped distance, so
    after k rounds pointers span 2^k edges — O(log depth) self-joins
    instead of O(depth) sequential ones (the recursive-CTE shape).
    ``parent_col`` null marks a root. ``rounds`` must satisfy
    2^rounds >= max tree depth; each round is one equi-join shuffle on
    node id, and a root's self-edge contributes distance 0, so the
    recursion is a no-op at fixpoint (extra rounds are harmless).
    Returns (node, root, depth)."""
    state = nodes.select(
        F.col(node_col).alias("node"),
        F.coalesce(F.col(parent_col), F.col(node_col)).alias("anc"),
        F.when(F.col(parent_col).isNull(), 0).otherwise(1).cast("long").alias("depth"),
    )
    for i in range(rounds):
        hop = state.select(
            F.col("node").alias("__jn"),
            F.col("anc").alias("__ja"),
            F.col("depth").alias("__jd"),
        )
        state = state.join(hop, state["anc"] == hop["__jn"]).select(
            "node",
            F.col("__ja").alias("anc"),
            (F.col("depth") + F.col("__jd")).cast("long").alias("depth"),
        )
        if (i + 1) % 3 == 0:
            state = state.localCheckpoint(eager=True)
    return state.select("node", F.col("anc").alias("root"), "depth")
