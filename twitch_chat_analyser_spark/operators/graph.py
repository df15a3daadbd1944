"""Connected components over similarity-pair edges: the step that turns
pairwise near-duplicate findings (minhash/simhash/embedding pairs) into
dedup CLUSTERS with one canonical survivor each — what a training-data
pipeline actually needs (keep one doc per duplicate group, not one per
pair).

Algorithm: alternating large-star / small-star label propagation
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) expressed purely in DataFrame ops — each iteration is a
groupBy/min + join, both shuffle-partitioned on the node key, and the
iteration count is O(log^2 n) on pathological chains, O(log n)
typically. Each round's result is checkpointed via localCheckpoint to
cut the growing lineage (iterative-algorithm hygiene on Spark; same
pattern as similarity.kmeans_centroids).

At 100 TB the edge set (near-dup pairs) is orders of magnitude smaller
than the corpus — components run on pairs only; membership joins back
to the corpus with a broadcast when components fit, hash join otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERATIONS = 20

# Below this many (symmetric, deduped) edges the component structure is
# solved on the driver with union-find instead of iterating distributed
# rounds — the same adaptive small-side escape hatch as Spark's
# broadcast-join threshold. Rationale: each distributed round costs 2+
# jobs of fixed scheduler/shuffle overhead (~1 s/round at local scale);
# union-find on <=1M edges is O(E α(E)) ≈ milliseconds and produces the
# IDENTICAL min-label result (pinned by a pytest equality check of both
# paths). At 100 TB the near-dup edge set of a pathological corpus can
# exceed this — the distributed label-propagation path below remains the
# scale path and the test suite always exercises it.
SMALL_GRAPH_EDGES = 1_000_000


def _driver_union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find with path compression; returns node -> min-id-of-component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def connected_components(
    edges: DataFrame,
    max_iter: int = MAX_ITERATIONS,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """Minimum-label connected components on an undirected edge list
    ``(src, dst)``. Converges when labels stop changing (checked with a
    cheap aggregate per round, driver-side loop — the standard Spark
    iterative-algorithm shape). Edge sets under ``small_graph_edges``
    short-circuit to driver-side union-find (see SMALL_GRAPH_EDGES).

    -> node, component (the minimum node id in the component)
    """
    # label(node) = min neighbor-or-self, iterated to fixpoint with
    # pointer jumping (path halving) so rounds are O(log diameter),
    # not O(diameter).
    # Materialize the RAW edge list first: the symmetrizing union below
    # references `edges` in BOTH branches, so an un-materialized upstream
    # lineage (e.g. the minhash pair computation) would execute twice.
    # Then materialize the symmetric list too — every iteration (and
    # every convergence check) joins against it.
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # right-size the per-round shuffles: component iterations run on the
    # EDGE set (pairs), which is far smaller than the corpus — at test
    # scale 32-way shuffles are pure overhead per round, at scale the
    # cap keeps full width
    spark = edges.sparkSession
    n_edges = sym.count()
    if n_edges <= small_graph_edges:
        labels = _driver_union_find(
            [(r["a"], r["b"]) for r in sym.collect()]
        )
        return spark.createDataFrame(
            sorted(labels.items()), "node long, component long"
        )
    default_parts = int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    n_parts = max(1, min(default_parts, n_edges // 20_000 + 1))

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .repartition(n_parts, "node")
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # propagate: each node takes min(own label, neighbors' labels)
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"), "component")
        )
        propagated = (
            labels.union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # pointer jump: follow the label one hop (component := label of
        # the component node) — halves remaining path length each round
        hop = propagated.select(
            F.col("node").alias("component"),
            F.col("component").alias("jumped"),
        )
        new_labels = (
            propagated.join(hop, "component", "left")
            .select(
                "node",
                F.least(
                    "component", F.coalesce("jumped", "component")
                ).alias("component"),
            )
            .repartition(n_parts, "node")
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Compose near-dup pairs into dedup clusters: every document joined
    to its component (singletons keep their own id), with the canonical
    survivor = the minimum doc_id of the cluster.

    -> doc_id, cluster_id, is_survivor
    """
    comp = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    return (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster_id"),
        )
        .withColumn("is_survivor", F.col("doc_id") == F.col("cluster_id"))
    )


# --------------------------------------------------------------------------
# registry entry: minhash pairs -> clusters over documents (rows-only:
# the iterative fixpoint isn't single-statement SQL; correctness is
# pinned by pytest goldens and the oracle-checked pair input)
# --------------------------------------------------------------------------


def _q_dedup_clusters(spark, sf_dir):
    from .. import ingest
    from . import dedup, llmops

    docs = ingest.load(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(
        docs, llmops.NUM_HASHES, llmops.SHINGLE_K,
        llmops.MINHASH_JACCARD_THRESHOLD,
    )
    return dedup_clusters(docs, pairs).filter(~F.col("is_survivor"))




def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)`` — fixed
    iteration count, simplified handling of dangling nodes (their mass
    is not redistributed; ranks still sum below 1 but the ORDER — what
    ranking consumers use — is the standard one).

    Each round is one join (ranks ⋈ edges on src, both hash-partitioned
    on the same key) + one groupBy(dst) — the same per-iteration shuffle
    budget as :func:`connected_components`; lineage cut per round via
    localCheckpoint. Rows-only verification (iterative float fixpoint is
    not single-statement SQL); a pytest pins a hand-computed graph.

    -> node, rank
    """
    edges = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # contribution edges with the degree folded in — constant per round
    contrib_edges = edges.join(out_deg, "src").localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            contrib_edges.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("in_mass"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def _q_channel_pagerank(spark, sf_dir):
    """PageRank of the channel co-occurrence graph (symmetric edges from
    shared audiences) — which channels sit at the center of the shared-
    audience network. Rows-only (iterative)."""
    from .. import ingest
    from . import analytics

    pairs = analytics.channel_cooccurrence(ingest.messages(spark, sf_dir))
    sym = pairs.select(
        F.col("channel_a").alias("src"), F.col("channel_b").alias("dst")
    ).union(
        pairs.select(
            F.col("channel_b").alias("src"), F.col("channel_a").alias("dst")
        )
    )
    return pagerank(sym).orderBy(F.desc("rank"), "node")


GRAPH_QUERIES = {
    "dedup_connected_clusters": _q_dedup_clusters,
    "channel_pagerank": _q_channel_pagerank,
}
