"""Similarity search over embedding columns (SURVEY.md §7.5).

``embeddings`` table: (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT).

Cosine similarity is computed with built-in higher-order functions
(``zip_with`` + ``aggregate``) — a sequential left fold in double
precision, bit-identical to the DuckDB oracle's ``list_dot_product``
(verified), so even float outputs hash-match without rounding.

Scale notes (100 TB):
- brute-force top-k is O(Q x N) with a broadcast of the query set —
  the candidate side never shuffles for the scoring. The top-k cut is
  a window partitioned by query_id, whose partitions are CORPUS-sized
  (one reducer sorts N scored rows per query — spillable but serial);
  the brute-force family pre-cuts per (query, hash-shard) partition
  first (review r12), which bounds every sort at N/shards and keeps
  the result exactly equal (the global top-k is a subset of the union
  of per-shard top-k under the total (score, neighbor_id) order).
  Since r13 the pre-cut is SIZE-TRIGGERED by default (``shards="auto"``
  reads the corpus relation's Catalyst size estimate — see
  ``_auto_shards``): small corpora plan exactly as before, corpora past
  the threshold get the two-stage rank without any caller opting in.
- the IVF variant is the scale path: a coarse quantizer (centroid
  assignment, broadcast centroids) partitions the corpus; queries probe
  only their cluster — O(Q x N/C) with data pre-partitioned by
  ``centroid_id``, so a real deployment bucket-partitions the corpus
  table by centroid and the probe is a partition-pruned scan.
- ``ann_topk_blas`` demonstrates the vectorized kernel: Arrow-batched
  ``mapInPandas`` with a numpy matmul against the broadcast query
  matrix — the pattern for GPU/BLAS offload; same results, checked
  against the declarative plan in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Sequential left-fold dot product. Measured AGAINST the "obvious"
# optimization of unrolling to a flat `0D + a[0]*b[0] + ...` chain for
# the known 64-dim width: on the 2M-pair loop the unrolled form is ~3x
# SLOWER (4.8s vs 1.5s at sf0.1) — the 191-node expression tree falls
# out of whole-stage codegen and is evaluated interpreted with a virtual
# call + null-check per element access, while the higher-order-function
# fold runs a primitive-specialized loop over the two UnsafeArrayData
# buffers. Keep the fold; it is also the form whose summation order is
# bit-identical to DuckDB's list_dot_product (oracle hash parity).
DOT_EXPR = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"


def as_double_vec(df: DataFrame, out: str = "v") -> DataFrame:
    """Cast ARRAY<FLOAT> -> ARRAY<DOUBLE> once up front (exact widening)
    and precompute the vector norm ONCE per vector — pairwise scoring
    then needs a single fold per pair instead of three (3x fewer flops
    in the O(N^2)/O(QxN) hot loops)."""
    base = df.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> cast(x AS double))").alias(out),
    )
    return base.withColumn(
        f"{out}_nrm", F.sqrt(F.expr(DOT_EXPR.format(a=out, b=out)))
    )


def cosine(a: str, b: str, a_nrm: str | None = None, b_nrm: str | None = None):
    """cos(a,b) = dot / (|a| * |b|) with precomputed norms; the division
    structure matches the DuckDB oracle expression exactly, so results
    are bit-identical."""
    a_nrm = a_nrm or f"{a}_nrm"
    b_nrm = b_nrm or f"{b}_nrm"
    return F.expr(DOT_EXPR.format(a=a, b=b)) / (F.col(a_nrm) * F.col(b_nrm))


def _shard_precut(
    scored: DataFrame, order: list, k: int, shards: int | None
) -> DataFrame:
    """Optional two-stage top-k pre-cut (review r12): rank each scored
    row within its (query_id, hash(neighbor_id) % shards) cell and keep
    only rank <= k before the per-query window runs. EXACT under the
    callers' total (score, neighbor_id) orders — every global top-k row
    is also in its own shard's top-k — but the big sort becomes
    ``shards`` independent N/shards sorts and the final per-query
    window sees at most ``shards * k`` rows. ``None`` (default) skips
    the extra exchange: right for corpora where one reducer can sort N
    scored rows; set it when a single query's partition outgrows a
    task."""
    if not shards:
        return scored
    sw = Window.partitionBy(
        "query_id", F.pmod(F.hash("neighbor_id"), F.lit(shards))
    ).orderBy(*order)
    return (
        scored.withColumn("_sr", F.row_number().over(sw))
        .filter(F.col("_sr") <= k)
        .drop("_sr")
    )


# Auto-trigger for the shard pre-cut (r13, VERDICT r12 item 3: the r12
# fix was opt-in only — nothing switched it on when the corpus grew, so
# the corpus-wide single-reducer sort the review flagged returned
# silently at scale). shards="auto" (now the default) derives the shard
# count from the CORPUS relation's Catalyst size estimate: below
# SHARD_AUTO_THRESHOLD_BYTES one reducer comfortably sorts the scored
# rows and the pre-cut's extra exchange is pure overhead (None-
# equivalent — keeps every small-corpus plan and bench number
# unchanged); above it, one shard per SHARD_AUTO_TARGET_BYTES of corpus
# bounds each pre-cut sort cell. The corpus side's estimate tracks the
# parquet scan size (measured accurate at sf0.1: ~1.2 MB for the 2k
# embeddings); the cross-joined scored relation's estimate is useless
# (size-product, measured 648 GB for 10k real rows), which is why the
# trigger reads the corpus frame, not the scored frame. Production
# values: 256 MB ~= a few million scored rows per query — past the
# point where a single rank-window task is comfortable; the cap only
# bounds degenerate estimates.
SHARD_AUTO_THRESHOLD_BYTES = 256 * 1024**2
SHARD_AUTO_TARGET_BYTES = 128 * 1024**2
SHARD_AUTO_MAX = 4096


def _auto_shards(corpus: DataFrame) -> int | None:
    est = int(
        str(
            corpus._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    )
    # Catalyst reports ~Long.MaxValue-scale sentinels when a relation's
    # size is UNKNOWN (e.g. session-local Arrow data). Unknown is not
    # "huge": fall back to the unsharded plan rather than bolting two
    # extra exchanges onto a corpus nobody measured. Parquet-backed
    # corpora (every production path) always carry a real scan estimate.
    if est <= SHARD_AUTO_THRESHOLD_BYTES or est >= 1 << 60:
        return None
    return min(SHARD_AUTO_MAX, max(2, est // SHARD_AUTO_TARGET_BYTES))


def _resolve_shards(shards, corpus: DataFrame) -> int | None:
    return _auto_shards(corpus) if isinstance(shards, str) else shards


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    shards: int | None | str = "auto",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self excluded).

    ``shards`` bounds the top-k sort at N/shards rows per task (see
    :func:`_shard_precut`) — same exact result, no corpus-sized window
    partition. Default ``"auto"`` derives it from the corpus size
    estimate (:func:`_auto_shards`): small corpora plan exactly as
    ``None``, large ones get the two-stage rank without opt-in.

    -> query_id, neighbor_id, cos_sim, rank
    """
    vecs = as_double_vec(embeddings)
    shards = _resolve_shards(shards, vecs)
    queries = vecs.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q"),
        F.col("v_nrm").alias("q_nrm"),
    )
    scored = (
        vecs.select(F.col("vec_id").alias("neighbor_id"), "v", "v_nrm")
        .crossJoin(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine("q", "v").alias("cos_sim"))
    )
    order = [F.desc("cos_sim"), F.asc("neighbor_id")]
    scored = _shard_precut(scored, order, k, shards)
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def _centroid_entries(centroids: DataFrame) -> DataFrame:
    """Collapse the (small) codebook into ONE row holding the
    id-sorted entry array — the broadcast unit of the map-side argmax
    (``array_sort`` on the struct orders by its first field,
    ``centroid_id``, which is what makes the fold's first-wins
    tie-break equal ``min centroid_id``)."""
    return centroids.agg(
        F.array_sort(
            F.collect_list(F.struct("centroid_id", "c", "c_nrm"))
        ).alias("_cents")
    )


def _centroid_argmax(v: str = "v", v_nrm: str = "v_nrm"):
    """Nearest-centroid argmax evaluated per ROW over the broadcast
    ``_cents`` array: score each centroid with the exact cosine
    expression the old aggregate form used (dot fold / norm product —
    bit-identical doubles), then left-fold to the maximum. The fold
    replaces only on STRICT cos-greater — Spark's ``>`` on doubles is
    the same NaN-largest total order ``max_by``'s struct comparison
    uses — so equal-cos ties keep the earliest entry, i.e. the
    smallest ``centroid_id``: exactly ``max_by(struct(cos_c,
    -centroid_id))``. Returns struct<cos double, cid bigint>.

    Why (r13, guide §1.2/§7.2): the aggregate form planned
    crossJoin(broadcast) -> max_by whose buffer carries the ``v``
    ARRAY — not hash-aggregable, so Catalyst fell back to
    SortAggregate: a full sort of the N x C exploded stream per
    assignment pass (8 SortAggregates in the semdedup plan, 2 per
    Lloyd's iteration). This form is a Project: zero aggregate, zero
    sort, zero exploded stream, and v/v_nrm ride along untouched
    instead of traveling through an aggregation buffer."""
    dot = DOT_EXPR.format(a=v, b="e.c")
    return F.expr(
        "aggregate("
        f"transform(_cents, e -> named_struct("
        f"'cos', {dot} / ({v_nrm} * e.c_nrm), 'cid', e.centroid_id)), "
        "named_struct('cos', CAST('-Infinity' AS DOUBLE), "
        "'cid', CAST(-1 AS BIGINT)), "
        "(best, s) -> IF(s.cos > best.cos, s, best))"
    )


def _assign_to_centroids(
    vecs: DataFrame, centroids: DataFrame, cos_col: str | None = None
) -> DataFrame:
    """Nearest-centroid assignment shared by the IVF family: broadcast
    the (small, never-empty) codebook as one id-sorted array row and
    take the per-row fold argmax (:func:`_centroid_argmax`) — a
    map-only Project, no aggregation. Tie-break: max cos, then min
    centroid_id (must stay in lockstep with the oracles).
    ``cos_col`` optionally emits the winner's cosine — the fold
    already computed it, so callers that need prototypicality
    (``prototype_prune``) skip a re-join + re-score.

    -> vec_id, v, v_nrm, centroid_id[, <cos_col>]
    """
    out = (
        vecs.crossJoin(F.broadcast(_centroid_entries(centroids)))
        # empty codebook -> zero rows, matching the pre-r13 crossJoin
        # form (the agg's single empty-array row would otherwise leak
        # the fold seed: every vector assigned centroid_id=-1)
        .filter(F.size("_cents") > 0)
        .select("vec_id", "v", "v_nrm", _centroid_argmax().alias("_best"))
    )
    cols = ["vec_id", "v", "v_nrm", F.col("_best.cid").alias("centroid_id")]
    if cos_col is not None:
        cols.append(F.col("_best.cos").alias(cos_col))
    return out.select(*cols)


def _exact_rerank(
    cands: DataFrame, vecs: DataFrame, queries: DataFrame, k: int
) -> DataFrame:
    """Full-precision re-rank of an approximate candidate set
    (query_id, neighbor_id): fetch the original vectors by id, score
    exact cosine, keep top-k per query. Ordering (cos desc,
    neighbor_id) must stay in lockstep with the oracles.

    -> query_id, neighbor_id, cos_sim, rank
    """
    rescored = (
        cands.join(
            vecs.select(F.col("vec_id").alias("neighbor_id"), "v", "v_nrm"),
            "neighbor_id",
        )
        .join(F.broadcast(queries.select("query_id", "q", "q_nrm")), "query_id")
        .select("query_id", "neighbor_id", cosine("q", "v").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def _expand_rerank(
    approx: DataFrame,
    vecs: DataFrame,
    queries: DataFrame,
    k: int,
    expand: int,
    shards: int | None = None,
) -> DataFrame:
    """Shared tail of every quantized-ANN path: cut the approximate
    scores to ``expand * k`` candidates per query (a_sim desc, NULLs —
    undefined directions — last, neighbor_id tie-break) and re-rank
    them at full precision. One copy so the candidate-selection
    contract can't drift between the SQ/PQ/IVF variants. ``shards``
    pre-cuts the approximate scores per hash-shard first (see
    :func:`_shard_precut`) — exact same candidate set, no corpus-sized
    window partition on the full-scan variants."""
    order = [F.desc_nulls_last("a_sim"), F.asc("neighbor_id")]
    approx = _shard_precut(approx, order, expand * k, shards)
    w = Window.partitionBy("query_id").orderBy(*order)
    cands = (
        approx.withColumn("rr", F.row_number().over(w))
        .filter(F.col("rr") <= expand * k)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(cands, vecs, queries, k)


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    num_centroids: int = 8,
    k: int = 3,
    centroids: DataFrame | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: a coarse codebook (by default the first
    ``num_centroids`` vectors — deterministic, oracle-friendly; pass
    ``centroids=kmeans_centroids(...)`` for a trained codebook); every
    vector is assigned to its nearest centroid; a query probes only its
    own centroid's inverted list.

    A caller that already holds the coarse assignment (the recall eval
    probes several IVF variants over the SAME cells) can pass it as
    ``assigned`` (vec_id, v, v_nrm, centroid_id) to skip recomputing
    the corpus-wide argmax.

    -> query_id, neighbor_id, cos_sim, rank
    """
    if assigned is None:
        vecs = as_double_vec(embeddings)
        if centroids is None:
            centroids = vecs.filter(F.col("vec_id") < num_centroids).select(
                F.col("vec_id").alias("centroid_id"),
                F.col("v").alias("c"),
                F.col("v_nrm").alias("c_nrm"),
            )
        elif "c_nrm" not in centroids.columns:
            centroids = centroids.withColumn(
                "c_nrm", F.sqrt(F.expr(DOT_EXPR.format(a="c", b="c")))
            )
        assigned = _assign_to_centroids(vecs, centroids)
    queries = assigned.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q"),
        F.col("v_nrm").alias("q_nrm"),
        "centroid_id",
    )
    scored = (
        assigned.select(
            F.col("vec_id").alias("neighbor_id"), "v", "v_nrm", "centroid_id"
        )
        .join(F.broadcast(queries), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine("q", "v").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    num_planes: int = 8,
    k: int = 3,
) -> DataFrame:
    """LSH-bucketed ANN — the random-hyperplane (sign-bit) family: each
    vector's bucket is the ``num_planes``-bit signature of the signs of
    its dot products with a fixed set of hyperplanes; a query probes
    only its own bucket, where exact cosine re-ranks.

    Hyperplanes are the first ``num_planes`` corpus vectors
    (deterministic, oracle-expressible — a production deployment would
    use seeded Gaussian planes; the plan shape is identical).

    Scale notes (100 TB): the signature is a broadcast nested-loop over
    P tiny planes (N x P intermediate, collapsed by a groupBy on vec_id
    before anything wide moves), and the probe is an equi-join on
    ``bucket`` — a shuffled hash join that partitions the corpus into
    2^P cells, the same linear-scaling shape as :func:`ivf_topk`. The
    corpus table would be bucket-partitioned on disk so a probe is a
    partition-pruned scan.

    -> query_id, neighbor_id, cos_sim, rank
    """
    vecs = as_double_vec(embeddings)
    planes = vecs.filter(F.col("vec_id") < num_planes).select(
        F.col("vec_id").alias("plane_id"), F.col("v").alias("p")
    )
    bits = vecs.select("vec_id", "v").crossJoin(F.broadcast(planes)).select(
        "vec_id",
        F.when(
            F.expr(DOT_EXPR.format(a="v", b="p")) > 0,
            F.expr("shiftleft(1L, cast(plane_id AS int))"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("bit"),
    )
    buckets = bits.groupBy("vec_id").agg(F.sum("bit").alias("bucket"))
    assigned = vecs.join(buckets, "vec_id")
    queries = assigned.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q"),
        F.col("v_nrm").alias("q_nrm"),
        "bucket",
    )
    scored = (
        assigned.select(
            F.col("vec_id").alias("neighbor_id"), "v", "v_nrm", "bucket"
        )
        .join(F.broadcast(queries), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine("q", "v").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hyperplane_band_buckets(
    vecs: DataFrame, num_planes: int = 16, band_bits: int = 8
) -> DataFrame:
    """Sign-bit LSH band signatures: plane ``i`` is corpus vector ``i``
    (deterministic, oracle-expressible; production would use seeded
    Gaussian planes — identical plan shape); bit ``i`` is
    ``dot(v, plane_i) > 0``; bits are grouped into bands of
    ``band_bits`` bits each. Vectors agreeing on ANY full band are
    near-dup candidates.

    ``vecs`` must be the :func:`as_double_vec` projection. r14 shape
    (guide §2.4, the centroid-fold pattern): the P planes collapse into
    ONE broadcast array row and every vector's band signatures are a
    map-side fold over it — the N x P crossJoin stream and the
    ``groupBy(vec_id, band)`` exchange (a full-corpus shuffle) are gone;
    banding is a pure Project + posexplode of the per-vector band
    array. The per-plane dot folds and the integer bit sums are
    expression-identical, so signatures are bit-identical, including
    with sparse/short plane sets (band/bit positions come from the
    plane's own id, not its array position). Each band splits the
    corpus into ``2^band_bits`` buckets; at 100 TB raise ``band_bits``
    (e.g. 64 planes in 16-bit bands) so bucket sizes stay bounded.

    -> vec_id, band, sig
    """
    planes = vecs.filter(F.col("vec_id") < num_planes).select(
        F.col("vec_id").alias("plane_id"), F.col("v").alias("p")
    )
    prow = planes.agg(
        F.expr("array_sort(collect_list(struct(plane_id, p)))").alias("_ps")
    )
    dot_sp = DOT_EXPR.format(a="v", b="s.p")
    # per-plane (band, bit-value) structs, dot evaluated once per plane
    pbs = (
        f"transform(_ps, s -> struct("
        f"cast(s.plane_id / {band_bits} AS int) AS band, "
        f"IF({dot_sp} > 0, "
        f"shiftleft(1L, cast(s.plane_id AS int) % {band_bits}), 0L) AS bv))"
    )
    # one (band, sig) struct per DISTINCT band present among the planes
    # — exactly the rows the old groupBy(vec_id, band) emitted
    sig_arr = (
        "transform(array_distinct(transform(_pbs, x -> x.band)), bd -> "
        "struct(bd AS band, aggregate(filter(_pbs, x -> x.band = bd), 0L, "
        "(acc2, x) -> acc2 + x.bv) AS sig))"
    )
    return (
        vecs.select("vec_id", "v")
        .crossJoin(F.broadcast(prow))
        .withColumn("_pbs", F.expr(pbs))
        .select("vec_id", F.expr(f"inline({sig_arr})"))
    )


def embedding_dedup_pairs(
    embeddings: DataFrame,
    top_n: int = 20,
    num_planes: int = 16,
    band_bits: int = 8,
    block_cap: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup: most-similar candidate pairs, with
    candidates from the sign-bit hyperplane band join
    (:func:`hyperplane_band_buckets`) and exact cosine re-ranking —
    the embedding analog of MinHash candidate + verify. The band join
    is an equi-join on ``(band, sig)``; no all-pairs product anywhere.
    Candidate generation is part of the operator contract (the DuckDB
    oracle mirrors the same banding).

    RECALL: a pair is a candidate only if it agrees on ALL bits of at
    least one band; with per-plane agreement ``p = 1 - theta/pi``
    (random-hyperplane LSH) that is ``1 - (1 - p^band_bits)^n_bands`` —
    near-parallel vectors (p -> 1) are caught with high probability,
    but a similar-yet-not-near-duplicate pair can miss every band: the
    "most similar" ranking is over candidates, not all pairs. More
    planes in more bands push recall up at bounded bucket sizes.

    BLOCK-OCCUPANCY BOUND (``block_cap``, review r12 — the same opt-in
    knob :func:`knn_graph` / :func:`semdedup_pairs` /
    ``dedup.simhash_pairs_from_signatures`` already carry; this was the
    one banded pair generator without it): an R-occupancy ``(band,
    sig)`` bucket emits R^2/2 pairs, and a mass-duplicated corpus puts
    every copy in the SAME bucket no matter how many planes are added
    — re-banding cannot split identical vectors. With the cap, only
    the ``block_cap`` lowest-``vec_id`` members are eligible as the
    ``vec_a`` (smaller-id) side, so the bucket emits at most
    ``block_cap * R`` pairs; every duplicate still pairs with a pivot,
    so dedup connectivity survives. ``None`` (default, the oracle's
    contract) is the exact banded result.

    -> vec_a, vec_b, cos_sim
    """
    vecs = as_double_vec(embeddings)
    bands = hyperplane_band_buckets(vecs, num_planes, band_bits)
    a_side = bands.select(F.col("vec_id").alias("vec_a"), "band", "sig")
    if block_cap is not None:
        pw = Window.partitionBy("band", "sig").orderBy("vec_id")
        a_side = (
            bands.withColumn("prank", F.row_number().over(pw))
            .filter(F.col("prank") <= block_cap)
            .select(F.col("vec_id").alias("vec_a"), "band", "sig")
        )
    cands = (
        a_side.join(
            bands.select(F.col("vec_id").alias("vec_b"), "band", "sig"),
            ["band", "sig"],
        )
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    a = vecs.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("v_nrm").alias("va_nrm"),
    )
    b = vecs.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("v_nrm").alias("vb_nrm"),
    )
    return (
        cands.join(a, "vec_a")
        .join(b, "vec_b")
        .select("vec_a", "vec_b", cosine("va", "vb").alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_a", "vec_b")
        .limit(top_n)
    )


def embedding_signbits(embeddings: DataFrame, bits: int = 64) -> DataFrame:
    """Binarize embeddings to a ``bits``-wide sign signature packed into
    ONE long: bit i set when component i > 0 (component 1 is the most
    significant bit). The 8-byte-per-vector representation that makes
    corpus-scale embedding dedup memory-trivial: 100 TB of float vectors
    becomes ~1/256 the bytes before any join, and Hamming distance on
    the packed word approximates angular distance (sign-random-
    projection view, with the identity basis as the projection).

    JVM-only fold — ``shiftleft`` never throws on overflow (bitwise), so
    the sign bit packs cleanly under ANSI mode.

    -> vec_id, sig (long)
    """
    if not 1 <= bits <= 64:
        raise ValueError(f"embedding_signbits: bits={bits} not in [1, 64]")
    return embeddings.select(
        "vec_id",
        F.expr(
            f"aggregate(slice(embedding, 1, {bits}), 0L, "
            "(acc, x) -> shiftleft(acc, 1) + IF(x > 0, 1L, 0L))"
        ).alias("sig"),
    )


def hamming_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    bits: int = 64,
    shards: int | None | str = "auto",
) -> DataFrame:
    """Exact top-k nearest neighbors in HAMMING space over the packed
    sign-bit signature — the binary-quantization endpoint of the ANN
    matrix (full precision -> SQ8 -> PQ -> 1 bit/dim). The scan is one
    broadcast of Q packed longs and a ``bit_count(xor)`` per corpus
    row: 2 instructions of distance math against 8 bytes of data,
    which is why binary signatures are the web-scale first-pass
    (rerank survivors with exact cosine when ranking quality matters —
    compose with :func:`_exact_rerank` exactly like sq8/pq do).

    Ties break on neighbor_id for determinism (and oracle lockstep).

    -> query_id, neighbor_id, hamming, rank
    """
    sig = embedding_signbits(embeddings, bits)
    shards = _resolve_shards(shards, sig)
    queries = sig.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("sig").alias("qsig")
    )
    scored = (
        sig.select(F.col("vec_id").alias("neighbor_id"), "sig")
        .crossJoin(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.bit_count(F.col("sig").bitwiseXOR(F.col("qsig"))).alias(
                "hamming"
            ),
        )
    )
    order = [F.asc("hamming"), F.asc("neighbor_id")]
    scored = _shard_precut(scored, order, k, shards)
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def signbit_dedup_pairs(
    embeddings: DataFrame,
    max_hamming: int = 3,
    bits: int = 64,
    block_cap: int | None = None,
) -> DataFrame:
    """Near-dup embedding pairs on the packed sign signature — the SAME
    pigeonhole banded-Hamming equi-join as text simhash and media pHash
    (``dedup.simhash_pairs_from_signatures``): ``max_hamming + 1`` bit
    blocks, exact result set, never a cartesian. This is the cheap
    first-pass dedup for embedding corpora where even SQ8 codes are too
    wide to shuffle; survivors go to exact cosine verification.

    -> vec_a, vec_b, hamming
    """
    from .dedup import simhash_pairs_from_signatures

    sig = embedding_signbits(embeddings, bits).select(
        F.col("vec_id").alias("doc_id"), F.col("sig").alias("simhash")
    )
    return simhash_pairs_from_signatures(
        sig, bits, max_hamming, block_cap
    ).select(
        F.col("doc_a").alias("vec_a"),
        F.col("doc_b").alias("vec_b"),
        "hamming",
    )


def knn_graph(
    embeddings: DataFrame,
    k: int = 5,
    num_planes: int = 16,
    band_bits: int = 8,
    block_cap: int = 32,
) -> DataFrame:
    """Approximate k-nearest-neighbor GRAPH over the embedding corpus:
    every vector's top-``k`` most-cosine-similar neighbors among its
    LSH candidates (same sign-bit hyperplane banding as
    :func:`embedding_dedup_pairs`, but edges are DIRECTED — both
    ``(a, b)`` and ``(b, a)`` are ranked, from each endpoint's view).
    The kNN graph is the substrate for graph-based corpus curation:
    SemDeDup-style pruning, label propagation, density scoring.

    Recall is the banding recall (see
    :func:`embedding_dedup_pairs` — candidates only, not all pairs);
    a node whose buckets are all singletons emits no edges.

    Shape (100 TB): band equi-join for candidates, exact re-rank only
    on candidate rows, and the top-k cut is a window partitioned BY
    SOURCE NODE — bounded partitions (bucket-size-bounded candidate
    lists), never a global sort.

    BLOCK-OCCUPANCY BOUND (``block_cap``): within each ``(band, sig)``
    bucket only the ``block_cap`` lowest-``vec_id`` members (the
    bucket's "pivots") are eligible as ``dst``, so an R-occupancy
    bucket emits at most ``R * block_cap`` directed candidates instead
    of ``R^2``. A mass-duplicated boilerplate corpus — where every copy
    lands in the same bucket no matter how many planes are added, so
    re-banding cannot split it — now costs linear-in-R instead of
    quadratic. The trade, part of the operator contract (the oracle
    mirrors it): in an over-occupied bucket, neighbors beyond the pivot
    set are invisible to that bucket (other bands can still surface
    them). Buckets at or under ``block_cap`` are EXACTLY the uncapped
    result. Ranking pivots by ``vec_id`` keeps the cap deterministic
    and oracle-expressible.

    -> src, dst, cos_sim, rank
    """
    from pyspark.sql import Window

    vecs = as_double_vec(embeddings)
    bands = hyperplane_band_buckets(vecs, num_planes, band_bits)
    # pivot rank: position of each member within its bucket by vec_id.
    # The window shuffles on (band, sig) — the same key the candidate
    # join needs. BOTH candidate-join sides derive from the SAME ranked
    # frame (r14): the src side just ignores prank, so the window's
    # exchange subtree is shared/reused instead of the banding pass
    # running twice (once plain, once under the window), and the join
    # inputs arrive already partitioned on (band, sig).
    pw = Window.partitionBy("band", "sig").orderBy("vec_id")
    ranked = bands.withColumn("prank", F.row_number().over(pw))
    pivots = (
        ranked.filter(F.col("prank") <= block_cap)
        .select(F.col("vec_id").alias("dst"), "band", "sig")
    )
    cands = (
        ranked.select(F.col("vec_id").alias("src"), "band", "sig")
        .join(pivots, ["band", "sig"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    a = vecs.select(
        F.col("vec_id").alias("src"),
        F.col("v").alias("va"),
        F.col("v_nrm").alias("va_nrm"),
    )
    b = vecs.select(
        F.col("vec_id").alias("dst"),
        F.col("v").alias("vb"),
        F.col("v_nrm").alias("vb_nrm"),
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos_sim"), F.asc("dst"))
    return (
        cands.join(a, "src")
        .join(b, "dst")
        .select("src", "dst", cosine("va", "vb").alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("src", "dst", "cos_sim", "rank")
    )


def kmeans_centroids(
    embeddings: DataFrame, k: int = 8, iterations: int = 3
) -> DataFrame:
    """Lloyd's k-means in pure DataFrame ops — the iterative-algorithm
    capability (each iteration: broadcast the k centroids, assign by max
    cosine, recompute means). Deterministic: initialized from the first
    ``k`` vec_ids, ties broken by centroid_id.

    Iteration note (100 TB): each round is one broadcast join + one
    groupBy over the corpus — k rounds = k linear passes, no shuffle
    growth; checkpoint/localCheckpoint between rounds if lineage depth
    ever matters (k is small here).

    -> centroid_id, c (array<double> centroid mean)
    """
    # materialize the cast+norm projection once — every iteration cross
    # joins against it, and un-materialized each round would recompute
    # the per-vector norm fold over the corpus
    vecs = (
        as_double_vec(embeddings)
        .select("vec_id", "v", "v_nrm")
        .localCheckpoint(eager=True)
    )
    centroids = vecs.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("v").alias("c"),
        F.col("v_nrm").alias("c_nrm"),
    )
    for _ in range(iterations):
        # same map-side fold argmax as _assign_to_centroids: a Project
        # over the corpus, no N x C exploded stream, no SortAggregate
        assigned = vecs.crossJoin(
            F.broadcast(_centroid_entries(centroids))
        ).select(
            "vec_id",
            "v",
            _centroid_argmax().getField("cid").alias("centroid_id"),
        )
        # elementwise mean per cluster WITHOUT collecting vectors:
        # explode by dimension, sum/avg per (centroid, dim) — k*D group
        # keys regardless of corpus size — then reassemble the array in
        # dim order (collect_list here is D small structs per centroid)
        per_dim = assigned.select(
            "centroid_id", F.posexplode("v").alias("d", "x")
        ).groupBy("centroid_id", "d").agg(F.avg("x").alias("m"))
        centroids = (
            per_dim.groupBy("centroid_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(d, m))), s -> s.m)"
                ).alias("c")
            )
            .withColumn("c_nrm", F.sqrt(F.expr(DOT_EXPR.format(a="c", b="c"))))
        )
    # k tiny rows; materialize so downstream broadcasts (ivf assignment
    # uses the codebook more than once) don't re-run the Lloyd's lineage
    return centroids.select("centroid_id", "c").localCheckpoint(eager=True)


def semdedup_pairs(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 2,
    threshold: float = 0.9,
    top_n: int = 50,
    block_cap: int = 32,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with the trained
    k-means codebook (:func:`kmeans_centroids`), then look for
    near-duplicate pairs ONLY within each cluster — pairs in different
    clusters are by construction far apart, so the all-pairs O(N^2)
    comparison collapses to Σ cluster_size^2.

    Scale (100 TB): assignment is a broadcast of k tiny centroids +
    map-side fold argmax (:func:`_assign_to_centroids`); the pair join is a
    self-equi-join on ``centroid_id``. Cluster sizes are the first
    scale knob — production sweeps k with corpus size (k ~ N/10k) so
    each cell stays bounded — and ``block_cap`` is the HARD bound
    behind it: within each cluster only the ``block_cap``
    lowest-``vec_id`` members are eligible as the ``vec_a`` (smaller
    id) side, so an R-member cluster emits at most ``block_cap * R``
    candidate pairs instead of ``R^2/2``. A mass-duplicated corpus
    (every copy of the boilerplate assigned to the same centroid —
    more clusters cannot split identical vectors) now costs
    linear-in-R. Dedup connectivity survives the cap: in a duplicate
    clique every member still pairs with pivot members, so every
    duplicate is flagged; what is lost is the full clique enumeration
    among non-pivots, which dedup does not need. Clusters at or under
    ``block_cap + 1`` members produce EXACTLY the uncapped pair set.
    Candidate generation is part of the operator contract (the oracle
    mirrors the cap): a cross-cluster near-dup pair (rare — it
    requires the pair to straddle a Voronoi boundary) is missed, the
    standard SemDeDup trade.

    -> centroid_id, vec_a, vec_b, cos_sim  (top_n by similarity)
    """
    from pyspark.sql import Window

    cents = kmeans_centroids(embeddings, k, iterations).withColumn(
        "c_nrm", F.sqrt(F.expr(DOT_EXPR.format(a="c", b="c")))
    )
    assigned = _assign_to_centroids(as_double_vec(embeddings), cents)
    # pivot rank by vec_id within cluster: because vec_a < vec_b and
    # the rank order IS vec_id order, filtering the a-side to
    # prank <= block_cap keeps exactly the pairs whose smaller id is
    # among the cluster's first block_cap members — a deterministic,
    # oracle-expressible occupancy bound. The window shuffles on
    # centroid_id, the same key the pair join uses.
    pw = Window.partitionBy("centroid_id").orderBy("vec_id")
    a = (
        assigned.withColumn("prank", F.row_number().over(pw))
        .filter(F.col("prank") <= block_cap)
        .select(
            F.col("vec_id").alias("vec_a"),
            F.col("v").alias("va"),
            F.col("v_nrm").alias("va_nrm"),
            "centroid_id",
        )
    )
    b = assigned.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("v_nrm").alias("vb_nrm"),
        "centroid_id",
    )
    return (
        a.join(b, "centroid_id")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "centroid_id",
            "vec_a",
            "vec_b",
            cosine("va", "vb").alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .orderBy(F.desc("cos_sim"), "vec_a", "vec_b")
        .limit(top_n)
    )


def embedding_recall_eval(
    embeddings: DataFrame,
    sample_fraction: float = 0.3,
    num_planes: int = 16,
    band_bits: int = 8,
    threshold: float = 0.9,
) -> DataFrame:
    """Measure the hyperplane-band candidate generator's recall and
    precision against exact all-pairs cosine ground truth on a
    deterministic hash sample — the embedding-side counterpart of
    ``dedup.lsh_recall_eval`` (every banded ANN/near-dup query here
    documents its recall; this query measures it on live vectors).

    The all-pairs cosine is a DELIBERATE bounded quadratic over the
    ``sample_fraction`` draw only; at scale the sample SIZE stays
    constant while the fraction shrinks (recall is a corpus statistic).

    -> n_sample, n_truth, n_candidates, n_hit, recall, precision
    """
    prefix = F.lpad(
        F.substring(
            F.md5(F.col("vec_id").cast("string").cast("binary")), 1, 4
        ),
        5,
        "0",
    )
    thr = format(int(16**4 * sample_fraction), "04x").rjust(5, "0")
    vecs = as_double_vec(embeddings)
    sample = vecs.filter(prefix < thr).localCheckpoint(eager=False)
    a = sample.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("v_nrm").alias("va_nrm"),
    )
    b = sample.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("v_nrm").alias("vb_nrm"),
    )
    truth = (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(cosine("va", "vb") >= threshold)
        .select("vec_a", "vec_b")
    )
    # band with the PRODUCTION generator — planes are the first
    # num_planes vectors of the FULL corpus, exactly as every banded
    # query uses them; only the candidate join is restricted to the
    # sample (banding the sample alone would evaluate a different
    # generator than the one shipped)
    bands = hyperplane_band_buckets(vecs, num_planes, band_bits).join(
        sample.select("vec_id"), "vec_id", "left_semi"
    )
    cands = (
        bands.select(F.col("vec_id").alias("vec_a"), "band", "sig")
        .join(
            bands.select(F.col("vec_id").alias("vec_b"), "band", "sig"),
            ["band", "sig"],
        )
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    hits = truth.join(cands, ["vec_a", "vec_b"], "left_semi")
    return (
        sample.agg(F.count("*").alias("n_sample"))
        .crossJoin(truth.agg(F.count("*").alias("n_truth")))
        .crossJoin(cands.agg(F.count("*").alias("n_candidates")))
        .crossJoin(hits.agg(F.count("*").alias("n_hit")))
        .select(
            "n_sample",
            "n_truth",
            "n_candidates",
            "n_hit",
            F.round(
                F.when(
                    F.col("n_truth") > 0,
                    F.col("n_hit").cast("double") / F.col("n_truth"),
                ).otherwise(F.lit(1.0)),
                6,
            ).alias("recall"),
            F.round(
                F.when(
                    F.col("n_candidates") > 0,
                    F.col("n_hit").cast("double") / F.col("n_candidates"),
                ).otherwise(F.lit(1.0)),
                6,
            ).alias("precision"),
        )
    )


def ivf_recall_eval(
    embeddings: DataFrame,
    query_ids: list[int],
    num_centroids: int = 8,
    k: int = 3,
    m: int = 4,
    ksub: int = 8,
    expand: int = 4,
    dim: int | None = None,
    truth: DataFrame | None = None,
) -> DataFrame:
    """Measured recall@k for the IVF index family against exact
    brute-force truth — the quantized-index counterpart of
    :func:`embedding_recall_eval`. The IVF/SQ8/PQ operators DOCUMENT
    their recall trade (cell miss + quantization error); this query
    MEASURES it on live vectors, so a probe-count or codebook change
    that silently destroys recall fails loudly in the gate.

    Truth is ``brute_force_topk`` at the same ``k``; a hit is an
    (query, neighbor) edge the variant's top-k shares with truth.
    Variants: ``ivf`` (cell-pruned full-precision probe) and ``ivf_pq``
    (cell-pruned ADC probe + exact re-rank) — the two endpoints of the
    compression spectrum; sq8 sits between them.

    Scale: truth is the deliberate bounded cost — Q fixed query rows
    against the corpus (broadcast queries, one linear scan), exactly
    the `ann_brute_topk` plan; each variant adds its own index probe.
    Everything downstream of the top-k windows is Q*k tiny rows. A
    caller that has ALREADY computed the brute-force top-k (the bench
    runs `ann_brute_topk` in the same session) can pass it as ``truth``
    (columns query_id, neighbor_id) so the eval measures the index, not
    the baseline twice.

    -> variant, k, n_truth, n_hit, recall
    """
    if truth is None:
        truth = brute_force_topk(embeddings, query_ids, k)
    truth = truth.select("query_id", "neighbor_id").localCheckpoint(eager=False)
    # both variants probe the SAME coarse cells — run the corpus-wide
    # nearest-centroid argmax once and store it (lazy localCheckpoint:
    # materialized inside the consuming action, reused by both probes)
    vecs = as_double_vec(embeddings)
    coarse = vecs.filter(F.col("vec_id") < num_centroids).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("v").alias("c"),
        F.col("v_nrm").alias("c_nrm"),
    )
    assigned = _assign_to_centroids(vecs, coarse).localCheckpoint(eager=False)
    variants = [
        ("ivf", ivf_topk(embeddings, query_ids, num_centroids, k,
                         assigned=assigned)),
        (
            "ivf_pq",
            ivf_pq_topk(
                embeddings, query_ids, num_centroids, m, ksub, k, expand,
                dim, assigned=assigned,
            ),
        ),
    ]
    rows = []
    for name, approx in variants:
        hit = truth.join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        rows.append(
            truth.agg(F.count("*").alias("n_truth"))
            .crossJoin(hit.agg(F.count("*").alias("n_hit")))
            .select(
                F.lit(name).alias("variant"),
                F.lit(k).cast("int").alias("k"),
                "n_truth",
                "n_hit",
                F.round(
                    F.when(
                        F.col("n_truth") > 0,
                        F.col("n_hit").cast("double") / F.col("n_truth"),
                    ).otherwise(F.lit(1.0)),
                    6,
                ).alias("recall"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def kmeans_label_purity(
    embeddings: DataFrame, k: int = 8, iterations: int = 2
) -> DataFrame:
    """Clustering evaluation: per-cluster PURITY against the gold
    ``label`` column (majority-label fraction) — the cheap sanity
    metric for an unsupervised codebook (IVF cells, SemDeDup blocks)
    before trusting it for curation. Uses the same deterministic
    trained codebook and assignment as :func:`semdedup_pairs` /
    ``ivf_kmeans`` so it evaluates exactly the clustering the pipeline
    ships.

    Shape (100 TB): assignment is the broadcast + map-side fold argmax; the
    evaluation itself is a (centroid, label) rollup plus windows over
    the tiny per-centroid count frame.

    -> centroid_id, n_vecs, majority_label, majority_n, purity
    """
    from pyspark.sql import Window

    cents = kmeans_centroids(embeddings, k, iterations).withColumn(
        "c_nrm", F.sqrt(F.expr(DOT_EXPR.format(a="c", b="c")))
    )
    assigned = _assign_to_centroids(as_double_vec(embeddings), cents)
    labeled = assigned.select("vec_id", "centroid_id").join(
        embeddings.select("vec_id", "label"), "vec_id"
    )
    counts = labeled.groupBy("centroid_id", "label").agg(
        F.count("*").alias("n_l")
    )
    w = Window.partitionBy("centroid_id")
    wr = w.orderBy(F.desc("n_l"), F.asc("label"))
    return (
        counts.withColumn("n_vecs", F.sum("n_l").over(w).cast("long"))
        .withColumn("rn", F.row_number().over(wr))
        .filter("rn = 1")
        .select(
            "centroid_id",
            "n_vecs",
            F.col("label").cast("int").alias("majority_label"),
            F.col("n_l").cast("long").alias("majority_n"),
            F.round(
                F.col("n_l").cast("double") / F.col("n_vecs"), 6
            ).alias("purity"),
        )
    )


def hard_negative_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    shards: int | None | str = "auto",
) -> DataFrame:
    """Hard-negative mining for contrastive training-pair construction:
    per query vector, the top-k most cosine-similar vectors carrying a
    DIFFERENT gold label — the near-miss negatives that carry the
    gradient signal random negatives don't (the standard retrieval/
    embedding-training recipe). Same broadcast-queries + one-linear-scan
    shape as :func:`brute_force_topk`, with the label disagreement
    pushed into the scan filter; swap the scan for any of the IVF/PQ
    probes when the corpus outgrows brute force.

    -> query_id, neighbor_id, neighbor_label, cos_sim, rank
    """
    vecs = as_double_vec(embeddings)
    shards = _resolve_shards(shards, vecs)
    queries = vecs.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("q"),
        F.col("v_nrm").alias("q_nrm"),
    )
    scored = (
        vecs.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            "v",
            "v_nrm",
        )
        .crossJoin(F.broadcast(queries))
        .filter(
            (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("neighbor_label") != F.col("q_label"))
        )
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            cosine("q", "v").alias("cos_sim"),
        )
    )
    order = [F.desc("cos_sim"), F.asc("neighbor_id")]
    scored = _shard_precut(scored, order, k, shards)
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def prototype_prune(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 2,
    prune_fraction: float = 0.25,
) -> DataFrame:
    """SSL-prototypes data pruning (Sorscher et al., "Beyond neural
    scaling laws: beating power law scaling via data pruning",
    NeurIPS 2022): score every vector by its cosine to its OWN trained
    cluster centroid — "prototypicality" — and, per cluster, mark the
    most prototypical ``prune_fraction`` for removal. In the
    abundant-data regime the paper shows keeping the HARD (least
    prototypical) examples beats random pruning; this is the
    curation-side counterpart of SemDeDup over the same codebook, and
    both reuse the identical :func:`kmeans_centroids` +
    :func:`_assign_to_centroids` training so one codebook drives
    dedup, IVF indexing and pruning consistently.

    Determinism: the keep decision compares the per-cluster rank
    (cos desc, vec_id tie-break) against ``floor(cluster_n *
    prune_fraction)`` — exact for the default 0.25 whose product with
    a BIGINT count is an exact double.

    Shape (100 TB): training and assignment are k linear passes with a
    broadcast codebook (see kmeans_centroids); the scoring join
    broadcasts k tiny centroid rows; the rank/count windows partition
    by ``centroid_id`` — one exchange, partitions bounded by cluster
    size (same occupancy caveat and knobs as semdedup: sweep k with
    corpus size).

    -> vec_id, centroid_id, proto_cos, proto_rank, cluster_n, kept
    """
    cents = kmeans_centroids(embeddings, k, iterations).withColumn(
        "c_nrm", F.sqrt(F.expr(DOT_EXPR.format(a="c", b="c")))
    )
    # the assignment fold already computed cos(v, own centroid) — take
    # it as the prototypicality score (same dot/norm expression tree,
    # bit-identical) instead of re-joining the codebook and re-scoring
    scored = _assign_to_centroids(
        as_double_vec(embeddings), cents, cos_col="pc"
    ).select("vec_id", "centroid_id", "pc")
    w = Window.partitionBy("centroid_id")
    wrank = w.orderBy(F.desc("pc"), "vec_id")
    return (
        scored.withColumn("proto_rank", F.row_number().over(wrank).cast("int"))
        .withColumn("cluster_n", F.count("*").over(w).cast("long"))
        .select(
            "vec_id",
            "centroid_id",
            F.round("pc", 6).alias("proto_cos"),
            "proto_rank",
            "cluster_n",
            (
                F.col("proto_rank")
                > F.floor(F.col("cluster_n") * F.lit(prune_fraction))
            ).alias("kept"),
        )
        # no presentation orderBy: output is corpus-sized — a global
        # sort would be the plan's only corpus-wide range exchange
    )


def ann_topk_blas(
    embeddings: DataFrame, query_ids: list[int], k: int = 5
) -> DataFrame:
    """Vectorized brute-force top-k: Arrow-batched ``mapInPandas`` with a
    numpy matmul per batch against the broadcast query matrix — the
    kernel shape used for BLAS/GPU offload at scale. Results equal
    :func:`brute_force_topk` (checked in tests); float summation order
    differs (pairwise/SIMD), so the similarity is quantized ONCE to a
    micro-unit BIGINT at the edge — BLAS and sequential-SQL dot
    products differ in the last ulp, which a raw DOUBLE hash would
    surface as a flake (float sweep, round 7). Ranking still uses the
    raw sims (identical ordering to the unbatched kernel).

    -> query_id, neighbor_id, cos_sim_e6, rank
    """
    import numpy as np
    import pandas as pd

    # lean projection for the Arrow transfer: ids + vectors only (norms
    # are recomputed vectorized inside the kernel anyway)
    vecs = embeddings.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x AS double))").alias("v")
    )
    qrows = vecs.filter(F.col("vec_id").isin(query_ids)).collect()
    qids = np.array([r["vec_id"] for r in qrows])
    qmat = np.array([r["v"] for r in qrows])  # (Q, D)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    bc = vecs.sparkSession.sparkContext.broadcast((qids, qnorm))

    def score(batches):
        bqids, bq = bc.value
        for pdf in batches:
            mat = np.vstack(pdf["v"].to_numpy())  # (B, D)
            nids = pdf["vec_id"].to_numpy()
            mnorm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mnorm @ bq.T  # (B, Q)
            # partial top-k PER BATCH (combiner pattern): each batch emits
            # at most Q*(k+1) candidate rows instead of Q*B, so the
            # downstream shuffle + window sees a tiny candidate set.
            # k+1 covers the query row itself appearing in the batch;
            # lexsort on (-cos, neighbor_id) keeps the global tiebreak
            # exact, so the merged result equals the unbatched top-k.
            kk = min(k + 1, len(nids))
            frames = []
            for qi in range(len(bqids)):
                top = np.lexsort((nids, -sims[:, qi]))[:kk]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": bqids[qi],
                            "neighbor_id": nids[top],
                            "cos_sim": sims[top, qi],
                        }
                    )
                )
            out = pd.concat(frames, ignore_index=True)
            yield out[out.query_id != out.neighbor_id]

    scored = vecs.mapInPandas(
        score, schema="query_id long, neighbor_id long, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos_sim") * 1_000_000, 0)
            .cast("long")
            .alias("cos_sim_e6"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


def sq8_codebook(vecs: DataFrame) -> DataFrame:
    """Per-dimension scalar-quantization codebook: one row with the
    per-dim minimum, the true 256-level scale ``(max - min) / 255``
    (0 for a constant dim), and the quantize DIVISOR ``qscales`` (the
    same scale with constant dims mapped to 1.0 so the division is
    total — their codes are all 0 and reconstruction uses the TRUE
    scale, so a constant dim reconstructs to exactly ``min``, not
    ``min + 0.5``). Computed as a posexplode + (pos)-keyed aggregate —
    D group keys regardless of corpus size — then reassembled in dim
    order.

    -> mins, scales, qscales (each ARRAY<DOUBLE>; single row)
    """
    stats = (
        vecs.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    return stats.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, mn))), s -> s.mn)"
        ).alias("mins"),
        F.expr(
            "transform(array_sort(collect_list(struct(pos, mn, mx))),"
            " s -> (s.mx - s.mn) / 255.0D)"
        ).alias("scales"),
        F.expr(
            "transform(array_sort(collect_list(struct(pos, mn, mx))),"
            " s -> CASE WHEN s.mx = s.mn THEN 1.0D"
            " ELSE (s.mx - s.mn) / 255.0D END)"
        ).alias("qscales"),
    )


def sq8_encode(vecs: DataFrame, codebook: DataFrame) -> DataFrame:
    """Scalar-quantize each vector to 8-bit codes (0..255 per dim) and
    attach the dequantized reconstruction + its norm. The ``codes``
    column is the STORAGE layout: one byte per dimension instead of
    eight — at 100 TB of float64 embeddings the quantized corpus is
    ~12.5 TB, an 8x scan-width cut for every ANN probe (kept as
    ARRAY<SMALLINT> here because Spark's TINYINT is signed; a production
    sink zero-points to int8 bytes).

    Reconstruction is the midpoint rule ``min + (code + 0.5) * scale``;
    both the code and the reconstruction are identical expression trees
    in the DuckDB oracle, so results hash-match bit-for-bit.

    -> vec_id, v, v_nrm, codes ARRAY<SMALLINT>, recon ARRAY<DOUBLE>,
       recon_nrm
    """
    return (
        vecs.crossJoin(F.broadcast(codebook))
        .withColumn(
            "codes",
            F.expr(
                "zip_with(zip_with(v, mins, (x, m) -> x - m), qscales,"
                " (d, s) -> CAST(least(greatest(floor(d / s), 0L), 255L)"
                " AS SMALLINT))"
            ),
        )
        .withColumn(
            "recon",
            F.expr(
                "zip_with(zip_with(codes, scales,"
                " (c, s) -> (CAST(c AS DOUBLE) + 0.5D) * s), mins,"
                " (t, m) -> m + t)"
            ),
        )
        .withColumn(
            "recon_nrm", F.sqrt(F.expr(DOT_EXPR.format(a="recon", b="recon")))
        )
        .drop("mins", "scales", "qscales")
    )


def sq8_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    expand: int = 4,
    shards: int | None | str = "auto",
) -> DataFrame:
    """Scalar-quantized ANN with asymmetric re-rank (the SQ path every
    large-scale vector store ships alongside IVF/PQ): the corpus is
    8-bit-quantized (:func:`sq8_encode`), queries stay full-precision;
    the first pass scores queries against the RECONSTRUCTED corpus and
    keeps ``expand * k`` candidates per query, the second re-ranks only
    those candidates against the full-precision vectors.

    Scale notes (100 TB): the first pass scans the quantized corpus —
    1/8th the bytes of the raw embeddings (the win is scan width and
    cache residency; a SIMD int8 kernel makes it a compute win too) —
    and the re-rank touches ``Q * expand * k`` full-precision rows,
    fetched by id. Compose with :func:`ivf_topk` for sublinear probes:
    IVF prunes WHICH vectors are scored, SQ cuts the cost of scoring
    each one.

    Candidate selection is part of the operator contract (mirrored in
    the oracle); a true neighbor outside the expand window is missed —
    standard SQ recall, pushed toward 1 by ``expand``.

    -> query_id, neighbor_id, cos_sim, rank
    """
    vecs = as_double_vec(embeddings)
    shards = _resolve_shards(shards, vecs)
    enc = sq8_encode(vecs, sq8_codebook(vecs))
    queries = vecs.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q"),
        F.col("v_nrm").alias("q_nrm"),
    )
    approx = (
        enc.select(F.col("vec_id").alias("neighbor_id"), "recon", "recon_nrm")
        .crossJoin(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine("q", "recon").alias("a_sim"),
        )
    )
    return _expand_rerank(approx, vecs, queries, k, expand, shards)


def ivf_sq8_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    num_centroids: int = 8,
    k: int = 3,
    expand: int = 4,
) -> DataFrame:
    """The production ANN composition: IVF prunes WHICH vectors are
    scored (a query probes only its centroid's inverted list), scalar
    quantization cuts the cost of scoring each one (the probe scans
    8-bit codes, not float64), and an exact full-precision re-rank of
    the ``expand * k`` surviving candidates restores accuracy — the
    IVF-SQ index layout every large vector store ships.

    Assignment runs on full-precision vectors (index build time — paid
    once); the probe path touches only quantized data until the final
    re-rank fetch. At 100 TB the corpus table is partitioned by
    ``centroid_id`` storing ``codes``; a probe is a partition-pruned
    scan of ~N/C code rows (1/8th the bytes), plus ``Q * expand * k``
    full-precision row fetches.

    Candidate recall is the product of the two stages' contracts: a true
    neighbor outside the probed cell (IVF) or outside the expand window
    (SQ) is missed — both mirrored exactly in the oracle.

    -> query_id, neighbor_id, cos_sim, rank
    """
    vecs = as_double_vec(embeddings)
    centroids = vecs.filter(F.col("vec_id") < num_centroids).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("v").alias("c"),
        F.col("v_nrm").alias("c_nrm"),
    )
    assigned = _assign_to_centroids(vecs, centroids)
    enc = sq8_encode(assigned, sq8_codebook(vecs))
    queries = assigned.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q"),
        F.col("v_nrm").alias("q_nrm"),
        "centroid_id",
    )
    approx = (
        enc.select(
            F.col("vec_id").alias("neighbor_id"),
            "recon", "recon_nrm", "centroid_id",
        )
        .join(F.broadcast(queries), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", cosine("q", "recon").alias("a_sim")
        )
    )
    return _expand_rerank(approx, vecs, queries, k, expand)


def _block_slices(col: str, m: int, sub: int):
    """Array of (blk, slice) structs cutting ``col`` into ``m``
    contiguous ``sub``-dim blocks (1-based slice positions)."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("blk"),
                F.expr(f"slice({col}, {b * sub + 1}, {sub})").alias("c"),
            )
            for b in range(m)
        ]
    )


def _pq_encode(vblocks: DataFrame, cents: DataFrame) -> DataFrame:
    """Per (vec, block) nearest sub-centroid by exact squared L2
    (``xx + cc - 2 x.c``), tie-break min cid — evaluated map-side by a
    fold over the per-block broadcast codebook array (r13, the same
    shape as :func:`_centroid_argmax`: ``min_by``'s struct buffer is
    not hash-aggregable, so the aggregate form planned SortAggregates
    over the N x m x ksub exploded stream). The fold seeds with the
    array's FIRST entry and replaces on STRICT dist-less over
    cid-ascending entries, which reproduces ``min_by(struct(dist,
    cid))`` exactly — including degenerate all-equal and (unreachable
    with finite vectors) all-NaN distances, where both keep the
    smallest cid.

    ``vblocks``: vec_id, blk, x, xx;  ``cents``: blk, cid, c, cc.
    -> vec_id, blk, cid, cc
    """
    cb = cents.groupBy("blk").agg(
        F.array_sort(F.collect_list(F.struct("cid", "c", "cc"))).alias("_cb")
    )
    dot = DOT_EXPR.format(a="x", b="e.c")
    scored = F.expr(
        f"transform(_cb, e -> named_struct("
        f"'dist', xx + e.cc - 2.0D * {dot}, 'cid', e.cid, 'cc', e.cc))"
    )
    best = F.expr(
        "aggregate(slice(_scored, 2, size(_scored) - 1), "
        "element_at(_scored, 1), "
        "(best, s) -> IF(s.dist < best.dist, s, best))"
    )
    return (
        vblocks.join(F.broadcast(cb), "blk")
        .select("vec_id", "blk", scored.alias("_scored"))
        .select("vec_id", "blk", best.alias("_best"))
        .select(
            "vec_id",
            "blk",
            F.col("_best.cid").alias("cid"),
            F.col("_best.cc").alias("cc"),
        )
    )


def pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    m: int = 4,
    ksub: int = 8,
    k: int = 5,
    expand: int = 4,
    dim: int | None = None,
    shards: int | None | str = "auto",
) -> DataFrame:
    """Product-quantized ANN with asymmetric distance computation (ADC)
    and exact re-rank — the OTHER classic vector-compression layout
    next to :func:`sq8_topk`: each vector is cut into ``m`` contiguous
    sub-blocks and every block is replaced by the id of its nearest
    block-codebook centroid, so the stored code is ``m`` BYTES per
    vector (vs one byte per DIMENSION for SQ8 — 64x compression over
    float64 at m=4, d=64).

    Codebooks are deterministic (block slices of the first ``ksub``
    corpus vectors — oracle-expressible; production trains them with
    per-block k-means, same plan shape). Block assignment minimizes
    exact squared L2, written as ``x.x + c.c - 2 x.c`` so both engines
    evaluate identical dot-product folds. Scoring is textbook ADC: the
    query precomputes its dot with every (block, centroid) — a
    ``Q x m x ksub`` table, broadcast — and a candidate's approximate
    dot is the sum of its ``m`` looked-up entries, normalized by the
    reconstruction norm ``sqrt(sum of chosen-centroid norms)``. Both
    per-vector sums are written as explicit blk-conditional sums added
    in block order, so the float accumulation order is identical in
    the DuckDB oracle.

    Scale notes (100 TB): the probe path scans only the m-byte codes
    and joins them against the broadcast ADC table — no vector data
    moves at all until the final ``Q * expand * k`` full-precision
    fetch. Compose with IVF exactly as :func:`ivf_sq8_topk` does for
    SQ. Candidate recall is the PQ approximation's, pushed toward 1 by
    ``expand``.

    -> query_id, neighbor_id, cos_sim, rank
    """
    vecs = as_double_vec(embeddings)
    shards = _resolve_shards(shards, vecs)
    if dim is None:
        # bounded 1-row probe; callers on the serving path pass dim
        # explicitly so the plan builds without any driver action
        probe = embeddings.select("embedding").first()
        if probe is None:
            raise ValueError("pq_topk: empty embeddings input (pass dim= "
                             "to build a plan without probing)")
        dim = len(probe["embedding"])
    if dim % m != 0:
        # a truncating dim // m would silently drop the tail dims from
        # every code and score — same loud-config contract as
        # dedup.simhash_blocks
        raise ValueError(f"pq_topk: dim={dim} must be divisible by m={m}")
    sub = dim // m
    cents = (
        vecs.filter(F.col("vec_id") < ksub)
        .select(
            F.col("vec_id").alias("cid"),
            F.explode(_block_slices("v", m, sub)).alias("s"),
        )
        .select("cid", "s.blk", "s.c")
        .withColumn("cc", F.expr(DOT_EXPR.format(a="c", b="c")))
    )
    vblocks = (
        vecs.select("vec_id", F.explode(_block_slices("v", m, sub)).alias("s"))
        .select("vec_id", "s.blk", F.col("s.c").alias("x"))
        .withColumn("xx", F.expr(DOT_EXPR.format(a="x", b="x")))
    )
    # per (vec, block): nearest centroid by exact squared L2, tie-break
    # min cid — map-side codebook fold (r13), see _pq_encode
    enc = _pq_encode(vblocks, cents)
    queries = vecs.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q"),
        F.col("v_nrm").alias("q_nrm"),
    )
    qblocks = queries.select(
        "query_id", F.explode(_block_slices("q", m, sub)).alias("s")
    ).select("query_id", "s.blk", F.col("s.c").alias("qb"))
    # ADC lookup table: Q x m x ksub rows
    qd = qblocks.join(F.broadcast(cents), "blk").select(
        "query_id",
        "blk",
        "cid",
        F.expr(DOT_EXPR.format(a="qb", b="c")).alias("qdot"),
    )
    # block-ordered conditional sums -> identical float accumulation
    # order in both engines
    adc_terms = [
        F.sum(F.when(F.col("blk") == b, F.col("qdot"))).alias(f"a{b}")
        for b in range(m)
    ]
    cc_terms = [
        F.max(F.when(F.col("blk") == b, F.col("cc"))).alias(f"n{b}")
        for b in range(m)
    ]
    joined = enc.join(F.broadcast(qd), ["blk", "cid"]).filter(
        F.col("vec_id") != F.col("query_id")
    )
    per_pair = joined.groupBy(
        F.col("query_id"), F.col("vec_id").alias("neighbor_id")
    ).agg(*adc_terms, *cc_terms)
    adc = None
    ccs = None
    for b in range(m):
        adc = F.col(f"a{b}") if adc is None else adc + F.col(f"a{b}")
        ccs = F.col(f"n{b}") if ccs is None else ccs + F.col(f"n{b}")
    # a zero reconstruction norm (every chosen centroid is the zero
    # block) has no defined direction: a_sim NULL, ranked last
    approx = per_pair.join(
        F.broadcast(queries.select("query_id", "q_nrm")), "query_id"
    ).select(
        "query_id",
        "neighbor_id",
        F.when(ccs > 0, adc / (F.col("q_nrm") * F.sqrt(ccs))).alias("a_sim"),
    )
    return _expand_rerank(approx, vecs, queries, k, expand, shards)


def ivf_pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    num_centroids: int = 8,
    m: int = 4,
    ksub: int = 8,
    k: int = 3,
    expand: int = 4,
    dim: int | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ: the compressed-probe composition completing the index
    matrix (IVF x {full precision, SQ8, PQ}) — coarse centroids prune
    WHICH vectors a query scores, product quantization makes scoring
    each one an m-entry ADC table lookup over m-BYTE codes. This is the
    layout FAISS-style billion-vector indexes ship: the probe touches
    ``N/C`` code rows of m bytes each, and full-precision vectors are
    fetched only for the ``Q * expand * k`` re-rank survivors.

    Same deterministic codebooks as :func:`ivf_topk` (coarse) and
    :func:`pq_topk` (blocks); candidate filtering to the query's cell
    happens BEFORE the ADC aggregation, so the per-pair work is
    cell-local. Recall compounds the IVF cell miss and the PQ
    approximation, both mirrored in the oracle.

    Accepts a precomputed coarse ``assigned`` frame (vec_id, v, v_nrm,
    centroid_id) like :func:`ivf_topk`, sharing the assignment argmax
    across IVF variants that probe the same cells.

    -> query_id, neighbor_id, cos_sim, rank
    """
    if dim is None:
        probe = embeddings.select("embedding").first()
        if probe is None:
            raise ValueError("ivf_pq_topk: empty embeddings input (pass "
                             "dim= to build a plan without probing)")
        dim = len(probe["embedding"])
    if dim % m != 0:
        raise ValueError(f"ivf_pq_topk: dim={dim} must be divisible by m={m}")
    sub = dim // m
    if assigned is None:
        vecs = as_double_vec(embeddings)
        coarse = vecs.filter(F.col("vec_id") < num_centroids).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("v").alias("c"),
            F.col("v_nrm").alias("c_nrm"),
        )
        assigned = _assign_to_centroids(vecs, coarse)
    else:
        vecs = assigned.select("vec_id", "v", "v_nrm")
    cells = assigned.select("vec_id", "centroid_id")
    cents = (
        vecs.filter(F.col("vec_id") < ksub)
        .select(
            F.col("vec_id").alias("cid"),
            F.explode(_block_slices("v", m, sub)).alias("s"),
        )
        .select("cid", "s.blk", "s.c")
        .withColumn("cc", F.expr(DOT_EXPR.format(a="c", b="c")))
    )
    vblocks = (
        vecs.select("vec_id", F.explode(_block_slices("v", m, sub)).alias("s"))
        .select("vec_id", "s.blk", F.col("s.c").alias("x"))
        .withColumn("xx", F.expr(DOT_EXPR.format(a="x", b="x")))
    )
    enc = _pq_encode(vblocks, cents).join(cells, "vec_id")
    queries = vecs.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q"),
        F.col("v_nrm").alias("q_nrm"),
    ).join(cells.withColumnRenamed("vec_id", "query_id"), "query_id")
    qblocks = queries.select(
        "query_id", "centroid_id",
        F.explode(_block_slices("q", m, sub)).alias("s"),
    ).select("query_id", "centroid_id", "s.blk", F.col("s.c").alias("qb"))
    qd = qblocks.join(F.broadcast(cents), "blk").select(
        "query_id",
        "centroid_id",
        "blk",
        "cid",
        F.expr(DOT_EXPR.format(a="qb", b="c")).alias("qdot"),
    )
    # cell-local probe: the join key includes the coarse centroid, so
    # only same-cell (query, vector) pairs ever reach the aggregation
    joined = enc.join(F.broadcast(qd), ["centroid_id", "blk", "cid"]).filter(
        F.col("vec_id") != F.col("query_id")
    )
    adc_terms = [
        F.sum(F.when(F.col("blk") == b, F.col("qdot"))).alias(f"a{b}")
        for b in range(m)
    ]
    cc_terms = [
        F.max(F.when(F.col("blk") == b, F.col("cc"))).alias(f"n{b}")
        for b in range(m)
    ]
    per_pair = joined.groupBy(
        F.col("query_id"), F.col("vec_id").alias("neighbor_id")
    ).agg(*adc_terms, *cc_terms)
    adc = None
    ccs = None
    for b in range(m):
        adc = F.col(f"a{b}") if adc is None else adc + F.col(f"a{b}")
        ccs = F.col(f"n{b}") if ccs is None else ccs + F.col(f"n{b}")
    approx = per_pair.join(
        F.broadcast(queries.select("query_id", "q_nrm")), "query_id"
    ).select(
        "query_id",
        "neighbor_id",
        F.when(ccs > 0, adc / (F.col("q_nrm") * F.sqrt(ccs))).alias("a_sim"),
    )
    return _expand_rerank(approx, vecs, queries, k, expand)


# ---------------------------------------------------------------------------
# PCA top component — power iteration on a one-pass covariance table.
# The dominant-direction primitive embedding pipelines use for
# de-biasing / "all-but-the-top" post-processing (Mu & Viswanath 2018)
# and as the split axis for balanced space partitioning. Scale shape:
# ONE corpus pass builds the d x d scatter table (map-side partial sums
# to d^2 cells — the only data-sized stage); the power iteration then
# runs entirely on a 1-row broadcastable (matrix, vector) state as
# map-side folds, so iteration count never touches the corpus or the
# scheduler. The projection pass at the end is a second corpus scan
# folding each vector against the broadcast (mu, v) row.
# ---------------------------------------------------------------------------

PCA_ITERATIONS = 6


def pca_power_projection(
    embeddings: DataFrame, iterations: int = PCA_ITERATIONS, dim: int = 64
) -> DataFrame:
    """Project every vector onto the corpus's top principal component.

    Power iteration from the fixed start vector ``e_0`` on the centered
    scatter matrix ``C = sum_i (x_i - mu)(x_i - mu)^T``, normalized to
    unit length each round (fixed round count keeps the plan and the
    unrolled SQL oracle in lockstep, like ``kmeans_centroids``). The
    sign is whatever ``C^k e_0`` converges to — deterministic for a
    fixed start and round count.

    -> vec_id, pc1_score
    """
    vecs = as_double_vec(embeddings).filter(F.col("v").isNotNull())
    # pass 1 — mu as ONE aggregate of d element sums + a count (no
    # posexplode, no d-keyed shuffle: the partial agg is d+1 doubles per
    # task), assembled directly as the broadcastable mu array row
    mu_row = vecs.agg(
        F.array(
            *[
                F.sum(F.element_at("v", d + 1)) / F.count(F.lit(1))
                for d in range(dim)
            ]
        ).alias("mu_arr")
    )
    cvecs = vecs.crossJoin(F.broadcast(mu_row)).select(
        "vec_id",
        F.expr("zip_with(v, mu_arr, (x, m) -> x - m)").alias("cv"),
    )
    # pass 2 — d^2 scatter cells in one corpus pass: explode only the d
    # axis (d rows per vector, r14 — the r13 shape generated d^2 structs
    # per vector) and sum the e axis as d wide agg columns; the hash agg
    # is d groups x d sum buffers, partial map-side. Same cv[d]*cv[e]
    # product multiset per (d, e) cell as the d^2-struct form (float sum
    # order differs, which distributed partial aggregation already makes
    # nondeterministic — the round-6 output quantization absorbs it).
    scat_rows = (
        cvecs.select(F.posexplode("cv").alias("d", "xd"), "cv")
        .groupBy("d")
        .agg(
            *[
                F.sum(F.col("xd") * F.element_at("cv", e + 1)).alias(f"c{e}")
                for e in range(dim)
            ]
        )
    )
    # assemble the whole d x d scatter as ONE nested-array row; the
    # power iteration then never leaves the 1-row relation — each round
    # is a map-side matvec fold (r13 ran 1 join + 1 agg + 1 exchange per
    # round on a d-row relation: 6 rounds of pure scheduler overhead)
    mat_row = scat_rows.select(
        "d", F.array(*[F.col(f"c{e}") for e in range(dim)]).alias("row")
    ).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d, row))), s -> s.row)"
        ).alias("mat")
    )
    # the WHOLE power iteration is one fold over the round sequence —
    # the accumulator is a materialized VALUE at every step, so round k
    # evaluates exactly once (chaining one Project per round instead
    # would CollapseProject into a single expression whose pv subtree
    # re-evaluates per lambda element: exponential runtime).
    # Normalization is DEFERRED to one final step: per-round normalize
    # only rescales the direction. Magnitudes grow as lambda^k — at 6
    # rounds that stays far inside double range even for a 100 TB-scale
    # eigenvalue (lambda ~ 1e11 -> 1e66 << 1e308).
    state = mat_row.crossJoin(mu_row).select(
        "mu_arr",
        F.expr(
            f"aggregate(sequence(1, {iterations}), "
            f"array(1.0D{', 0.0D' * (dim - 1)}), "
            "(pv, k) -> transform(mat, r -> aggregate("
            "zip_with(r, pv, (m, x) -> m * x), 0D, (a2, y2) -> a2 + y2)))"
        ).alias("pv"),
    )
    # pv is referenced twice below (numerator element and norm fold), so
    # CollapseProject keeps this boundary and the iteration fold above
    # runs once per (single) row
    final = state.select(
        "mu_arr",
        F.expr(
            "transform(pv, x -> x / sqrt(aggregate("
            "transform(pv, e -> e * e), 0D, (acc, y) -> acc + y)))"
        ).alias("vf"),
    )
    # projection — a map-side fold per vector against the broadcast
    # (mu, vf) row: no posexplode, no per-dimension join, and no
    # vec_id-keyed re-aggregation (the r13 tail was a full corpus-sized
    # exchange just to sum 64 products per vector)
    return vecs.crossJoin(F.broadcast(final)).select(
        "vec_id",
        F.round(
            F.expr(
                "aggregate(zip_with(zip_with(v, mu_arr, (x, m) -> x - m), "
                "vf, (c, w) -> c * w), 0D, (acc, y) -> acc + y)"
            ),
            6,
        ).alias("pc1_score"),
    )
