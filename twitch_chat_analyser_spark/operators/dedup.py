"""Document deduplication operators (SURVEY.md §7.5 — beyond-reference,
LLM-training-data-pipeline surface).

All operators are pure DataFrame functions over the ``documents`` table
(doc_id, text, lang, source, n_chars) and are expressed with built-in
JVM-side functions only — no Python UDFs in any hot path.

Cross-engine determinism: hash-based operators use ``md5`` (identical
hex output in Spark and DuckDB, so the oracle reproduces signatures
exactly); MinHash needs only a consistent total order on hash values,
which lexicographic order on md5 hex strings provides.

Scale notes (100 TB):
- exact dedup: one shuffle on the normalized-text hash; group sizes are
  bounded (dup clusters), no skew concern beyond AQE defaults. At 100 TB
  group on ``md5(norm_text)`` (fixed 32 bytes) instead of the full text
  to shrink shuffle width — implemented that way here.
- MinHash/LSH: signatures are computed map-side (explode shingles +
  partial min-aggregation before the shuffle); candidate generation is a
  self-equi-join on (band, signature) — a shuffle join whose key space
  is uniform by construction (hash values). Pair explosion is bounded by
  band width: tune ``num_hashes``/bands so bucket sizes stay small; a
  hot bucket (e.g. boilerplate docs) is an AQE skew-join case.
- SimHash: fixed-width bit signature, one aggregation; the pair join is
  a pigeonhole band join — ``max_hamming + 1`` bit blocks, candidates
  from a self-equi-join on ``(block_idx, block_value)``. EXACTLY
  equivalent to the all-pairs join (a pair within the Hamming budget
  must agree on >= 1 block) with no cartesian product anywhere.
- n-gram Jaccard: candidates from the MinHash band join (same machinery
  as ``minhash_dedup_pairs``), verified with exact Jaccard inside the
  (lang, source) block.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GAP_DEFAULTS = {"num_hashes": 8, "shingle_k": 3}


def norm_text(col: str = "text") -> Column:
    """Normalization for exact dedup: lowercase, trim, collapse runs of
    whitespace."""
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def tokens(col: str = "text") -> Column:
    return F.split(F.col(col), r"\s+")


def shingles(tokens_col: str, k: int = 3) -> Column:
    """Word k-shingles as an array column (guarded for short docs)."""
    return F.expr(
        f"CASE WHEN size({tokens_col}) < {k} THEN array(array_join({tokens_col}, ' ')) "
        f"ELSE transform(sequence(1, size({tokens_col}) - {k - 1}), "
        f"i -> concat_ws(' ', slice({tokens_col}, i, {k}))) END"
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup on normalized text: one surviving doc_id (the min) per
    distinct content + the duplicate count.

    Groups on md5(norm) rather than the text itself so the shuffle key is
    32 bytes regardless of document length.

    -> doc_id, content_hash, dup_count
    """
    return (
        docs.select(F.col("doc_id"), F.md5(norm_text()).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count("*").alias("dup_count"),
        )
        .select("doc_id", "content_hash", "dup_count")
    )


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 8, shingle_k: int = 3
) -> DataFrame:
    """MinHash signature per (doc, seed): min over shingles of the
    seed's hash slot. Long format — (doc_id, seed, minhash) — which
    makes LSH banding a plain equi-join.

    Hash family: slot ``i`` is the 8-hex-char substring ``[(i%4)*8+1,
    +8)`` of ``md5('x' * (i//4) || shingle)`` — four independent 32-bit
    slots per digest, so 8 hash functions cost TWO md5 evaluations per
    shingle, not eight (subexpression elimination shares each digest
    across its four substrings). MinHash only needs a consistent total
    order per hash function; lexicographic order on fixed-width hex is
    one, and identical in DuckDB.

    The min-aggregation is partial (map-side combine) before any
    shuffle: per input partition Spark reduces each doc's shingles to at
    most ``num_hashes`` candidate minima.

    (r14 note: a per-doc array_min-fold variant — the simhash-fold
    pattern, removing the doc_id groupBy — was built, measured and
    REVERTED: higher-order-function lambdas evaluate interpreted,
    outside whole-stage codegen, and 2 md5 + 8 conv per shingle under
    interpretation ran ~5x slower than this codegen'd explode +
    hash-agg pipeline: isolated dedup_minhash_lsh 3.5 -> 10.0 s.)
    """
    sh = (
        docs.withColumn("toks", tokens())
        .select("doc_id", F.explode(shingles("toks", shingle_k)).alias("sh"))
    )

    # each slot's min is taken over the NUMERIC value of its 8-hex-char
    # digest substring, not the substring itself: fixed-width lowercase
    # hex is order-isomorphic to its unsigned value, so min-by-long ==
    # min-by-string — but min(string) carries a var-length aggregation
    # buffer, which forces Catalyst off HashAggregate onto
    # SortAggregate, i.e. a full sort of the exploded SHINGLE stream on
    # both sides of the band join (r13 plan audit; guide §2: the sort
    # was the single largest cost in every minhash-family query).
    # min(long) hash-aggregates with no sort anywhere.
    def slot(i: int):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit("x" * (i // 4)), F.col("sh"))),
                (i % 4) * 8 + 1,
                8,
            ),
            16,
            10,
        ).cast("long")

    # one min-aggregate PER SLOT over the shingle rows — no row
    # multiplication before the shuffle (a posexplode of the slots would
    # 8x the exploded-shingle row count); the groupBy ships at most
    # num_hashes partial minima per (doc, input-partition)
    mins = sh.groupBy("doc_id").agg(
        *[F.min(slot(i)).alias(f"m{i}") for i in range(num_hashes)]
    )
    # tiny post-shuffle reshape: num_hashes rows per doc, each min
    # re-encoded to the exact 8-hex-char string the substring produced
    # (lowercase, zero-padded) — the output contract is byte-identical
    # to the pre-r13 version, pinned by the oracle and the streaming
    # fingerprint-store twin
    return mins.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"m{i}") for i in range(num_hashes)])
        ).alias("seed", "mh_val"),
    ).select(
        "doc_id",
        "seed",
        F.lpad(F.lower(F.hex("mh_val")), 8, "0").alias("minhash"),
    )


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """LSH with band width 1: docs sharing ANY minhash value become a
    candidate pair. Self-equi-join on (seed, minhash), deduplicated.

    -> doc_a, doc_b   (doc_a < doc_b)
    """
    a = signatures.select(
        F.col("doc_id").alias("doc_a"), "seed", "minhash"
    )
    b = signatures.select(
        F.col("doc_id").alias("doc_b"), "seed", "minhash"
    )
    return (
        a.join(b, ["seed", "minhash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def token_jaccard(left_tokens: str, right_tokens: str) -> Column:
    """Exact Jaccard similarity of two distinct-token array columns.

    |union| is derived as |a| + |b| - |intersect| (exact for the
    distinct arrays every caller passes) instead of materializing an
    ``array_union`` per pair: the union array was allocated and hashed
    only to take its size, doubling the per-pair set work in the verify
    stage (r14; guide §2.3 — the verify step is the largest slice of
    the minhash pipeline and runs once per candidate pair). Integer
    size math, so the double division is bit-identical.
    """
    i = F.size(F.array_intersect(F.col(left_tokens), F.col(right_tokens)))
    u = F.size(F.col(left_tokens)) + F.size(F.col(right_tokens)) - i
    return i.cast("double") / u


def minhash_dedup_pairs(
    docs: DataFrame,
    num_hashes: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.2,
    sort: bool = True,
) -> DataFrame:
    """MinHash+LSH near-dup pipeline: candidates from LSH buckets,
    verified with exact token-set Jaccard, thresholded.

    ``sort=False`` skips the presentation ORDER BY — consumers that
    re-aggregate the pairs (connected components) shouldn't pay a global
    sort for an order they immediately destroy.

    -> doc_a, doc_b, jaccard
    """
    sigs = minhash_signatures(docs, num_hashes, shingle_k)
    cands = lsh_candidate_pairs(sigs)
    toks = docs.select(
        "doc_id", F.array_distinct(tokens()).alias("tok_set")
    )
    pairs = (
        cands.join(toks.withColumnsRenamed({"doc_id": "doc_a", "tok_set": "ta"}), "doc_a")
        .join(toks.withColumnsRenamed({"doc_id": "doc_b", "tok_set": "tb"}), "doc_b")
        .select("doc_a", "doc_b", token_jaccard("ta", "tb").alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    return pairs.orderBy("doc_a", "doc_b") if sort else pairs


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash signature over token md5 nibbles.

    Each token contributes ±1 per bit position (bit from the first
    ``bits/4`` hex chars of md5(token), nibble decoded via strpos to stay
    engine-portable); the signature bit is 1 where the sum is positive.

    r14 shape (guide §2.3/§2.4): the per-bit ±1 sums are a fold over the
    doc's OWN token array — one map-side Project per document (md5 once
    per token into an array, then one pass accumulating all ``bits``
    counters via zip_with) — replacing the token explode + (doc_id
    groupBy) aggregation, whose exchange shuffled every token row. The
    per-bit integer sums are identical (same ±1 terms, integer
    addition), so signatures are bit-identical; docs with NULL text are
    filtered exactly as the old explode dropped them.

    -> doc_id, simhash (BIGINT)

    At 100 TB swap md5-nibble decoding for ``xxhash64`` (Spark built-in)
    — kept md5 here so the DuckDB oracle reproduces signatures exactly.
    """
    # per-token contribution to bit b, decoded from the md5 hex string h:
    # instr (1-based) exists with identical semantics in Spark and
    # DuckDB — decodes a hex nibble without engine-specific casts
    contribs = ", ".join(
        "(shiftright(instr('0123456789abcdef', "
        f"substr(h, {b // 4 + 1}, 1)) - 1, {b % 4}) % 2) * 2 - 1"
        for b in range(bits)
    )
    sums_expr = (
        "aggregate(transform(toks, t -> md5(t)), "
        f"array_repeat(0L, {bits}), "
        f"(acc, h) -> zip_with(acc, array({contribs}), "
        "(a, c) -> a + cast(c AS bigint)))"
    )
    sums = (
        docs.withColumn("toks", tokens())
        # split(NULL) is NULL: the old explode dropped those docs
        .filter(F.col("toks").isNotNull())
        .select("doc_id", F.expr(sums_expr).alias("_s"))
    )
    sig = None
    for b in range(bits):
        term = F.when(
            F.element_at("_s", b + 1) > 0, F.lit(1 << b)
        ).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sums.select("doc_id", sig.cast("long").alias("simhash"))


def simhash_blocks(bits: int, max_hamming: int) -> list[tuple[int, int]]:
    """(offset, width) of the ``max_hamming + 1`` bit blocks used for the
    pigeonhole band join. Widths differ by at most one when ``bits`` is
    not divisible by the block count.

    ``bits`` must cover one bit per block: a zero-width block would have
    mask ``(1 << 0) - 1 = 0``, making every document agree on it — the
    equi-join degenerates to an all-pairs product on a constant key."""
    nblocks = max_hamming + 1
    if bits < nblocks:
        raise ValueError(
            f"simhash bits={bits} must be >= max_hamming + 1 = {nblocks}: "
            "zero-width pigeonhole blocks would join all pairs"
        )
    base, rem = divmod(bits, nblocks)
    out, off = [], 0
    for i in range(nblocks):
        w = base + (1 if i < rem else 0)
        out.append((off, w))
        off += w
    return out


def simhash_dedup_pairs(
    docs: DataFrame,
    bits: int = 16,
    max_hamming: int = 3,
    block_cap: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance — banded pair join.

    Pigeonhole blocking: the signature is split into ``max_hamming + 1``
    bit blocks; any pair within Hamming distance ``max_hamming`` differs
    in at most ``max_hamming`` blocks, so it must agree EXACTLY on at
    least one block. Candidates are therefore a self-equi-join on
    ``(block_idx, block_value)`` — identical result set to the all-pairs
    join, never a cartesian product. At 100 TB each block key splits the
    corpus into ``2^width`` buckets; widen ``bits`` to keep buckets
    small (64-bit xxhash64 signatures -> 16-bit blocks).

    ``block_cap`` (None = exact, the default contract the DuckDB oracle
    checks) bounds block occupancy for adversarial corpora
    (mass-duplicated boilerplate, where every copy shares every block
    and the OUTPUT pair set itself grows ~R^2): within each
    ``(block_idx, block_value)`` bucket only the ``block_cap``
    lowest-``doc_id`` members (the bucket's "pivots") are eligible as
    ``doc_a``, so an R-occupancy bucket emits at most ``block_cap * R``
    candidates instead of ~R^2 — the same pivot bound as
    ``similarity.semdedup_pairs``/``knn_graph``. Capped output is a
    subset of the exact output; every member of an over-occupied bucket
    still pairs with the bucket's pivots, so duplicate-cluster
    connectivity (what dedup consumes pairs for) survives — only
    non-pivot/non-pivot edges inside one bucket are dropped. Buckets at
    or under ``block_cap`` are EXACTLY the uncapped result.

    -> doc_a, doc_b, hamming
    """
    return simhash_pairs_from_signatures(
        simhash(docs, bits), bits, max_hamming, block_cap
    )


def simhash_pairs_from_signatures(
    sig: DataFrame,
    bits: int = 16,
    max_hamming: int = 3,
    block_cap: int | None = None,
) -> DataFrame:
    """Banded pair join over a precomputed ``(doc_id, simhash)`` frame —
    the join half of :func:`simhash_dedup_pairs`, split out so consumers
    that need BOTH the exact and capped pair sets (``simhash_cap_recall``)
    compute the signature aggregation once."""
    block_vals = F.array(
        *[
            F.shiftright(F.col("simhash"), off).bitwiseAND(F.lit((1 << w) - 1))
            for off, w in simhash_blocks(bits, max_hamming)
        ]
    )
    banded = sig.select(
        "doc_id", "simhash", F.posexplode(block_vals).alias("blk", "blk_val")
    )
    a = banded
    if block_cap is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("blk", "blk_val").orderBy("doc_id")
        a = (
            banded.withColumn("prank", F.row_number().over(w))
            .filter(F.col("prank") <= block_cap)
            .drop("prank")
        )
    a = a.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"), "blk", "blk_val"
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"), "blk", "blk_val"
    )
    return (
        a.join(b, ["blk", "blk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        # no trailing orderBy: the sort's sampling job re-runs the
        # distinct's final stage (see jaccard_threshold_pairs note)
    )


def simhash_cap_recall(
    docs: DataFrame,
    bits: int = 16,
    max_hamming: int = 3,
    block_cap: int = 32,
) -> DataFrame:
    """Measured pair recall of the occupancy-capped simhash candidate
    generator against the exact banded contract — the same
    "measure, don't guess" discipline as :func:`lsh_recall_eval` applied to
    the ``block_cap`` scale knob. The capped pair set is a SUBSET of the
    exact one by construction (the cap only removes
    non-pivot/non-pivot edges inside over-occupied buckets), so
    precision is identically 1 and the one number that matters is how
    many exact pairs the bound gives up on live data; connectivity (what
    dedup consumes pairs for) is unaffected — every duplicate still
    pairs with its bucket's pivots (test_llmops.py).

    Both pair sets are banded joins (never all-pairs), so unlike
    ``lsh_recall_eval`` no sampling is needed: this is linear-ish in the
    corpus exactly like the generators it measures, and the signature
    aggregation is computed ONCE and shared by both sides.

    -> n_exact, n_capped, recall  (single row)
    """
    sig = simhash(docs, bits).localCheckpoint(eager=False)
    exact = simhash_pairs_from_signatures(sig, bits, max_hamming)
    capped = simhash_pairs_from_signatures(sig, bits, max_hamming, block_cap)
    return (
        exact.agg(F.count("*").alias("n_exact"))
        .crossJoin(capped.agg(F.count("*").alias("n_capped")))
        .select(
            "n_exact",
            "n_capped",
            F.round(
                F.when(
                    F.col("n_exact") > 0,
                    F.col("n_capped").cast("double") / F.col("n_exact"),
                ).otherwise(F.lit(1.0)),
                6,
            ).alias("recall"),
        )
    )


def duplicated_ngram_stats(docs: DataFrame, shingle_k: int = 5) -> DataFrame:
    """Per-document duplicated-span signal: the fraction of a document's
    DISTINCT word ``k``-grams that also occur in at least one other
    document (the corpus-level n-gram overlap signal behind exact
    substring deduplication — a document made mostly of spans seen
    elsewhere is boilerplate/copy even when no single whole-doc
    near-duplicate exists; cf. "Deduplicating Training Data Makes
    Language Models Better", Lee et al. 2022, for the span-level
    motivation).

    Shape (100 TB): shingles are hashed to 32-byte md5 keys before the
    one wide exchange; the cross-document occurrence count is a window
    over that hash — a single shuffle, partitions bounded by dup-cluster
    size (a globally hot shingle is an AQE skew case). The final per-doc
    rollup shuffles on doc_id. No join of the corpus against itself
    anywhere.

    -> doc_id, n_shingles, dup_shingles, dup_frac
    """
    from pyspark.sql import Window

    sh = (
        docs.withColumn("toks", tokens())
        .select(
            "doc_id",
            F.explode(F.array_distinct(shingles("toks", shingle_k))).alias("sh"),
        )
        .select("doc_id", F.md5("sh").alias("shh"))
    )
    # rows are (doc, distinct-shingle): count over the shingle-hash
    # partition IS the number of documents containing the shingle
    with_nd = sh.withColumn(
        "nd", F.count("*").over(Window.partitionBy("shh"))
    )
    return (
        with_nd.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias(
                "dup_shingles"
            ),
        )
        .select(
            "doc_id",
            "n_shingles",
            "dup_shingles",
            (
                F.col("dup_shingles").cast("double") / F.col("n_shingles")
            ).alias("dup_frac"),
        )
    )


def lsh_recall_eval(
    docs: DataFrame,
    sample_fraction: float = 0.1,
    num_hashes: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Measure the LSH candidate generator's RECALL against exact
    all-pairs ground truth on a deterministic sample — "measure, don't
    guess" for the approximate-contract queries (minhash / ngram /
    embedding dedup all document LSH recall; this query quantifies it
    on live data). Ground truth is every sample pair with token-set
    Jaccard >= ``threshold``; a truth pair is HIT when the band join
    would have proposed it. ``precision`` (hits / candidates) measures
    the other side of the trade — how much of the candidate set the
    verify stage throws away.

    The all-pairs comparison is a DELIBERATE bounded quadratic: it runs
    on the ``sample_fraction`` hash sample only (the same deterministic
    md5-prefix draw as ``sampling.deterministic_sample``), so its cost
    is (f*N)^2 — f is chosen so the sample is thousands of docs, not
    the corpus. At 100 TB you hold the SAMPLE SIZE constant (fraction
    shrinks as N grows); recall is a corpus-level statistic, it does
    not need the whole corpus.

    -> n_sample, n_truth, n_candidates, n_hit, recall, precision
       (single row)
    """
    # 5-wide lpad so the keep-all case (fraction=1 -> 0x10000) still
    # orders above every 4-hex prefix (same pattern as
    # sampling.mixture_equalize)
    prefix = F.lpad(
        F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4
        ),
        5,
        "0",
    )
    thr = format(int(16**4 * sample_fraction), "04x").rjust(5, "0")
    # lazy checkpoint: materialized inside the first consuming action
    # (not at DataFrame construction), then shared by the truth /
    # candidate / count branches
    sample = docs.filter(prefix < thr).localCheckpoint(eager=False)

    tsets = sample.select(
        "doc_id", F.array_distinct(tokens()).alias("tok_set")
    )
    a = tsets.select(
        F.col("doc_id").alias("doc_a"), F.col("tok_set").alias("ta")
    )
    b = tsets.select(
        F.col("doc_id").alias("doc_b"), F.col("tok_set").alias("tb")
    )
    truth = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            # |union| = |a| + |b| - |intersect| for distinct arrays —
            # same union-free verify as token_jaccard (r14)
            (
                F.size(F.array_intersect("ta", "tb")).cast("double")
                / (
                    F.size("ta") + F.size("tb")
                    - F.size(F.array_intersect("ta", "tb"))
                )
            ).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
        .select("doc_a", "doc_b")
    )
    cands = lsh_candidate_pairs(
        minhash_signatures(sample, num_hashes, shingle_k)
    )
    hits = truth.join(cands, ["doc_a", "doc_b"], "left_semi")
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


def remove_duplicate_spans(docs: DataFrame, shingle_k: int = 5) -> DataFrame:
    """Exact substring deduplication as a REWRITE (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    occurrence of a word ``k``-gram AFTER its global first occurrence
    (ordered by ``(doc_id, pos)``) marks its ``k`` token positions as
    duplicated; the document is re-emitted with the covered tokens
    removed. Unlike :func:`duplicated_ngram_stats` (which only scores
    documents) this produces the deduplicated corpus itself — the
    operator a training-data pipeline actually feeds to tokenization.

    Documents shorter than ``k`` tokens are treated as a single
    whole-document gram (same guard as :func:`shingles`), so short exact
    duplicates are removed entirely; the first occurrence of any span is
    always kept, so one full copy of every piece of content survives.

    Shape (100 TB): grams are hashed to 32-byte md5 keys before the one
    wide exchange; first-occurrence ranking is a window over the gram
    hash (partition sizes = duplication clusters — a globally hot
    boilerplate span is an AQE skew case). Covered positions and the
    token rows then shuffle on ``(doc_id, pos)`` for a co-partitioned
    LEFT ANTI join, and the rebuild aggregates on ``doc_id``. The corpus
    is never joined against itself row-by-row; per-doc ``collect_list``
    is bounded by document length (the floor for any whole-doc rewrite).

    -> doc_id, n_tokens, n_kept, n_removed, text_dedup
    """
    from pyspark.sql import Window

    k = shingle_k
    toks_df = docs.withColumn("toks", tokens())
    grams = (
        toks_df.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"CASE WHEN size(toks) < {k} THEN "
                    "array(named_struct("
                    "'pos', 0, 'gram', array_join(toks, ' '), "
                    "'span', size(toks))) "
                    f"ELSE transform(sequence(0, size(toks) - {k}), "
                    "i -> named_struct('pos', i, "
                    f"'gram', concat_ws(' ', slice(toks, i + 1, {k})), "
                    f"'span', {k})) END"
                )
            ).alias("g"),
        )
        .select(
            "doc_id",
            F.col("g.pos").alias("pos"),
            F.md5(F.col("g.gram")).alias("gh"),
            F.col("g.span").alias("span"),
        )
    )
    w = Window.partitionBy("gh").orderBy("doc_id", "pos")
    dups = grams.withColumn("rn", F.row_number().over(w)).filter("rn > 1")
    covered = dups.select(
        "doc_id",
        F.explode(F.expr("sequence(pos, pos + span - 1)")).alias("pos"),
    ).distinct()
    tok_rows = toks_df.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    )
    kept = tok_rows.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text_dedup"),
    )
    base = toks_df.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    shingle_k: int = 3,
    top_n: int = 20,
    num_hashes: int = 8,
) -> DataFrame:
    """N-gram Jaccard near-dup, LSH-bucketed: candidate pairs come from
    the MinHash band join (:func:`lsh_candidate_pairs` over the same
    word k-shingles), restricted to the same ``(lang, source)`` block,
    then exact Jaccard on distinct shingle sets ranks the top-N pairs.

    Candidate generation is part of the operator contract (mirrored in
    the DuckDB oracle), exactly as in :func:`minhash_dedup_pairs` — the
    quadratic within-block join is gone; every join here is an
    equi-join whose key space is uniform by construction.

    RECALL: a pair reaches the top-N only if it shares >= 1 of the
    ``num_hashes`` minhash slots; for shingle-Jaccard ``s`` that is
    ``P[candidate] = 1 - (1 - s)^num_hashes`` (~0.83 at s=0.2, ~0.996 at
    s=0.5 with the default 8 slots) — the standard LSH trade: a highly
    similar pair absent from every slot is silently missed, so the
    "top-N most similar" is over CANDIDATES, not all pairs. Raise
    ``num_hashes`` to push recall toward 1.

    -> doc_a, doc_b, jaccard
    """
    base = docs.withColumn("toks", tokens()).select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(shingles("toks", shingle_k)).alias("grams"),
    )
    cands = lsh_candidate_pairs(minhash_signatures(docs, num_hashes, shingle_k))
    a = base.select(
        F.col("doc_id").alias("doc_a"),
        "lang",
        "source",
        F.col("grams").alias("ga"),
    )
    b = base.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("source").alias("source_b"),
        F.col("grams").alias("gb"),
    )
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(
            (F.col("lang") == F.col("lang_b"))
            & (F.col("source") == F.col("source_b"))
        )
        .select("doc_a", "doc_b", token_jaccard("ga", "gb").alias("jaccard"))
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(top_n)
    )


# --------------------------------------------------------------------------
# EXACT-threshold set-similarity self-join with prefix filtering — the
# guaranteed-complete counterpart of the approximate (minhash/simhash)
# pair generators above. Prefix filtering (Chaudhuri, Ganti, Kaushik,
# "A primitive operator for similarity joins in data cleaning",
# ICDE'06; the ordering/length-filter refinements are the PPJoin family,
# Xiao et al. WWW'08): under a GLOBAL canonical token order, two sets
# with Jaccard >= t must share a token within each side's first
# |x| - ceil(t*|x|) + 1 tokens — so the candidate join touches only
# those short prefixes, and ordering tokens by ascending document
# frequency makes prefixes the RAREST tokens, collapsing the candidate
# count on natural (Zipfian) corpora.
# --------------------------------------------------------------------------

# Registry/oracle threshold. The synthetic corpus draws every document
# from ONE small shared vocabulary, which is this operator's documented
# adversarial case: TRUE pair count at moderate thresholds grows
# quadratically with corpus size (190k pairs at t=0.95 / sf0.1), so the
# committed query runs at the near-identity threshold where the output
# stays output-shaped-sane (444 pairs at sf0.01, 36k at sf0.1). On a
# Zipfian real-world corpus the prefix+positional filters keep ordinary
# thresholds (0.7-0.9) cheap — that is the point of the operator.
PPJOIN_THRESHOLD = 0.98


def jaccard_threshold_pairs(
    docs: DataFrame,
    threshold: float = PPJOIN_THRESHOLD,
    block_cap: int | None = None,
) -> DataFrame:
    """All document pairs whose DISTINCT-token-set Jaccard similarity
    is >= ``threshold`` — exact (no recall loss, unlike minhash/LSH),
    with the quadratic candidate space cut by the prefix filter.

    Plan: (1) one distinct (doc_id, token) projection feeds set sizes,
    global token document frequencies, and verification; (2) per-doc
    prefixes = the first ``n - ceil(t*n) + 1`` tokens in (df, token)
    order — a doc-partitioned window whose partitions are single
    documents' token sets; (3) the candidate join equi-joins PREFIX
    tokens only, applies the length filter (``|a| >= ceil(t*|b|)`` both
    ways) and the PPJoin positional filter, and (4) the verify step
    counts true intersections via one token equi-join and filters on
    the exact Jaccard.

    Shape (100 TB): no all-pairs anything — candidates are bounded by
    prefix-token co-occurrence, which df-ascending ordering keeps small
    on Zipfian corpora (the rarest ~10% of each doc's tokens). The
    adversarial corpus (mass-duplicated docs ⇒ every prefix collides)
    degrades toward the true output size, which is itself quadratic in
    the duplicate clique — same output-shaped growth as exact simhash.
    ``block_cap`` is the same OPT-IN occupancy bound those operators
    carry: within each prefix-token bucket only the ``block_cap``
    lowest-doc_id PIVOTS pair against the bucket, so candidates are
    ~N·cap instead of ~N² while every member still reaches its
    bucket's pivots (cluster connectivity survives; a pair can be
    missed only when BOTH endpoints are non-pivots in every shared
    prefix bucket — default None keeps the exact oracle-checked
    contract). Determinism: IEEE double ceil/divide decisions are
    identical in both engines for identical expressions.

    -> doc_a, doc_b, inter_tokens, size_a, size_b, jaccard
    """
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens())).alias("token")
    ).localCheckpoint(eager=False)
    sizes = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    dfreq = toks.groupBy("token").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "token")
    prefix = (
        toks.join(dfreq, "token")
        .join(sizes, "doc_id")
        .withColumn("pr", F.row_number().over(w))
        .filter(
            F.col("pr")
            <= F.col("n") - F.ceil(F.col("n") * F.lit(threshold)) + 1
        )
        .select("doc_id", "token", "n", "pr")
        # both sides of the candidate self-join consume this — without
        # the (lazy) checkpoint the df-join + window subtree runs twice
        .localCheckpoint(eager=False)
    )
    # positional filter (PPJoin, Xiao et al. WWW'08 — exact, results
    # unchanged): a match at prefix positions (pa, pb) bounds the
    # total overlap by 1 + min(na - pa, nb - pb), which must reach the
    # Jaccard-equivalent overlap requirement ceil(t*(na+nb)/(1+t)).
    # On vocabulary-saturated corpora (where every prefix token is
    # common) this is the filter that actually cuts the candidate
    # join — at t=0.95 with equal sizes only position-1 (rarest-token)
    # matches survive.
    alpha = F.ceil(
        (F.col("size_a") + F.col("size_b"))
        * F.lit(threshold / (1.0 + threshold))
    )
    left = prefix
    if block_cap is not None:
        wb = Window.partitionBy("token").orderBy("doc_id")
        left = (
            prefix.withColumn("prank", F.row_number().over(wb))
            .filter(F.col("prank") <= block_cap)
            .drop("prank")
        )
    cand = (
        left.alias("a")
        .join(prefix.alias("b"), "token")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("size_a"),
            F.col("b.n").alias("size_b"),
            F.col("a.pr").alias("pa"),
            F.col("b.pr").alias("pb"),
        )
        .filter(F.col("size_a") >= F.ceil(F.col("size_b") * F.lit(threshold)))
        .filter(F.col("size_b") >= F.ceil(F.col("size_a") * F.lit(threshold)))
        .filter(
            F.lit(1)
            + F.least(
                F.col("size_a") - F.col("pa"), F.col("size_b") - F.col("pb")
            )
            >= alpha
        )
        .select("doc_a", "doc_b", "size_a", "size_b")
        .distinct()
    )
    # exact-intersection verify on ARRAYS (r13): attaching each side's
    # distinct-token array to the (already small) candidate-pair
    # relation and intersecting per pair replaces the former exploded
    # 3-way join — |cand| x avg-tokens-per-doc rows through two shuffles
    # and a groupBy — with two candidate-pair-sized joins and a map-side
    # JVM array_intersect. Counts are identical by construction (both
    # sides are distinct token sets, and every candidate pair shares at
    # least its matched prefix token, so no zero-intersection rows are
    # introduced).
    tok_arrays = docs.select(
        "doc_id", F.array_distinct(tokens()).alias("ts")
    )
    inter = (
        cand.join(
            tok_arrays.withColumnsRenamed({"doc_id": "doc_a", "ts": "ta"}),
            "doc_a",
        )
        .join(
            tok_arrays.withColumnsRenamed({"doc_id": "doc_b", "ts": "tb"}),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "size_a",
            "size_b",
            F.size(F.array_intersect("ta", "tb"))
            .cast("long")
            .alias("inter_tokens"),
        )
    )
    jac = F.col("inter_tokens").cast("double") / (
        F.col("size_a") + F.col("size_b") - F.col("inter_tokens")
    ).cast("double")
    return (
        inter.filter(jac >= threshold)
        .select(
            "doc_a",
            "doc_b",
            "inter_tokens",
            "size_a",
            "size_b",
            # exact round-half-up parts-per-million in pure integer
            # arithmetic — no derived DOUBLE ever reaches a value-hash
            # (the markov prob_ppm pattern; float sweep, round 7)
            F.expr(
                "CAST((CAST(inter_tokens AS DECIMAL(38,0)) * 2000000"
                " + (size_a + size_b - inter_tokens))"
                " DIV (2 * CAST(size_a + size_b - inter_tokens"
                " AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        # no trailing orderBy (round 7): the global sort's
        # RangePartitioner runs a SAMPLING job that re-executes the
        # final intersection-aggregation stage before the real pass —
        # measured 3.9s -> 6.8s on an un-materialized 35k-row result at
        # sf0.1, and at 100 TB it doubles the most expensive stage for
        # purely cosmetic row order (the gate compares order-free; the
        # phrase_search precedent documents the same rule)
    )
