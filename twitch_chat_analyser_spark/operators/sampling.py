"""Deterministic corpus-selection operators for training-data pipelines:
Bernoulli sampling, train/test splitting, per-group stratified sampling,
and TF-IDF term extraction over the ``documents`` table.

All selection is hash-based (md5 of the document id), never RNG-based:
the sample a row belongs to is a pure function of the row, so the
operators are idempotent across retries/reruns, need no driver-side
state or seed plumbing, and produce identical results in the DuckDB
oracle (md5 hex is identical in both engines).

Scale notes (100 TB): every operator here is a narrow projection +
filter over the corpus — no join, no shuffle, no skew — except the
stratified sampler (one shuffle on the small group key) and TF-IDF's
document-frequency join (token-keyed aggregation; the df side is
``O(vocabulary)``, small enough to broadcast back). Hash-threshold
sampling composes with predicate pushdown: the md5 filter runs in the
scan stage, so a 1 % sample reads all rows but materializes ~1 %.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 4-hex-digit hash prefix -> 65536 evenly-sized cells. A fraction maps
# to a prefix threshold; comparison is plain string ordering on the
# lowercase hex, identical in Spark and DuckDB.
HASH_CELLS = 16 * 16 * 16 * 16


def _hash_prefix(col: str = "doc_id"):
    return F.substring(F.md5(F.col(col).cast("string").cast("binary")), 1, 4)


def hash_threshold(fraction: float) -> str:
    """Hex prefix threshold selecting ~``fraction`` of the id space.

    The keep-all edge (review r10): ``fraction >= 1`` used to format as
    the 5-char ``"10000"``, which string-compares BELOW most 4-char hex
    prefixes (``"abcd" > "10000"``) and silently kept only ~6 % of
    rows. ``"g"`` sorts above every hex prefix, so ``hp < "g"`` keeps
    everything; negative fractions clamp to keep-nothing."""
    cells = int(HASH_CELLS * fraction)
    if cells >= HASH_CELLS:
        return "g"
    return format(max(cells, 0), "04x")


def deterministic_sample(docs: DataFrame, fraction: float) -> DataFrame:
    """Hash-Bernoulli sample: keep a document iff the md5 prefix of its
    id falls below the fraction threshold. Membership is stable across
    runs and across engines — the property RNG ``df.sample`` lacks.

    -> doc_id, lang, source
    """
    return (
        docs.withColumn("hp", _hash_prefix())
        .filter(F.col("hp") < hash_threshold(fraction))
        .select("doc_id", "lang", "source")
    )


def train_test_split(docs: DataFrame, train_fraction: float = 0.8) -> DataFrame:
    """Deterministic split assignment: every document gets a stable
    'train' / 'test' label from its id hash. Documents added later keep
    existing assignments unchanged (no reshuffling on corpus growth).

    -> doc_id, split
    """
    thr = hash_threshold(train_fraction)
    return docs.select(
        "doc_id",
        F.when(_hash_prefix() < thr, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def stratified_sample(docs: DataFrame, per_group: int = 50) -> DataFrame:
    """Equal-quota stratified sample: the ``per_group`` documents with
    the smallest id-hash per language — a deterministic uniform draw
    within each stratum (hash order is uncorrelated with content).

    One shuffle on the language key; with heavy strata the window sort
    is the cost, so at 100 TB pre-filter with a generous hash threshold
    (e.g. 10x the quota / stratum size) before ranking.

    -> doc_id, lang, strat_rank
    """
    w = Window.partitionBy("lang").orderBy("hp", "doc_id")
    return (
        docs.withColumn("hp", _hash_prefix())
        .withColumn("strat_rank", F.row_number().over(w))
        .filter(F.col("strat_rank") <= per_group)
        .select("doc_id", "lang", "strat_rank")
    )


TFIDF_TOP_N = 3


def tfidf_top_terms(docs: DataFrame, top_n: int = TFIDF_TOP_N) -> DataFrame:
    """Top terms per document by term frequency, scored with TF-IDF
    (``tf * ln(N/df)``). Ranking uses only integer keys
    (tf desc, df asc, token asc) so result membership never depends on
    float rounding; the tfidf score is carried as a value column,
    quantized ONCE to a micro-unit BIGINT — JVM and DuckDB libm ``ln``
    differ in the last ulp, so a raw DOUBLE here hash-flakes (float
    sweep, round 7).

    Plan: one token-explode aggregation for tf, one reaggregation for
    df, one join back on token, and a per-document top-n window (no
    skew: bounded tokens per document). The df side is NOT
    broadcast-hinted (review r12): the distinct-token set grows with
    the corpus (ids, typos, noise — same reasoning as
    textops.unigram_surprise), so a forced broadcast OOMs the driver at
    scale; AQE broadcasts it at runtime whenever it is actually small,
    and splits the Zipf-head token partitions when it is not.

    -> doc_id, token, tf, df, tfidf_micro, term_rank
    """
    from .dedup import tokens

    tok = docs.select("doc_id", F.explode(tokens()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = docs.select(
        F.count("*").cast("double").alias("n_docs")
    )
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")) * 1_000_000,
                0,
            )
            .cast("long")
            .alias("tfidf_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("token")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= top_n)
    )


def mixture_equalize(docs: DataFrame) -> DataFrame:
    """Domain-mixture resampling: deterministically downsample each
    ``source`` so the surviving corpus has a uniform source mixture
    (the per-source keep probability is ``min_count / count_s``; the
    smallest source keeps everything). The per-row decision is the same
    hash-Bernoulli draw as :func:`deterministic_sample`, with the
    threshold computed IN the plan from the per-source counts — no
    driver round-trip, no collect.

    Scale shape: one tiny per-source aggregate (|sources| rows,
    broadcast back) + a narrow filter over the corpus.

    Thresholds compare as 5-hex-digit strings so the keep-all case
    (p = 1 -> 0x10000) still orders above every 4-digit hash prefix.

    -> doc_id, source
    """
    counts = docs.groupBy("source").agg(F.count("*").alias("n_s"))
    min_n = counts.agg(F.min("n_s").alias("min_n"))
    thresholds = (
        counts.crossJoin(F.broadcast(min_n))
        .select(
            "source",
            F.lpad(
                F.lower(
                    F.hex(
                        F.floor(
                            F.col("min_n").cast("double")
                            / F.col("n_s")
                            * HASH_CELLS
                        ).cast("long")
                    )
                ),
                5,
                "0",
            ).alias("thr"),
        )
    )
    return (
        docs.withColumn("hp5", F.lpad(_hash_prefix(), 5, "0"))
        .join(F.broadcast(thresholds), "source")
        .filter(F.col("hp5") < F.col("thr"))
        .select("doc_id", "source")
    )


def mixture_temperature(
    docs: DataFrame, tau: float = 0.5, budget_fraction: float = 0.5
) -> DataFrame:
    """Temperature-scaled domain mixture (the XLM-R / multilingual-LM
    resampling rule): the target share of source ``i`` is
    ``n_i^tau / sum_j n_j^tau`` — ``tau=1`` keeps the natural mixture,
    ``tau->0`` approaches uniform, between the two it up-weights small
    domains without flattening them. Given a total budget of
    ``floor(N * budget_fraction)`` documents, each source keeps
    ``min(1, B * n_i^(tau-1) / sum_j n_j^tau)`` of its rows via the
    same deterministic hash-Bernoulli threshold as
    :func:`mixture_equalize` — membership is a pure function of doc_id.

    ``tau=0.5`` (the classic value) is computed with ``sqrt``, which is
    IEEE-correctly-rounded in both Spark and DuckDB — the oracle is
    bit-exact; other ``tau`` go through ``pow`` (last-ulp libm drift
    possible, harmless away from threshold-cell boundaries).

    Scale shape: one |sources|-row aggregate + a 1-row total, broadcast
    back; a narrow filter over the corpus. No driver round-trip.

    -> doc_id, source
    """
    w = (
        F.sqrt(F.col("n_s").cast("double"))
        if tau == 0.5
        else F.pow(F.col("n_s").cast("double"), F.lit(tau))
    )
    counts = docs.groupBy("source").agg(F.count("*").alias("n_s"))
    tot = counts.agg(
        F.sum("n_s").alias("n_tot"), F.sum(w).alias("z")
    )
    # B * q_i / n_i with q_i = w_i / Z  ->  B * w_i / (Z * n_i)
    rate = F.least(
        F.lit(1.0),
        F.floor(F.col("n_tot") * budget_fraction)
        * w
        / (F.col("z") * F.col("n_s")),
    )
    thresholds = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        F.lpad(
            F.lower(F.hex(F.floor(rate * HASH_CELLS).cast("long"))),
            5,
            "0",
        ).alias("thr"),
    )
    return (
        docs.withColumn("hp5", F.lpad(_hash_prefix(), 5, "0"))
        .join(F.broadcast(thresholds), "source")
        .filter(F.col("hp5") < F.col("thr"))
        .select("doc_id", "source")
    )


def epoch_shuffle(docs: DataFrame, epoch: int = 0) -> DataFrame:
    """Deterministic global training-order shuffle: every document gets
    an exact global position for the given epoch, ordered by the md5 of
    ``epoch:doc_id``. Re-keying per epoch gives each epoch an
    independent permutation; the order is a pure function of (epoch,
    doc_id) — reproducible across runs, engines, and partial reruns,
    which RNG-based ``orderBy(rand(seed))`` is not (rand is seeded per
    partition, so the order changes with the partitioning).

    The total order is computed DISTRIBUTED via
    ``analytics.global_row_number`` (range partition on the hash key —
    uniform by construction, zero skew — then per-partition rank +
    prefix offsets); no partition-less window ever sees the corpus. A
    writer materializing the epoch order would range-partition on the
    same key and ``sortWithinPartitions``, giving globally sorted output
    files without a global sort.

    -> doc_id, shuffle_rank (1-based BIGINT position in the epoch order)
    """
    from .analytics import global_row_number

    key = F.md5(
        F.concat(
            F.lit(f"epoch{epoch}:"), F.col("doc_id").cast("string")
        ).cast("binary")
    )
    return global_row_number(
        docs.select("doc_id").withColumn("_sk", key),
        [F.asc("_sk"), F.asc("doc_id")],
        out="shuffle_rank",
    ).select("doc_id", "shuffle_rank")


def k_per_group_sample(
    docs: DataFrame, k: int = 25, group_col: str = "source"
) -> DataFrame:
    """Fixed-size per-stratum sample: exactly ``min(k, |group|)`` rows
    per group, chosen in deterministic hash order (the "give me 1000
    docs per domain for eval" primitive). Unlike rate-based
    :func:`stratified_sample` the output size per group is exact, and
    unlike a reservoir it is reproducible across runs, engines, and
    reruns of any subset of the data.

    Shape (100 TB): one window partitioned by the group — bounded
    partitions, no global sort. A group too large for one task is the
    standard skew case (AQE); the hash rank needs no pre-aggregation.

    -> doc_id, <group_col>, pick_rank
    """
    w = Window.partitionBy(group_col).orderBy(
        F.asc(_hash_prefix()), F.asc("doc_id")
    )
    return (
        docs.select("doc_id", group_col)
        .withColumn("pick_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("pick_rank") <= k)
    )


def quality_top_fraction(
    docs: DataFrame, keep_fraction: float = 0.5
) -> DataFrame:
    """Per-source quality-percentile filter: keep the top
    ``keep_fraction`` of each source's documents by heuristic quality
    score (C4/Gopher-style cheap filtering, applied per domain so a
    low-quality-on-average source is trimmed, not obliterated, and a
    high-quality source isn't kept wholesale).

    The cutoff is exact — ``rank <= ceil(n_source * keep_fraction)``
    with a deterministic (score desc, doc_id) tie-break — so membership
    is stable and engine-portable. One shuffle on ``source``; the rank
    and the per-source count come from the SAME partitioned window, so
    there is no second pass. ``source`` rides through the scorer's own
    projection (``quality_score(extra_cols=...)``) instead of a second
    corpus-sized join back onto ``docs`` (review r12 — that join was a
    whole avoidable shuffle of the corpus). Source cardinality is small
    and bounded; a skewed giant source is an AQE skew case, not a plan
    change.

    -> doc_id, source, quality_score, q_rank
    """
    from .textops import quality_score

    scored = quality_score(docs, extra_cols=("source",)).select(
        "doc_id", "source", "quality_score"
    )
    w = Window.partitionBy("source")
    rank = F.row_number().over(
        w.orderBy(F.desc("quality_score"), F.asc("doc_id"))
    )
    n_s = F.count("*").over(w)
    return (
        scored.select(
            "doc_id",
            "source",
            "quality_score",
            rank.alias("q_rank"),
            n_s.alias("_ns"),
        )
        .filter(
            F.col("q_rank")
            <= F.ceil(F.col("_ns") * F.lit(keep_fraction)).cast("long")
        )
        .select(
            "doc_id", "source", "quality_score",
            F.col("q_rank").cast("int").alias("q_rank"),
        )
    )


def group_safe_split(docs: DataFrame, train_fraction: float = 0.8) -> DataFrame:
    """Leakage-safe train/test split: the split key is the CONTENT
    fingerprint (md5 of whitespace-normalized text), not the document
    id — exact duplicates always land on the same side, so the test set
    can never contain a verbatim copy of a training document (the
    classic contamination hole in id-hash splits).

    Pure narrow projection + filter (the fingerprint is already a
    uniform hash, its prefix is the Bernoulli draw). For NEAR-duplicate
    safety, substitute the cluster id from
    ``graph.dedup_clusters`` as the group key — same shape, one extra
    join.

    -> doc_id, content_hash, split
    """
    from .dedup import norm_text

    thr = hash_threshold(train_fraction)
    fp = F.md5(norm_text())
    return docs.select(
        "doc_id",
        fp.alias("content_hash"),
        F.when(F.substring(fp, 1, 4) < thr, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


# --------------------------------------------------------------------------
# registry entries
# --------------------------------------------------------------------------

SAMPLE_FRACTION = 0.25
TRAIN_FRACTION = 0.8
MIXTURE_BUDGET_FRACTION = 0.5
STRATA_QUOTA = 50
SHUFFLE_EPOCH = 1
TOKEN_BUDGET_PER_SOURCE = 5_000
QUALITY_KEEP_FRACTION = 0.5
WEIGHTED_SAMPLE_K = 100


def weighted_sample(
    docs: DataFrame, k: int = 100, weight_col: str = "n_chars"
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — Efraimidis–Spirakis
    A-Res (Inf. Proc. Letters 97(5), 2006): every row gets the key
    ``ln(u) / w`` (monotone transform of ``u^(1/w)``) with ``u`` a
    deterministic md5-uniform of the document id; the sample is the
    global top-``k`` by key. Inclusion probability is proportional to
    weight, the draw is a pure function of the row (idempotent across
    retries, identical in the oracle), and selection is a single
    TakeOrderedAndProject — each executor keeps a local k-heap, the
    driver merges 32 heaps; no shuffle of the corpus. This IS
    distributed reservoir sampling: the "reservoir" is the top-k heap,
    and per-partition reservoirs merge associatively.

    Keys are rounded to 12 dp before ranking so the ``ln`` ulp can
    never differ across engines; ties (measure-zero) break by doc_id.

    -> doc_id, weight, es_key, rank
    """
    h = F.conv(
        F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + 0.5) / float(1 << 32)
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 12)
    topk = (
        docs.select(
            "doc_id",
            F.col(weight_col).cast("long").alias("weight"),
            key.alias("es_key"),
        )
        .orderBy(F.desc("es_key"), "doc_id")
        .limit(k)
    )
    # rank over the k survivors only — bounded single-partition window,
    # the staged pattern (TakeOrderedAndProject first, then rank)
    return topk.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("es_key"), "doc_id")),
    )


def _q_sample(spark, sf_dir):
    from .. import ingest

    return deterministic_sample(
        ingest.load(spark, sf_dir, "documents"), SAMPLE_FRACTION
    )


def _q_split(spark, sf_dir):
    from .. import ingest

    return train_test_split(ingest.load(spark, sf_dir, "documents"), TRAIN_FRACTION)


def _q_stratified(spark, sf_dir):
    from .. import ingest

    return stratified_sample(ingest.load(spark, sf_dir, "documents"), STRATA_QUOTA)


def _q_tfidf(spark, sf_dir):
    from .. import ingest

    return tfidf_top_terms(ingest.load(spark, sf_dir, "documents"))


def _q_mixture(spark, sf_dir):
    from .. import ingest

    return mixture_equalize(ingest.load(spark, sf_dir, "documents"))


K_PER_GROUP = 25


def _q_k_per_group(spark, sf_dir):
    from .. import ingest

    return k_per_group_sample(
        ingest.load(spark, sf_dir, "documents"), K_PER_GROUP, "source"
    )


def _q_mixture_temperature(spark, sf_dir):
    from .. import ingest

    return mixture_temperature(
        ingest.load(spark, sf_dir, "documents"),
        tau=0.5,
        budget_fraction=MIXTURE_BUDGET_FRACTION,
    )


def _q_token_budget(spark, sf_dir):
    from .. import ingest

    return token_budget_sample(
        ingest.load(spark, sf_dir, "documents"), TOKEN_BUDGET_PER_SOURCE
    )


def _q_epoch_shuffle(spark, sf_dir):
    from .. import ingest

    return epoch_shuffle(
        ingest.load(spark, sf_dir, "documents"), SHUFFLE_EPOCH
    )


def _q_quality_filter(spark, sf_dir):
    from .. import ingest

    return quality_top_fraction(
        ingest.load(spark, sf_dir, "documents"), QUALITY_KEEP_FRACTION
    )


def _q_group_safe_split(spark, sf_dir):
    from .. import ingest

    return group_safe_split(
        ingest.load(spark, sf_dir, "documents"), TRAIN_FRACTION
    )


def _q_weighted(spark, sf_dir):
    from .. import ingest

    return weighted_sample(
        ingest.load(spark, sf_dir, "documents"), WEIGHTED_SAMPLE_K
    )


SAMPLING_QUERIES = {
    "sample_weighted_reservoir": _q_weighted,
    "sample_deterministic": _q_sample,
    "sample_train_test_split": _q_split,
    "sample_stratified": _q_stratified,
    "tfidf_top_terms": _q_tfidf,
    "sample_mixture_equalize": _q_mixture,
    "sample_temperature_mixture": _q_mixture_temperature,
    "sample_k_per_group": _q_k_per_group,
    "sample_epoch_shuffle": _q_epoch_shuffle,
    "sample_quality_top_fraction": _q_quality_filter,
    "sample_group_safe_split": _q_group_safe_split,
    "sample_token_budget": _q_token_budget,
}
# _q_dsir is defined below the dict (the DSIR section sits at the end of
# the module); registration happens right after its definition.


def sampling_oracles() -> dict[str, str]:
    from .llmops import quality_sql_parts

    dsir = {"sample_dsir_importance": dsir_oracle_sql()}

    thr_sample = hash_threshold(SAMPLE_FRACTION)
    thr_train = hash_threshold(TRAIN_FRACTION)
    # single source of truth for the quality formula (llmops shares it
    # with text_quality_score and corpus_prep)
    q_base, q_score = quality_sql_parts()
    quality_cte = f"""{q_base},
quality AS (
    SELECT b.doc_id, {q_score} AS quality_score
    FROM qbase b JOIN per_doc p USING (doc_id)
)"""
    extra = {
        "sample_weighted_reservoir": f"""
WITH keyed AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
           round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                     + 0.5) / 4294967296.0)
                 / CAST(n_chars AS DOUBLE), 12) AS es_key
    FROM documents
)
SELECT doc_id, weight, es_key,
       CAST(row_number() OVER (ORDER BY es_key DESC, doc_id) AS INT) AS rank
FROM keyed
ORDER BY es_key DESC, doc_id
LIMIT {WEIGHTED_SAMPLE_K}""",
        "sample_epoch_shuffle": f"""
SELECT doc_id,
       row_number() OVER (
           ORDER BY md5('epoch{SHUFFLE_EPOCH}:' || CAST(doc_id AS VARCHAR)),
                    doc_id
       ) AS shuffle_rank
FROM documents""",
        "sample_quality_top_fraction": f"""
WITH {quality_cte},
ranked AS (
    SELECT d.doc_id, d.source, q.quality_score,
        CAST(row_number() OVER w AS INT) AS q_rank,
        count(*) OVER (PARTITION BY d.source) AS n_s
    FROM documents d JOIN quality q USING (doc_id)
    WINDOW w AS (PARTITION BY d.source
                 ORDER BY q.quality_score DESC, d.doc_id ASC)
)
SELECT doc_id, source, quality_score, q_rank
FROM ranked
WHERE q_rank <= CAST(ceil(n_s * {QUALITY_KEEP_FRACTION}) AS BIGINT)""",
        "sample_token_budget": f"""
WITH sized AS (
    SELECT doc_id, source,
           CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS hp
    FROM documents
),
runs AS (
    SELECT doc_id, source, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY hp, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS tokens_before
    FROM sized
)
SELECT doc_id, source, n_tokens, tokens_before
FROM runs WHERE tokens_before < {TOKEN_BUDGET_PER_SOURCE}""",
        "sample_group_safe_split": f"""
WITH fp AS (
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               AS content_hash
    FROM documents
)
SELECT doc_id, content_hash,
       CASE WHEN substr(content_hash, 1, 4) < '{thr_train}'
            THEN 'train' ELSE 'test' END AS split
FROM fp""",
    }
    return extra | dsir | {
        "sample_deterministic": f"""
SELECT doc_id, lang, source FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{thr_sample}'""",
        "sample_train_test_split": f"""
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{thr_train}'
            THEN 'train' ELSE 'test' END AS split
FROM documents""",
        "sample_stratified": f"""
WITH hashed AS (
    SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS hp
    FROM documents
)
SELECT doc_id, lang, strat_rank FROM (
    SELECT doc_id, lang, CAST(row_number() OVER (
        PARTITION BY lang ORDER BY hp, doc_id) AS INT) AS strat_rank
    FROM hashed
) WHERE strat_rank <= {STRATA_QUOTA}""",
        "tfidf_top_terms": f"""
WITH doc_tokens AS (
    SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
    FROM documents
),
tf AS (
    SELECT doc_id, token, count(*) AS tf FROM doc_tokens GROUP BY 1, 2
),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.token, tf.tf, df.df,
           CAST(round(tf.tf * ln(n.n_docs / df.df) * 1000000, 0) AS BIGINT)
               AS tfidf_micro
    FROM tf JOIN df USING (token) CROSS JOIN n
)
SELECT doc_id, token, tf, df, tfidf_micro, term_rank FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY doc_id ORDER BY tf DESC, df ASC, token ASC) AS INT
    ) AS term_rank
    FROM scored
) WHERE term_rank <= {TFIDF_TOP_N}""",
        "sample_mixture_equalize": """
WITH counts AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
mn AS (SELECT min(n_s) AS min_n FROM counts),
thresholds AS (
    SELECT source,
           lpad(lower(to_hex(CAST(floor(CAST(min_n AS DOUBLE) / n_s * 65536)
                AS BIGINT))), 5, '0') AS thr
    FROM counts CROSS JOIN mn
)
SELECT doc_id, d.source
FROM documents d
JOIN thresholds t ON t.source = d.source
WHERE lpad(substr(md5(CAST(doc_id AS VARCHAR)), 1, 4), 5, '0') < t.thr""",
        "sample_k_per_group": f"""
SELECT doc_id, source, pick_rank FROM (
    SELECT doc_id, source,
           CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 4),
                        doc_id) AS INT) AS pick_rank
    FROM documents
) WHERE pick_rank <= {K_PER_GROUP}""",
        # tau=0.5 via sqrt (correctly rounded in both engines); same
        # B * w / (Z * n_s) expression tree as mixture_temperature
        "sample_temperature_mixture": f"""
WITH counts AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
tot AS (SELECT sum(n_s) AS n_tot,
               sum(sqrt(CAST(n_s AS DOUBLE))) AS z
        FROM counts),
thresholds AS (
    SELECT source,
           lpad(lower(to_hex(CAST(floor(least(1.0,
                floor(CAST(n_tot AS DOUBLE) * {MIXTURE_BUDGET_FRACTION})
                    * sqrt(CAST(n_s AS DOUBLE)) / (z * n_s))
                * 65536) AS BIGINT))), 5, '0') AS thr
    FROM counts CROSS JOIN tot
)
SELECT doc_id, d.source
FROM documents d
JOIN thresholds t ON t.source = d.source
WHERE lpad(substr(md5(CAST(doc_id AS VARCHAR)), 1, 4), 5, '0') < t.thr""",
    }


def token_budget_sample(
    docs: DataFrame, budget_per_source: int | None = None
) -> DataFrame:
    """Token-budget corpus selection: per source, admit documents in
    deterministic hash order until the source's token budget is
    exhausted (the doc that crosses the line is still admitted — every
    source with data contributes at least one document). The mixture
    knob for "N billion tokens per domain" corpus specs.

    All-integer arithmetic (token counts + a per-source running sum over
    the hash order), so membership is exact and engine-portable — no
    float thresholds anywhere. One shuffle on ``source``; per-source
    ordered frames.

    -> doc_id, source, n_tokens, tokens_before
    """
    from .dedup import tokens

    if budget_per_source is None:
        budget_per_source = TOKEN_BUDGET_PER_SOURCE

    sized = docs.select(
        "doc_id",
        "source",
        F.size(tokens()).cast("long").alias("n_tokens"),
        _hash_prefix().alias("hp"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("hp", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        sized.withColumn(
            "tokens_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .filter(F.col("tokens_before") < budget_per_source)
        .select("doc_id", "source", "n_tokens", "tokens_before")
    )


# --------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023).
# Hashed-unigram bag-of-words generative models for the TARGET slice and
# the RAW corpus give every document an importance log-weight
# log p_target(x) - log p_raw(x); Gumbel-top-k on the log-weights then
# draws a without-replacement sample distributed ~ importance weights
# (Vieira 2014), with the Gumbel noise derived deterministically from
# the doc-id hash so the draw is reproducible and engine-portable.
# --------------------------------------------------------------------------

DSIR_BUCKETS = 256  # hashed feature space: token -> md5 bucket
DSIR_SCALE = 1_000_000  # per-bucket log-ratio fixed point (micro-nats)
DSIR_K = 100
DSIR_TARGET_LANG = "en"


def dsir_select(
    docs: DataFrame,
    target_lang: str = DSIR_TARGET_LANG,
    n_buckets: int = DSIR_BUCKETS,
    k: int = DSIR_K,
) -> DataFrame:
    """Select ``k`` documents from the corpus importance-resampled
    toward the ``target_lang`` slice's hashed-unigram distribution.

    Both "models" are one aggregation over the same token explode: the
    raw distribution over all documents, the target distribution over
    the target slice (Laplace-smoothed over ``n_buckets``). Each
    bucket's log-ratio is rounded once to integer micro-nats, so every
    document's log-weight is an EXACT integer dot product (count x
    ratio) — order-free, bit-identical in the DuckDB oracle. The
    Gumbel key ``logw + (-ln(-ln(u)))`` uses ``u`` from the doc-id md5,
    so selection is a pure function of the corpus.

    Scale shape: token explode -> 256-bucket aggregation (tiny, one
    shuffle whose key space is the bucket id — no skew: md5 spreads
    tokens uniformly); the per-bucket ratio table broadcasts; the
    per-doc rollup is the only data-sized shuffle; top-k is
    TakeOrderedAndProject, never a global sort.

    -> doc_id, logw_micro, dsir_key, rank
    """
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.col("text"), r"\s+")).alias("token"),
    )
    bucketed = tok.select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5(F.col("token").cast("binary")), 1, 4), 16, 10)
            .cast("long")
            % n_buckets
        ).alias("b"),
    )
    raw = bucketed.groupBy("b").agg(F.count("*").cast("long").alias("raw_cnt"))
    tgt = (
        bucketed.filter(F.col("lang") == target_lang)
        .groupBy("b")
        .agg(F.count("*").cast("long").alias("tgt_cnt"))
    )
    dist = (
        raw.join(tgt, "b", "left")
        .select("b", "raw_cnt", F.coalesce("tgt_cnt", F.lit(0)).alias("tgt_cnt"))
    )
    totals = dist.agg(
        F.sum("raw_cnt").cast("long").alias("raw_tot"),
        F.sum("tgt_cnt").cast("long").alias("tgt_tot"),
    )
    bmod = F.lit(float(n_buckets))
    log_ratio = F.log(
        (F.col("tgt_cnt") + 1.0) / (F.col("tgt_tot") + bmod)
    ) - F.log((F.col("raw_cnt") + 1.0) / (F.col("raw_tot") + bmod))
    ratios = dist.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(log_ratio * DSIR_SCALE, 0).cast("long").alias("lr_micro"),
    )
    doc_feats = bucketed.groupBy("doc_id", "b").agg(
        F.count("*").cast("long").alias("cnt")
    )
    logw = (
        doc_feats.join(F.broadcast(ratios), "b")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("lr_micro")).alias("logw_micro"))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("dsir:"), F.col("doc_id").cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / F.lit(4294967296.0)
    gumbel = -F.log(-F.log(u))
    keyed = logw.select(
        "doc_id",
        "logw_micro",
        F.round(
            F.col("logw_micro") / F.lit(float(DSIR_SCALE)) + gumbel, 9
        ).alias("dsir_key"),
    )
    topk = keyed.orderBy(F.desc("dsir_key"), "doc_id").limit(k)
    return topk.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("dsir_key"), "doc_id")),
    )


def _q_dsir(spark, sf_dir):
    from .. import ingest

    return dsir_select(ingest.load(spark, sf_dir, "documents"))


def dsir_oracle_sql() -> str:
    """DSIR oracle: identical bucket hash, Laplace log-ratio fixed
    point, integer dot product, and Gumbel key expression tree."""
    return f"""
WITH tok AS (
    SELECT doc_id, lang,
           unnest(string_split_regex(text, '\\s+')) AS token
    FROM documents
),
bucketed AS (
    SELECT doc_id, lang,
           ('0x' || substr(md5(token), 1, 4))::BIGINT % {DSIR_BUCKETS} AS b
    FROM tok
),
raw AS (SELECT b, CAST(count(*) AS BIGINT) AS raw_cnt FROM bucketed GROUP BY b),
tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS tgt_cnt FROM bucketed
        WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b),
dist AS (
    SELECT raw.b, raw_cnt, coalesce(tgt_cnt, 0) AS tgt_cnt
    FROM raw LEFT JOIN tgt USING (b)
),
totals AS (SELECT CAST(sum(raw_cnt) AS BIGINT) AS raw_tot,
                  CAST(sum(tgt_cnt) AS BIGINT) AS tgt_tot FROM dist),
ratios AS (
    SELECT b,
           CAST(round((ln((tgt_cnt + 1.0) / (tgt_tot + {DSIR_BUCKETS}.0))
                 - ln((raw_cnt + 1.0) / (raw_tot + {DSIR_BUCKETS}.0)))
                * {DSIR_SCALE}, 0) AS BIGINT) AS lr_micro
    FROM dist CROSS JOIN totals
),
doc_feats AS (
    SELECT doc_id, b, CAST(count(*) AS BIGINT) AS cnt
    FROM bucketed GROUP BY doc_id, b
),
logw AS (
    -- DuckDB's sum(BIGINT) is HUGEINT; this column is EMITTED, so cast
    -- back to BIGINT to match Spark's LongType (the driver hash is
    -- Arrow-type-aware — same class as the 3-round markov red row)
    SELECT doc_id, CAST(sum(cnt * lr_micro) AS BIGINT) AS logw_micro
    FROM doc_feats JOIN ratios USING (b) GROUP BY doc_id
),
keyed AS (
    SELECT doc_id, logw_micro,
           round(logw_micro / {DSIR_SCALE}.0
                 + (-ln(-ln((('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
                            / 4294967296.0))), 9) AS dsir_key
    FROM logw
)
SELECT doc_id, logw_micro, dsir_key,
       CAST(row_number() OVER (ORDER BY dsir_key DESC, doc_id) AS INT) AS rank
FROM keyed
ORDER BY dsir_key DESC, doc_id
LIMIT {DSIR_K}"""


SAMPLING_QUERIES["sample_dsir_importance"] = _q_dsir
