"""Text-analysis operators over the ``documents`` table (SURVEY.md §7.5):
language ID, quality scoring, token counting, fingerprinting — plus
gaps-and-islands sessionization over ``events``.

Everything is built-in-function only (JVM-side, whole-stage codegen);
double-valued scores are produced by identical expression trees in the
DuckDB oracle, so values match bit-for-bit.

Scale notes: all per-document operators are embarrassingly parallel
projections/aggregations — no joins, no skew; sessionization shuffles
once on user_id (uniform key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens

# Tiny deterministic stopword profiles for the n-gram/stopword-hit
# language heuristic. Real deployments plug in fastText/CLD3 via a
# pandas UDF; the engine surface (schema, grouping) is identical.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "to", "and"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
}

# BPE-ish word-piece pattern: letter runs, digit runs, or single
# non-space symbols (a cheap proxy for a BPE pre-tokenizer).
BPE_ISH = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit language identification with deterministic argmax
    (ties broken by profile order en > de > fr).

    -> doc_id, lang, predicted_lang, en_hits, de_hits, fr_hits
    """
    tok = docs.select("doc_id", "lang", F.explode(tokens()).alias("token"))
    hits = [
        F.sum(F.when(F.col("token").isin(words), 1).otherwise(0))
        .cast("long")
        .alias(f"{lang}_hits")
        for lang, words in LANG_PROFILES.items()
    ]
    scored = tok.groupBy("doc_id", "lang").agg(*hits)
    predicted = (
        F.when(
            (F.col("en_hits") >= F.col("de_hits"))
            & (F.col("en_hits") >= F.col("fr_hits")),
            F.lit("en"),
        )
        .when(F.col("de_hits") >= F.col("fr_hits"), F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return scored.select(
        "doc_id", "lang", predicted.alias("predicted_lang"),
        "en_hits", "de_hits", "fr_hits",
    )


def quality_score(
    docs: DataFrame, extra_cols: tuple[str, ...] = (), tf: DataFrame | None = None
) -> DataFrame:
    """Heuristic quality features + combined score
    (length/stopword/punctuation ratios — the C4/Gopher-style cheap
    filters).

    ``extra_cols`` rides named input columns through to the output for
    free — they join the projection the operator already makes, so a
    caller needing (score, source) pairs avoids a second corpus-sized
    join back onto ``docs`` (review r12: sampling.quality_top_fraction
    paid a whole extra shuffle join for the ``source`` column).

    ``tf`` (r13) lets a composing caller substitute a shared
    :func:`doc_token_counts` table for this operator's own token
    explode — every per-doc statistic is an exact integer sum over
    occurrences, so weighting the distinct (doc, token) rows by ``tf``
    is bit-identical (same contract as :func:`quality_rule_flags`).

    -> doc_id, *extra_cols, n_chars_text, n_tokens, stopword_ratio,
       punct_ratio, avg_token_len, quality_score
    """
    reserved = {
        "doc_id", "n_chars_text", "n_tokens", "stopword_ratio",
        "punct_ratio", "avg_token_len", "quality_score",
    }
    clash = reserved.intersection(extra_cols)
    if clash:
        # ADVICE r12: a colliding extra_col would silently produce
        # duplicate/ambiguous output columns at the final select
        raise ValueError(f"extra_cols collide with output columns: {sorted(clash)}")
    all_stop = sorted({w for ws in LANG_PROFILES.values() for w in ws})
    if tf is None:
        tok = docs.select("doc_id", F.explode(tokens()).alias("token"))
        wt = F.lit(1)
    else:
        tok = tf
        wt = F.col("tf")
    per_doc = tok.groupBy("doc_id").agg(
        F.sum(wt).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("token").isin(all_stop), wt).otherwise(0))
        .cast("long")
        .alias("stop_hits"),
        F.sum(F.length("token") * wt).cast("long").alias("token_chars"),
    )
    base = docs.select(
        "doc_id",
        *extra_cols,
        F.length("text").cast("long").alias("n_chars_text"),
        # count of punctuation CHARS: regexp_count of the single-char
        # class equals the old length(text) - length(regexp_replace(..))
        # exactly (each match is one char) without allocating a full
        # stripped copy of every document (r14; guide §2.3 — this
        # projection runs once per corpus pass in quality_score and its
        # composing callers). Python-API pattern passed verbatim, same
        # as token_counts.
        F.regexp_count(F.col("text"), F.lit(r"[^a-zA-Z0-9\s]"))
        .cast("long")
        .alias("punct_chars"),
    )
    j = base.join(per_doc, "doc_id")
    stopword_ratio = F.col("stop_hits").cast("double") / F.col("n_tokens")
    punct_ratio = F.col("punct_chars").cast("double") / F.col("n_chars_text")
    avg_token_len = F.col("token_chars").cast("double") / F.col("n_tokens")
    # fixed linear combination — same expression tree as the oracle
    score = (
        stopword_ratio * 0.4
        - punct_ratio * 0.3
        + F.least(F.col("n_tokens"), F.lit(100)).cast("double") / 100.0 * 0.3
    )
    return j.select(
        "doc_id",
        *extra_cols,
        "n_chars_text",
        "n_tokens",
        stopword_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        avg_token_len.alias("avg_token_len"),
        score.alias("quality_score"),
    )


# Gopher-style hard-rule bounds (Rae et al. 2021 §A1.1, adapted to the
# word-soup test corpus: the structure — per-rule boolean columns ANDed
# into one pass flag — is the operator; the bounds are config).
RULE_MIN_WORDS = 3
RULE_MAX_WORDS = 100_000
RULE_MIN_MEAN_LEN = 2.0
RULE_MAX_MEAN_LEN = 10.0
RULE_MAX_SYMBOL_RATIO = 0.1
RULE_MIN_ALPHA_RATIO = 0.8
RULE_MIN_STOP_HITS = 2


def quality_rule_flags(
    docs: DataFrame, tf: DataFrame | None = None
) -> DataFrame:
    """Gopher-style hard filter: each rule is its own boolean column so
    downstream curation can ablate rules independently; ``quality_pass``
    is their conjunction. Rules: word count in bounds, mean word length
    in bounds, symbol-token ratio <= max, alphabetic-token ratio >=
    min, and at least ``RULE_MIN_STOP_HITS`` DISTINCT stopwords present
    (the Gopher "stop word" requirement).

    One token explode + one aggregation per document — embarrassingly
    parallel, no joins wider than the doc_id rollup. ``tf`` (r13) lets
    a composing caller (the curation scoreboard / learned filters)
    substitute its shared :func:`doc_token_counts` table: every rule
    statistic is an exact integer sum over occurrences, so weighting
    the distinct (doc, token) rows by ``tf`` is bit-identical (the
    default path keeps the cheaper single direct aggregation).

    -> doc_id, n_words, mean_word_len, symbol_ratio, alpha_ratio,
       stop_hits, ok_word_count, ok_mean_len, ok_symbol, ok_alpha,
       ok_stopwords, quality_pass
    """
    all_stop = sorted({w for ws in LANG_PROFILES.values() for w in ws})
    if tf is None:
        tok = docs.select("doc_id", F.explode(tokens()).alias("token"))
        wt = F.lit(1)
    else:
        tok = tf
        wt = F.col("tf")
    agg = tok.groupBy("doc_id").agg(
        F.sum(wt).cast("long").alias("n_words"),
        F.sum(F.length("token") * wt).cast("long").alias("token_chars"),
        F.sum(
            F.when(F.col("token").rlike("^[^a-zA-Z0-9]+$"), wt).otherwise(0)
        ).cast("long").alias("symbol_toks"),
        F.sum(
            F.when(F.col("token").rlike("[a-zA-Z]"), wt).otherwise(0)
        ).cast("long").alias("alpha_toks"),
        F.count_distinct(
            F.when(F.col("token").isin(all_stop), F.col("token"))
        ).cast("long").alias("stop_hits"),
    )
    mean_len = F.col("token_chars").cast("double") / F.col("n_words")
    symbol_ratio = F.col("symbol_toks").cast("double") / F.col("n_words")
    alpha_ratio = F.col("alpha_toks").cast("double") / F.col("n_words")
    ok_wc = (F.col("n_words") >= RULE_MIN_WORDS) & (
        F.col("n_words") <= RULE_MAX_WORDS
    )
    ok_ml = (mean_len >= RULE_MIN_MEAN_LEN) & (mean_len <= RULE_MAX_MEAN_LEN)
    ok_sy = symbol_ratio <= RULE_MAX_SYMBOL_RATIO
    ok_al = alpha_ratio >= RULE_MIN_ALPHA_RATIO
    ok_st = F.col("stop_hits") >= RULE_MIN_STOP_HITS
    return agg.select(
        "doc_id",
        "n_words",
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        "stop_hits",
        ok_wc.alias("ok_word_count"),
        ok_ml.alias("ok_mean_len"),
        ok_sy.alias("ok_symbol"),
        ok_al.alias("ok_alpha"),
        ok_st.alias("ok_stopwords"),
        (ok_wc & ok_ml & ok_sy & ok_al & ok_st).alias("quality_pass"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish word-piece count
    (regex-based proxy for a BPE pre-tokenizer).

    -> doc_id, ws_tokens, bpe_ish_tokens
    """
    return docs.select(
        "doc_id",
        F.size(tokens()).cast("long").alias("ws_tokens"),
        # Python-API regexp_count: the pattern is passed verbatim (a SQL
        # string literal would re-process backslash escapes)
        F.regexp_count(F.col("text"), F.lit(BPE_ISH))
        .cast("long")
        .alias("bpe_ish_tokens"),
    )


def bpe_merge_candidates(docs: DataFrame, top_n: int = 50) -> DataFrame:
    """The inner step of BPE tokenizer training (Sennrich et al. 2016):
    count adjacent symbol pairs across the corpus vocabulary, weighted
    by word frequency — the argmax pair is the next merge. One round is
    the primitive; a driver loop applying merges re-invokes it (each
    round is a linear corpus-vocab pass, the classic implementation).

    Shape (100 TB): the corpus collapses to its VOCABULARY first (one
    groupBy on the word — dedup before the expensive per-char explode),
    pairs explode off the vocab rows only, and the pair rollup + top-n
    is an aggregation + TakeOrderedAndProject. Everything JVM-side.

    -> pair, pair_count, rank
    """
    vocab = (
        docs.select(F.explode(tokens()).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    pairs = vocab.select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> concat(substr(word, i, 1), ' ', substr(word, i + 1, 1)))"
            )
        ).alias("pair"),
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("freq").cast("long").alias("pair_count")
    )
    return (
        agg.orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(top_n)
        .select(
            "pair",
            "pair_count",
            # ranks only the <= top_n surviving rows — runs after the
            # TakeOrderedAndProject cut, same staged pattern as
            # plans/api.py's leaderboard rank
            F.row_number()
            .over(Window.orderBy(F.desc("pair_count"), F.asc("pair")))
            .cast("int")
            .alias("rank"),
        )
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Two content fingerprints: md5 of normalized text (order-sensitive)
    and md5 of the sorted distinct token set (bag-of-words, order- and
    multiplicity-insensitive).

    -> doc_id, content_fp, bag_fp
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    bag = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens())))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("content_fp"),
        F.md5(bag).alias("bag_fp"),
    )


SESSION_GAP_MS = 1_800_000  # 30 min


def sessionize(events: DataFrame, gap_ms: int = SESSION_GAP_MS) -> DataFrame:
    """Gaps-and-islands sessionization of the event stream: a new session
    starts after ``gap_ms`` of user inactivity. One row per session.

    Single shuffle on user_id; windows are per-user and ordered by
    (ts, event_id) for full determinism under timestamp ties.

    -> user_id, session_id, n_events, session_start_ms, duration_ms
    """
    ev = events.select(
        "user_id", F.col("event_id"), F.unix_millis("ts").alias("ms")
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.lag("ms").over(w).isNull()
            | ((F.col("ms") - F.lag("ms").over(w)) > gap_ms),
            1,
        ).otherwise(0),
    )
    sessioned = flagged.withColumn(
        "session_id",
        F.sum("new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    return (
        sessioned.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ms").alias("session_start_ms"),
            (F.max("ms") - F.min("ms")).alias("duration_ms"),
        )
        .orderBy("user_id", "session_id")
    )


# PII redaction patterns, applied in order. The regex subset is chosen
# to mean the same thing in Java regex (Spark) and RE2 (DuckDB oracle):
# character classes, bounded repetition, \b, \d — no backreferences or
# lookaround. Replacement chain order matters: emails first (their local
# part may contain digits/dots), then dotted quads, then phone-shaped
# digit runs (which cannot span a '.' so an already-redacted <IP> tag or
# a dotted quad never merges into a phone match).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d ()-]{6,}\d", "<PHONE>"),
]


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-corpus PII scrubbing: regex-redact emails, IPv4
    addresses, and international-format phone numbers; per-pattern match
    counts are taken on the ORIGINAL text (before any replacement).

    Pure projection — embarrassingly parallel, whole-stage codegen,
    no shuffle; the shape survives any scale-up.

    -> doc_id, redacted, n_email, n_ip, n_phone
    """
    text = F.col(text_col)
    counts = [
        F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    redacted = text
    for _, pat, tag in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, tag)
    return docs.select("doc_id", redacted.alias("redacted"), *counts)


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Within-document repetition signals (Gopher-style quality rules):
    the fraction of duplicated word 2-grams / 3-grams inside each doc.
    Highly repetitive documents (boilerplate, generated spam, scraper
    loops) score high and get filtered from training corpora.

    Pure projection over the shingle arrays — no shuffle, no join.

    -> doc_id, n_2grams, dup_2gram_ratio, n_3grams, dup_3gram_ratio
    """
    from .dedup import shingles

    df = docs.select("doc_id", tokens().alias("toks"))
    for k in (2, 3):
        df = (
            df.withColumn(f"_sh{k}", shingles("toks", k))
            .withColumn(f"n_{k}grams", F.size(f"_sh{k}").cast("long"))
            .withColumn(
                f"dup_{k}gram_ratio",
                (
                    F.col(f"n_{k}grams")
                    - F.size(F.array_distinct(f"_sh{k}"))
                ).cast("double")
                / F.col(f"n_{k}grams"),
            )
        )
    return df.select(
        "doc_id",
        "n_2grams",
        "dup_2gram_ratio",
        "n_3grams",
        "dup_3gram_ratio",
    )


VOCAB_SIZE = 256


def vocab_encode(docs: DataFrame, vocab_size: int = VOCAB_SIZE) -> DataFrame:
    """Vocabulary tokenization: build the top-``vocab_size`` corpus
    vocabulary by token frequency (ties by token) and encode every
    document as its sequence of token ids, order preserved, OOV = -1 —
    the step between token counting and sequence packing in a training
    pipeline.

    Scale shape: the vocabulary is one token-keyed aggregation +
    ``TakeOrderedAndProject`` top-V (per-partition heaps, no global
    sort); ids are assigned by a window over the V surviving rows only
    (bounded by configuration, not data). Encoding is a broadcast
    left join on token + per-doc reassembly ordered by position — no
    shuffle wider than (doc_id, pos) rows, no skew (tokens per doc is
    bounded).

    -> doc_id, token_ids ARRAY<INT>, n_tokens, n_oov
    """
    tok = docs.select("doc_id", F.posexplode(tokens()).alias("pos", "token"))
    freq = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    top = freq.orderBy(F.desc("cnt"), F.asc("token")).limit(vocab_size)
    vocab = top.select(
        "token",
        (
            F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("token")))
            - 1
        ).cast("int").alias("token_id"),
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .select(
            "doc_id",
            "pos",
            F.coalesce("token_id", F.lit(-1)).cast("int").alias("tid"),
        )
        .groupBy("doc_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, tid))),"
                " s -> s.tid)"
            ).alias("token_ids"),
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("tid") == -1, 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
    )


def unigram_surprise(docs: DataFrame) -> DataFrame:
    """Unigram language-model surprise per document: the corpus unigram
    distribution ``p(t) = cnt_t / total`` scores each document by its
    mean negative log-likelihood — the cheap stand-in for perplexity
    filtering (a doc of globally-rare tokens scores high = surprising;
    boilerplate scores low). Rank-and-cut on this column the same way
    ``sampling.quality_top_fraction`` cuts on the heuristic score.

    One token aggregation + a token-keyed rejoin (uniform key, no
    skew) and one 1-row total — no data-sized sort or window. The
    frequency side is NOT broadcast-hinted: the distinct-token set
    grows with the corpus (ids, typos, noise), so the join strategy is
    left to AQE — it broadcasts when the vocabulary is actually small.

    Determinism (float sweep, round 7): each token's -ln(p) is rounded
    ONCE to integer micro-nats (the NB/bigram fixed-point pattern —
    JVM vs DuckDB libm ``ln`` differ by an ulp, and a float avg is
    additionally shuffle-order-dependent); the per-doc mean is then
    exact integer round-half-up over a non-negative sum.

    -> doc_id, n_tokens, avg_neg_logp_micro
    """
    from .dedup import tokens

    tok = docs.select("doc_id", F.explode(tokens()).alias("token"))
    freq = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    total = freq.agg(F.sum("cnt").cast("double").alias("total"))
    neg_micro = (
        F.round(-F.log(F.col("cnt") / F.col("total")) * 1_000_000, 0)
        .cast("long")
    )
    return (
        tok.join(freq, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(neg_micro).alias("sum_micro"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr(
                "CAST((CAST(sum_micro AS DECIMAL(38,0)) * 2 + n_tokens)"
                " DIV (2 * CAST(n_tokens AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("avg_neg_logp_micro"),
        )
    )


# --------------------------------------------------------------------------
# Naive-Bayes quality classifier (fastText-style quality filter twin:
# CCNet / GPT-3 / LLaMA pipelines train a linear text classifier on a
# "good" corpus vs raw crawl and keep docs the model scores as good.
# Naive Bayes is the closed-form member of that family — training IS one
# aggregation, so both training and inference are single Spark passes
# with no gradient loop, and the whole thing stays SQL-expressible.)
# --------------------------------------------------------------------------

NB_VOCAB = 512  # top-V tokens by corpus count; bounds the broadcast side
NB_SCALE = 1_000_000  # log-likelihood-ratio fixed-point scale (micro-nats)


def doc_token_counts(docs: DataFrame) -> DataFrame:
    """Per-document term frequencies — the shared input of the learned
    quality filters (r13): one token explode + one partial-mergeable
    aggregation, lineage-capped so composing operators that reference it
    several times compute it once.

    (r14 note: an array-local counting fold — inline over
    array_distinct, counted per row — was built, measured and REVERTED
    both with and without the checkpoint: higher-order-function lambdas
    evaluate interpreted, and the O(distinct x len) per-doc counting
    lost to this codegen'd explode + hash-agg pipeline on every
    consumer — isolated text_nb_quality 2.8 -> 3.7 s, curation
    scoreboard 5.0 -> 5.7 s. Same lesson as the minhash-signature
    fold.)

    -> doc_id, token, tf (BIGINT)
    """
    return (
        docs.select("doc_id", F.explode(tokens()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )


def nb_quality_score(
    docs: DataFrame,
    vocab_size: int = NB_VOCAB,
    labels: DataFrame | None = None,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Train-and-score a multinomial Naive-Bayes quality classifier in
    one job. Weak supervision comes from the pipeline's own hard rules
    (:func:`quality_rule_flags` ``quality_pass`` — the Gopher-rules
    conjunction), the standard bootstrap when no hand-labeled corpus
    exists; per-token log-likelihood ratios use Laplace smoothing over
    the top-``vocab_size`` vocabulary.

    Float determinism: each token's LLR is rounded once to integer
    micro-nats (``NB_SCALE``), so the per-document score is an EXACT
    integer dot product — no shuffle-order float summation anywhere,
    and the DuckDB oracle reproduces it bit-for-bit.

    Scale shape: one token explode feeds both the vocabulary top-V
    (TakeOrderedAndProject, no global sort) and the class-conditional
    counts; the vocabulary and the per-token LLR table are O(V) and
    broadcast. The only data-sized shuffles are the doc_id rollups.
    The label join is doc-keyed (uniform). At 100 TB the weak labels
    would come from the already-materialized rules table instead of
    being recomputed — the operator takes them from ``docs`` content
    only so the oracle is self-contained.

    ``labels`` (doc_id, quality_pass) lets a composing caller (the
    curation scoreboard) share ONE rules computation across filters;
    default None derives them from ``docs`` so the operator and its
    oracle stay self-contained. ``tf`` (doc_id, token, tf) likewise
    shares a per-document term-frequency table.

    r13 rewrite (guide §2.3 "aggregate before you shuffle" / §2.4): the
    token explode previously ran THREE times (vocabulary top-V, class-
    conditional counts, per-doc scoring). All three consumers only need
    per-(doc, token) COUNTS, so the explode now collapses into one
    ``tf`` aggregation (lineage-capped so the shared subtree computes
    once) and every downstream sum weights by ``tf`` — exact integer
    math, bit-identical outputs (sum over occurrences == sum of
    count * weight over distinct pairs), 2 corpus passes instead of 4.

    -> doc_id, n_vocab_tokens, nb_score_micro, nb_pass
    """
    if tf is None:
        tf = doc_token_counts(docs)
    if labels is None:
        # the shared tf table feeds the weak labels too (bit-identical
        # integer sums) — self-contained nb is ONE corpus explode total
        labels = quality_rule_flags(docs, tf=tf).select(
            "doc_id", "quality_pass"
        )
    # r14 fusion (guide §2.3): the vocabulary top-V and the class-
    # conditional counts were TWO token-keyed aggregations over the full
    # tf stream (vocab: tf -> token; counts: tf x vocab x labels ->
    # token). Both only need per-token sums, so ONE aggregation now
    # computes the corpus count AND both class counts per token; the
    # top-V cut (TakeOrderedAndProject, no global sort) and the class
    # totals then run on the already-aggregated ~|vocab|-row stream.
    # Exactness: per-token integer sums are identical whether the vocab
    # filter runs before or after the token rollup (filtering a token
    # SUBSET commutes with per-token aggregation), and the label join
    # is LEFT so tokens of unlabeled docs still count toward the
    # corpus-frequency vocabulary ranking (as before) while landing in
    # neither class (the old inner vtok join dropped them from counts;
    # quality_pass IS NULL matches neither branch below).
    per_token_all = (
        tf.join(labels, "doc_id", "left")
        .groupBy("token")
        .agg(
            F.sum("tf").alias("cnt"),
            F.sum(
                F.when(F.col("quality_pass") == F.lit(True), F.col("tf"))
                .otherwise(0)
            )
            .cast("long")
            .alias("pos_cnt"),
            F.sum(
                F.when(F.col("quality_pass") == F.lit(False), F.col("tf"))
                .otherwise(0)
            )
            .cast("long")
            .alias("neg_cnt"),
        )
    )
    per_token = (
        per_token_all.orderBy(F.desc("cnt"), "token")
        .limit(vocab_size)
        .select("token", "pos_cnt", "neg_cnt")
    )
    class_tot = per_token.agg(
        F.sum("pos_cnt").cast("long").alias("pos_tot"),
        F.sum("neg_cnt").cast("long").alias("neg_tot"),
    )
    doc_tot = labels.agg(
        F.sum(F.when(F.col("quality_pass"), 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
        F.sum(F.when(F.col("quality_pass"), 0).otherwise(1))
        .cast("long")
        .alias("n_neg"),
    )
    v = F.lit(float(vocab_size))
    llr = F.log(
        (F.col("pos_cnt") + 1.0) / (F.col("pos_tot") + v)
    ) - F.log((F.col("neg_cnt") + 1.0) / (F.col("neg_tot") + v))
    llr_table = (
        per_token.crossJoin(F.broadcast(class_tot))
        .select(
            "token",
            F.round(llr * NB_SCALE, 0).cast("long").alias("llr_micro"),
        )
    )
    # Laplace on the doc-count prior too, so an all-pass (or all-fail)
    # corpus still yields a finite prior
    prior = F.round(
        (
            F.log(F.col("n_pos") + 1.0) - F.log(F.col("n_neg") + 1.0)
        )
        * NB_SCALE,
        0,
    ).cast("long")
    doc_sums = (
        tf.join(F.broadcast(llr_table), "token")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_vocab_tokens"),
            F.sum(F.col("tf") * F.col("llr_micro"))
            .cast("long")
            .alias("tok_micro"),
        )
    )
    return (
        labels.select("doc_id")
        .join(doc_sums, "doc_id", "left")
        .crossJoin(F.broadcast(doc_tot.select(prior.alias("prior_micro"))))
        .select(
            "doc_id",
            F.coalesce(F.col("n_vocab_tokens"), F.lit(0))
            .cast("long")
            .alias("n_vocab_tokens"),
            (F.coalesce(F.col("tok_micro"), F.lit(0)) + F.col("prior_micro"))
            .cast("long")
            .alias("nb_score_micro"),
            (
                F.coalesce(F.col("tok_micro"), F.lit(0))
                + F.col("prior_micro")
                > 0
            ).alias("nb_pass"),
        )
    )


KL_SCALE = 1_000_000_000  # per-token-type fixed point (nano-nats)


def source_divergence(docs: DataFrame) -> DataFrame:
    """Per-source distribution diagnostics: token-distribution KL
    divergence vs the whole corpus and unigram entropy — the domain-
    mixture datacard numbers (is this source on-distribution? how
    repetitive is it?) that drive mixture reweighting decisions
    (sampling.mixture_* operate on counts; this measures SHAPE).

    ``KL(p_s || q) = Σ_t (c_st/n_s) · ln((c_st/n_s)/(c_t/N))`` and
    ``H(p_s) = -Σ_t (c_st/n_s) · ln(c_st/n_s)``; every per-token-TYPE
    term is rounded once to integer nano-nats, so the per-source totals
    are exact integer sums — shuffle-order-free, bit-identical to the
    oracle (the NB/bigram-LM fixed-point pattern).

    Shape (100 TB): one token explode feeds the (source, token) rollup;
    the corpus-marginal join keys on token (vocab-sized, uniform); the
    totals are 1-row and |sources|-row broadcasts. Final rollup is
    |sources| x |vocab| rows.

    Output is INTEGER nano-nats only (since round 7): the convenience
    ``kl``/``entropy`` DOUBLE re-divisions were dropped — a derived
    DOUBLE in a hash-compared output re-opens the float-flake class
    the markov query spent two rounds on; consumers divide by
    ``KL_SCALE`` (1e9) themselves at the presentation layer.

    -> source, n_tokens, n_distinct, kl_nano, entropy_nano
    """
    from .dedup import tokens

    tok = docs.select("source", F.explode(tokens()).alias("token"))
    st = tok.groupBy("source", "token").agg(
        F.count("*").cast("long").alias("c_st")
    )
    s_tot = st.groupBy("source").agg(F.sum("c_st").cast("long").alias("n_s"))
    g = st.groupBy("token").agg(F.sum("c_st").cast("long").alias("c_t"))
    n_tot = g.agg(F.sum("c_t").cast("long").alias("n_g"))
    p = F.col("c_st").cast("double") / F.col("n_s").cast("double")
    q = F.col("c_t").cast("double") / F.col("n_g").cast("double")
    kl_term = F.round(p * F.log(p / q) * KL_SCALE, 0).cast("long")
    h_term = F.round(-p * F.log(p) * KL_SCALE, 0).cast("long")
    return (
        st.join(g, "token")
        .join(F.broadcast(s_tot), "source")
        .crossJoin(F.broadcast(n_tot))
        .groupBy("source")
        .agg(
            F.sum("c_st").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_distinct"),
            F.sum(kl_term).cast("long").alias("kl_nano"),
            F.sum(h_term).cast("long").alias("entropy_nano"),
        )
    )


# --------------------------------------------------------------------------
# Bigram language-model surprise (the CCNet/Wikipedia-LM perplexity
# filter, Wenzek et al. 2020, one order up from unigram_surprise): train
# a Laplace-smoothed bigram LM on the corpus' own rules-passing subset
# (same weak-supervision bootstrap as nb_quality_score), then score
# EVERY document by its total bigram log-likelihood. Low mean
# log-likelihood = unpredictable word order = the crawl junk a
# perplexity filter drops; pathologically HIGH likelihood = boilerplate.
# --------------------------------------------------------------------------

BIGRAM_SCALE = 1_000_000  # per-bigram log-prob fixed point (micro-nats)
# keep docs whose MEAN bigram log-likelihood clears this (micro-nats per
# bigram); compared as exact integers: sum_micro >= T * n_bigrams.
# Corpus-tuned knob (like every perplexity filter): the testdata corpus
# sits at median ≈ -3.39M with p25 ≈ -3.42M, so this cut drops the
# least-predictable tail while keeping the bulk.
BIGRAM_PASS_MICRO = -3_450_000


def _bigram_pairs(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) for every adjacent token pair; short docs
    (< 2 tokens) contribute none. The CASE guard matters: Spark's
    ``sequence(0, -1)`` counts DOWN, so an unguarded transform would
    fabricate a reversed pair for 1-token docs."""
    from .dedup import tokens

    return (
        docs.select("doc_id", tokens().alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(t) < 2 THEN "
                    "array() "
                    "ELSE transform(sequence(0, size(t) - 2), "
                    "i -> struct(t[i] AS w1, t[i + 1] AS w2)) END"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )


def doc_bigram_counts(docs: DataFrame) -> DataFrame:
    """Per-document bigram frequencies — the bigram twin of
    :func:`doc_token_counts` (r13): one pair explode + one
    partial-mergeable aggregation, lineage-capped so the LM's two
    consumers (training counts, scoring) compute it once.

    -> doc_id, w1, w2, bf (BIGINT)
    """
    return (
        _bigram_pairs(docs)
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").cast("long").alias("bf"))
        .localCheckpoint(eager=False)
    )


def bigram_lm_surprise(
    docs: DataFrame,
    labels: DataFrame | None = None,
    tf: DataFrame | None = None,
    bf: DataFrame | None = None,
) -> DataFrame:
    """Train-and-score a Laplace-smoothed bigram LM in one job.

    Training set: documents passing :func:`quality_rule_flags` (the
    Gopher-rules conjunction — the same trusted-subset bootstrap the NB
    classifier uses). ``logp(w2|w1) = ln((c(w1,w2)+1) / (c(w1,·)+V))``
    with ``V`` = the training subset's distinct-token vocabulary size;
    an unseen context degrades to ``ln(1/V)`` by the same formula (its
    counts are zero), so scoring needs no special OOV branch.

    Float determinism: like the NB classifier, each bigram's log-prob
    is rounded ONCE to integer micro-nats, so per-document totals are
    exact integer sums — shuffle-order-free — and the pass decision is
    an exact integer comparison ``sum >= T * n``.

    Shape (100 TB): one bigram explode feeds training counts and
    scoring; the model join keys on (w1, w2) then w1 — uniform token
    keys, no skew beyond natural Zipf (AQE skew-join handles the head
    word); the vocabulary size and training-prior frames are 1-row
    crossJoins. No window, no sort, no Python.

    ``labels`` shares a caller's rules computation (see
    nb_quality_score); ``tf``/``bf`` likewise share per-document
    token/bigram count tables; default None stays self-contained.

    r13 rewrite (guide §2.3 partial aggregation / §2.4 shuffle fewer
    bytes): the bigram explode previously ran TWICE (training counts,
    per-doc scoring) and the vocabulary size re-exploded the training
    docs' tokens a third time. Bigrams now collapse once into a
    per-(doc, w1, w2) count table (lineage-capped) and every downstream
    sum weights by ``bf``; the vocabulary size reads the shared
    :func:`doc_token_counts` table (distinct tokens of distinct
    (doc, token) pairs == distinct tokens of occurrences). Exact
    integer math — bit-identical outputs, 2 corpus explodes -> 1 when
    self-contained, 0 when the caller shares both tables.

    -> doc_id, n_bigrams, lm_logprob_micro, lm_pass
    """
    if tf is None:
        tf = doc_token_counts(docs)
    if labels is None:
        labels = quality_rule_flags(docs, tf=tf).select(
            "doc_id", "quality_pass"
        )
    if bf is None:
        bf = doc_bigram_counts(docs)
    train_docs = labels.filter("quality_pass").select("doc_id")
    train_big = bf.join(train_docs, "doc_id")
    c2 = train_big.groupBy("w1", "w2").agg(
        F.sum("bf").cast("long").alias("c2")
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    vsize = (
        tf.join(train_docs, "doc_id")
        .agg(F.countDistinct("token").cast("long").alias("v"))
    )
    # greatest(v, 1): an all-fail-rules corpus has an empty model
    # (v = 0, all counts 0) — the clamp keeps ln finite (logp 0) there
    # and is a no-op on any real corpus
    lp_micro = F.round(
        F.log(
            (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1.0))
            / (
                F.coalesce(F.col("c1"), F.lit(0))
                + F.greatest(F.col("v"), F.lit(1)).cast("double")
            )
        )
        * BIGRAM_SCALE,
        0,
    ).cast("long")
    scored = (
        bf.join(c2, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vsize))
        .groupBy("doc_id")
        .agg(
            F.sum("bf").cast("long").alias("n_bigrams"),
            F.sum(F.col("bf") * lp_micro)
            .cast("long")
            .alias("lm_logprob_micro"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("lm_logprob_micro", F.lit(0))
            .cast("long")
            .alias("lm_logprob_micro"),
            (
                (F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0)
                & (
                    F.coalesce(F.col("lm_logprob_micro"), F.lit(0))
                    >= F.lit(BIGRAM_PASS_MICRO)
                    * F.coalesce(F.col("n_bigrams"), F.lit(0))
                )
            ).alias("lm_pass"),
        )
    )


# --------------------------------------------------------------------------
# Full BPE tokenizer training (Sennrich et al. 2016) — the driver loop
# around bpe_merge_candidates' primitive, with the merge APPLICATION
# in-plan: each round's argmax pair is a one-row relation crossJoined
# back in, and the symbol rewrite is a JVM-side `aggregate` fold over
# the symbol arrays (greedy left-to-right non-overlapping, exactly the
# reference algorithm's scan). No collect anywhere: the trained merge
# list is ONE Catalyst plan of n_merges chained rounds.
# --------------------------------------------------------------------------

BPE_TRAIN_MERGES = 8

# Driver escape gate for the BPE merge loop (r13, guide §1.2/§2.4: the
# loop's per-round cost at small scale is pure scheduler/shuffle
# overhead — 8 rounds x (pair agg + argmax + rewrite checkpoint) ~= 24
# sequential jobs). Gated on the DOCS relation's Catalyst size estimate
# (the same trigger shape as similarity._auto_shards, read from the
# parquet scan, so the gate costs zero jobs): below the threshold the
# word vocabulary is at most a few hundred thousand rows and the whole
# merge loop runs on the driver in milliseconds; above it (or when the
# estimate is the unknown-size sentinel) the distributed loop is
# unchanged — that remains the 100 TB path, where the vocabulary is
# unbounded and per-round job overhead is noise.
BPE_DRIVER_CORPUS_BYTES = 64 * 1024**2


def _catalyst_size(df: DataFrame) -> int:
    return int(
        str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )


def _bpe_loop_driver(spark, vocab: DataFrame, n_merges: int):
    """Driver-side twin of the distributed merge loop: identical math
    (pair counts weighted by word freq over every adjacent position,
    argmax by count desc / pair asc, left-to-right fold rewrite) on the
    collected vocabulary. String ties compare equally in both engines:
    Spark orders strings by UTF-8 bytes, Python by code points, and
    UTF-8 byte order IS code-point order. Exhausting merges before
    n_merges stops emitting rows, exactly like the distributed loop's
    empty-argmax identity rounds."""
    words = [
        (r["word"], r["freq"], list(r["word"])) for r in vocab.collect()
    ]
    step_rows = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for _w, freq, syms in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        ab = a + b
        step_rows.append((step, a, b, ab, c))
        for _w, _f, syms in words:
            # fold-rewrite, identical to the distributed aggregate CASE
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = ab
                else:
                    out.append(x)
            syms[:] = out
    steps_df = spark.createDataFrame(
        step_rows,
        schema="step int, pair_a string, pair_b string, "
        "merged string, pair_count long",
    )
    cur_df = spark.createDataFrame(
        words, schema="word string, freq long, syms array<string>"
    )
    return [steps_df], cur_df


def bpe_train(docs: DataFrame, n_merges: int = BPE_TRAIN_MERGES) -> DataFrame:
    """Train ``n_merges`` BPE merges over the corpus vocabulary and
    return the ordered merge table. Each round: adjacent-pair counts
    weighted by word frequency -> deterministic argmax (count desc,
    pair asc) -> fold-rewrite of every vocabulary word's symbol array.

    Scale shape: the corpus collapses to its vocabulary once (groupBy
    word — dedup before any per-char work); every round is then a
    vocab-sized pair explode + aggregation + a 1-row
    TakeOrderedAndProject argmax broadcast back. Corpus size only
    enters through the initial word count; rounds cost O(vocab).
    Both the symbol table and the argmax are lineage-capped per round
    (``localCheckpoint``) — each is consumed twice, and without the cap
    Catalyst re-derives every earlier round per reference, turning the
    n-round loop into 2^n recomputation (the same fix as
    ``graph.pagerank``).

    -> step, pair_a, pair_b, merged, pair_count
    """
    steps, _cur = _bpe_loop(docs, n_merges)
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


def _bpe_loop(docs: DataFrame, n_merges: int):
    """Shared BPE training loop -> (per-round merge rows, final
    word->symbols table). ``word`` rides along so :func:`bpe_encode`
    can join documents straight onto the rewritten vocabulary."""
    vocab = (
        docs.select(F.explode(tokens()).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    est = _catalyst_size(docs)
    if est <= BPE_DRIVER_CORPUS_BYTES:
        return _bpe_loop_driver(docs.sparkSession, vocab, n_merges)
    cur = vocab.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    )
    steps = []
    for step in range(1, n_merges + 1):
        pairs = cur.filter(F.size("syms") >= 2).select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), i -> "
                    "struct(element_at(syms, i) as a, "
                    "element_at(syms, i + 1) as b))"
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").cast("long").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(1)
        ).localCheckpoint(eager=False)
        steps.append(
            best.select(
                F.lit(step).alias("step"),
                F.col("a").alias("pair_a"),
                F.col("b").alias("pair_b"),
                F.concat("a", "b").alias("merged"),
                "pair_count",
            )
        )
        # Global aggregate over the (possibly EMPTY) argmax: an agg with
        # no grouping keys always emits exactly ONE row, with NULL
        # _pa/_pb when no mergeable pair remains. The CASE below then
        # evaluates to NULL -> ELSE, i.e. an identity rewrite, so
        # exhausting merges before n_merges no-ops the remaining rounds
        # instead of crossJoin-wiping `cur` (and with it every already-
        # trained merge's effect on the encoder) — the round-6 ADVICE
        # "empty-best wipeout" bug.
        bp = best.agg(F.max("a").alias("_pa"), F.max("b").alias("_pb"))
        cur = (
            cur.crossJoin(F.broadcast(bp))
            .select(
                "word",
                "freq",
                F.expr(
                    "aggregate(syms, cast(array() as array<string>), "
                    "(acc, x) -> CASE WHEN size(acc) > 0 "
                    "AND element_at(acc, -1) = _pa AND x = _pb "
                    "THEN concat(slice(acc, 1, size(acc) - 1), "
                    "array(concat(_pa, _pb))) "
                    "ELSE concat(acc, array(x)) END)"
                ).alias("syms"),
            )
            .localCheckpoint(eager=False)
        )
    return steps, cur


def bpe_encode(docs: DataFrame, n_merges: int = BPE_TRAIN_MERGES) -> DataFrame:
    """Tokenizer INFERENCE off the trained merges: the training loop's
    final symbol table IS the encoder for every in-vocabulary word
    (BPE's merge application is deterministic, so training already
    rewrote each vocabulary word to its final symbols); documents join
    onto it word-by-word, words too short to train (or unseen) stay
    single symbols. Output is the per-document symbol histogram — the
    relation a token-count budgeter or vocabulary auditor consumes.

    Scale shape: encode is one explode + word-keyed join + doc-keyed
    rollup. The symbol table is NOT broadcast-hinted (review r12): its
    row count is the full corpus WORD vocabulary — unbounded growth,
    and each row carries a symbol array, so it is heavier than the df
    tables this repo already refuses to force-broadcast
    (unigram_surprise). AQE broadcasts it at runtime when it is small
    and falls back to a shuffle join (with skew splitting on the Zipf
    head) when it is not.

    -> doc_id, symbol, sym_count
    """
    _steps, vocab_syms = _bpe_loop(docs, n_merges)
    words = docs.select("doc_id", F.explode(tokens()).alias("word"))
    return (
        words.join(
            vocab_syms.select("word", "syms"), "word", "left"
        )
        .select(
            "doc_id",
            F.explode(
                F.coalesce(F.col("syms"), F.array(F.col("word")))
            ).alias("symbol"),
        )
        .groupBy("doc_id", "symbol")
        .agg(F.count("*").cast("long").alias("sym_count"))
    )
