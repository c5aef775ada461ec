"""Text-analysis operators for training-data pipelines (beyond-reference,
BASELINE.json north star): language-ID, quality scoring, token stats,
document fingerprinting. All pure built-in column expressions —
JVM-side, codegen-friendly, linear scans with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.hashing import h32, shingles, tokenize

# Function-word sets per language (tiny, deterministic heuristic).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pour", "dans"),
    "es": ("el", "los", "las", "y", "es", "un", "una", "para", "con"),
}
LANG_ORDER = ("en", "de", "fr", "es")  # deterministic tie-break order

EN_STOPWORDS = LANG_STOPWORDS["en"]


def token_stats(text: Column) -> dict[str, Column]:
    # each output column let-binds the token array once (see
    # repetition_stats for the transform-over-1-element-array idiom)
    toks = tokenize(text)
    return {
        "n_tokens": F.size(toks).cast("long"),
        "n_distinct_tokens": F.size(F.array_distinct(toks)).cast("long"),
        "mean_token_len": F.transform(
            F.array(toks),
            lambda t: F.round(
                F.aggregate(t, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
                / F.greatest(F.size(t), F.lit(1)),
                6,
            ),
        )[0],
    }


EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
URL_RE = "https?://[^\\s]+"
PHONE_RE = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"


def redact_pii(text: Column) -> Column:
    """Training-corpus scrubbing: emails, URLs, and phone-shaped numbers
    replaced with typed placeholders — pure regexp_replace chain, stays
    in whole-stage codegen. Order matters: URLs first (they may contain
    @ and digits), then emails, then phones."""
    out = F.regexp_replace(text, URL_RE, "<URL>")
    out = F.regexp_replace(out, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return out


def extract_urls(text: Column) -> Column:
    """All URLs in a document (array<string>) — the input to URL-level
    dedup / domain frequency analysis."""
    return F.regexp_extract_all(text, F.lit(URL_RE), 0)


def token_tf(tokens: Column) -> Column:
    """Per-row term frequencies: array<struct<token, tf>> of each
    distinct token with its occurrence count, computed from the SORTED
    token array's run boundaries — all of a document's tokens are
    already co-located in its row, so counting them needs no shuffle
    (optimization r13: replaces a corpus-sized groupBy(doc, token)
    exchange with per-row array work; the tf values are the identical
    integers count(*) would produce). Zero-token rows yield an empty
    array. Linear in the token count: run starts come from comparing
    the sorted array against its 1-shifted self, counts from adjacent
    start positions.
    """

    def _runs(st: Column) -> Column:
        n = F.size(st)
        starts = F.filter(
            F.sequence(F.lit(1), n),
            lambda i: (i == 1) | (F.element_at(st, i) != F.element_at(st, i - 1)),
        )
        return F.zip_with(
            starts,
            F.concat(F.slice(starts, 2, F.lit(1 << 30)), F.array(n + 1)),
            lambda s, nxt: F.struct(
                F.element_at(st, s).alias("token"),
                (nxt - s).cast("long").alias("tf"),
            ),
        )

    empty = F.array().cast("array<struct<token:string,tf:bigint>>")
    return F.transform(
        F.array(F.array_sort(tokens)),
        # sequence(1, 0) DESCENDS in Spark, so the zero-token row must
        # short-circuit to the typed empty array
        lambda st: F.when(F.size(st) >= 1, _runs(st)).otherwise(empty),
    )[0]


def subword_count(text: Column, piece_len: int = 4) -> Column:
    """BPE-ish token estimate: words split into fixed-size sub-word
    pieces — ``ceil(len(word)/piece_len)`` summed over words, digits and
    punctuation runs counted as one piece each. Approximates a trained
    BPE vocab's ~piece_len-chars-per-token granularity deterministically
    (the real tokenizer is a lookup; this is the plannable estimator
    used for corpus sizing / cost accounting)."""
    toks = tokenize(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda a, t: a + F.ceil(F.length(t) / piece_len).cast("long"),
    )


def quality_score(
    text: Column, n_chars: Column, tokens: Column | None = None
) -> Column:
    """Composite [0,1] quality heuristic: alphabetic-character ratio,
    stopword presence, and a length prior — the length/punct/stopword
    trio every web-scale corpus filter starts from."""
    alpha_ratio = F.length(F.regexp_replace(text, "[^A-Za-z ]", "")) / F.greatest(
        F.length(text), F.lit(1)
    )
    # let-bind the distinct token array (transform over a 1-element
    # array): the old inline form evaluated tokenize+array_distinct
    # twice per row (intersect + size)
    stop_ratio = F.transform(
        F.array(F.array_distinct(tokens if tokens is not None else tokenize(text))),
        lambda toks: F.size(
            F.array_intersect(toks, F.array(*[F.lit(s) for s in EN_STOPWORDS]))
        )
        / F.greatest(F.size(toks), F.lit(1)),
    )[0]
    len_prior = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    return F.round(0.4 * alpha_ratio + 0.4 * stop_ratio + 0.2 * len_prior, 6)


def lang_scores(text: Column) -> dict[str, Column]:
    toks = F.array_distinct(tokenize(text))
    return {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(s) for s in words]))
        ).cast("long")
        for lang, words in LANG_STOPWORDS.items()
    }


def predicted_lang(scores: dict[str, Column]) -> Column:
    """argmax over languages, first-in-LANG_ORDER tie-break, 'und'
    (undetermined) when no function word hits at all."""
    best = None
    for lang in LANG_ORDER:
        cond = scores[lang] > 0
        for other in LANG_ORDER:
            if other == lang:
                continue
            later = LANG_ORDER.index(other) > LANG_ORDER.index(lang)
            cond = cond & (
                (scores[lang] >= scores[other]) if later else (scores[lang] > scores[other])
            )
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    return best.otherwise("und")


def fingerprint(text: Column, tokens: Column | None = None) -> Column:
    """Canonical content fingerprint: md5 of the token-normalized text
    (case/punctuation/whitespace-insensitive exact identity). NULL for
    ZERO-token docs: no content, no identity claim — Spark's
    ``array_join([], ' ')`` is ``''`` while DuckDB's
    ``array_to_string([], ' ')`` is NULL, so an unguarded md5 both
    diverges cross-engine AND collapses every empty/non-Latin doc (the
    ASCII tokenizer yields zero tokens for all of them) into one
    md5('') "exact-dup" group at corpus scale."""
    return F.transform(
        F.array(tokens if tokens is not None else tokenize(text)),
        lambda toks: F.when(F.size(toks) > 0, F.md5(F.array_join(toks, " "))),
    )[0]


def min_shingle_hash(text: Column, k: int = 3) -> Column:
    """1-perm minhash: min h32 over word k-shingles — a cheap rolling
    content signature for near-identity bucketing."""
    return F.array_min(F.transform(shingles(tokenize(text), k), h32))


def bigrams(tokens: Column) -> Column:
    """Adjacent word pairs ("a b"), order-preserving with repeats —
    the unit of the Gopher-style top-ngram repetition signal.

    zip_with against the 1-shifted copy (each array argument evaluated
    ONCE per row) rather than transform(sequence(0, n-2), i ->
    tokens[i] .. tokens[i+1]), whose per-element indexing re-evaluated
    the whole ``tokens`` expression tree per bigram when the caller
    passed an expression — measured 19x slower at sf0.1 with identical
    output (optimization r13, guide §1.2 per-task work)."""
    n = F.size(tokens)
    return F.when(
        n >= 2,
        F.slice(
            F.zip_with(
                tokens,
                F.slice(tokens, 2, F.lit(1 << 30)),
                lambda x, y: F.concat(x, F.lit(" "), y),
            ),
            1,
            F.greatest(n - 1, F.lit(0)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    text: Column, tokens: Column | None = None
) -> dict[str, Column]:
    """Gopher-style within-document repetition signals, shuffle-free:

    - ``dup_token_frac``: 1 - distinct/total tokens (a page of the same
      word repeated scores ~1);
    - ``top_token_frac``: occurrences of the most frequent token over
      total tokens (Gopher's "fraction of characters in the most common
      n-gram" rule at n=1, token-counted).

    Both are per-row array folds (aggregate over the distinct set
    counting occurrences), so the whole filter is one codegen scan — no
    explode, no groupBy: at 100 TB this matters, the repetition filter
    runs over every document."""
    # Both fractions are computed from ONE let-bound token array
    # (transform over a 1-element array is Catalyst's let-binding: the
    # argument is evaluated once per row and the lambda variable is a
    # cheap reference). The old shape re-evaluated ``tokenize(text)``
    # per distinct token (the filter lambda embedded the tree) and
    # scanned the token array once per distinct token (O(n*d) per row);
    # the top count is now the longest run in the SORTED token array —
    # same integer by definition (occurrence count of the most frequent
    # token), one O(n log n) sort + one O(n) fold. Measured 5.4x at
    # sf0.1, bit-identical output (optimization r13, guide §1.2).
    def _stats(toks: Column) -> Column:
        n = F.size(toks)
        run = F.aggregate(
            F.array_sort(toks),
            F.struct(
                F.lit(0).cast("long").alias("run"),
                F.lit(0).cast("long").alias("best"),
                F.lit(None).cast("string").alias("prev"),
            ),
            lambda acc, x: F.struct(
                F.when(
                    acc["prev"].isNull() | (acc["prev"] != x),
                    F.lit(1).cast("long"),
                )
                .otherwise(acc["run"] + 1)
                .alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(
                        acc["prev"].isNull() | (acc["prev"] != x),
                        F.lit(1).cast("long"),
                    ).otherwise(acc["run"] + 1),
                ).alias("best"),
                x.alias("prev"),
            ),
            lambda acc: acc["best"],
        )
        return F.struct(
            F.round(
                1 - F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1)).cast("double"),
                6,
            ).alias("dup_token_frac"),
            F.round(run / F.greatest(n, F.lit(1)).cast("double"), 6).alias(
                "top_token_frac"
            ),
        )

    both = F.transform(
        F.array(tokens if tokens is not None else tokenize(text)), _stats
    )[0]
    return {
        "dup_token_frac": both["dup_token_frac"],
        "top_token_frac": both["top_token_frac"],
    }


def pack_offsets(
    df, id_col: str, n_col: str, shard_size: int = 1000, stage: bool = True
):
    """Global prefix-sum of ``n_col`` in ``id_col`` order, computed
    hierarchically: contiguous id-range shards aggregate their totals
    (one small shuffle), the shard-count-sized table takes the only
    single-partition cumsum, base offsets broadcast back, and the
    within-shard cumsum is a window partitioned by shard. Returns the
    frame plus ``global_offset`` (sum of all n before this row). The
    naive ``Window.orderBy(id)`` cumsum serializes the corpus through
    one task; this shape keeps every corpus-sized stage parallel.

    The input feeds TWO consumers (the shard-totals branch and the
    output join), so ``stage=True`` persists it — without that, the
    whole upstream plan (e.g. a curation funnel's dedup shuffle) runs
    twice. Set False only when the input is a bare scan."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    sized = df.withColumn(
        "__shard", (F.col(id_col) / shard_size).cast("long")
    )
    if stage:
        sized = sized.persist(StorageLevel.MEMORY_AND_DISK)
    shard_tot = sized.groupBy("__shard").agg(F.sum(n_col).alias("__tot"))
    # NOTE: this unpartitioned window triggers Spark's "No Partition
    # Defined for Window operation" warning — intentionally: it runs
    # over the SHARD-TOTALS frame (corpus_size / shard_size rows, e.g.
    # 100k at 10B docs), never the corpus. Single-partition is the
    # correct plan for a bounded aggregate this small.
    w_shard = Window.orderBy("__shard").rowsBetween(Window.unboundedPreceding, -1)
    shard_base = shard_tot.select(
        "__shard",
        F.coalesce(F.sum("__tot").over(w_shard), F.lit(0)).alias("__base"),
    )
    w_local = (
        Window.partitionBy("__shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        sized.join(F.broadcast(shard_base), "__shard")
        # a row with NULL length has NO position in the packed stream
        # (its n contributes nothing to either engine's cumsum, so
        # later offsets are unaffected) — without the guard the
        # preceding-rows window still assigns it the running offset,
        # silently placing an unmeasurable document (round-7 NULL-input
        # fuzz; the oracle's cumsum-minus-n form is NULL there already)
        .withColumn(
            "global_offset",
            F.when(
                F.col(n_col).isNotNull(),
                F.col("__base")
                + F.coalesce(F.sum(n_col).over(w_local), F.lit(0)),
            ),
        )
        .drop("__shard", "__base")
    )


def rebalance_keep(
    id_col: Column, group_col: Column, rates_pct: dict[str, int], default_pct: int = 100
) -> Column:
    """Deterministic hash-based stratified downsampling: keep a row iff
    ``h32(id) % 100 <`` its group's target percentage. The decision is a
    pure function of the row id — no sampling state, no RNG, identical
    on re-runs and across engines (the property that makes corpus
    rebalancing reproducible at 100 TB and lets retries/backfills agree
    on the kept set). One codegen scan, no shuffle."""
    bucket = h32(id_col.cast("string")) % 100
    rate = None
    for g, pct in rates_pct.items():
        rate = (
            F.when(group_col == g, pct)
            if rate is None
            else rate.when(group_col == g, pct)
        )
    rate = F.lit(default_pct) if rate is None else rate.otherwise(default_pct)
    return bucket < rate


def domain_cap(
    df: DataFrame,
    group_col: str,
    order_col: Column,
    tiebreak_col: str,
    cap: int,
) -> DataFrame:
    """Per-domain document cap: keep at most ``cap`` rows per
    ``group_col``, preferring higher ``order_col`` (ties broken
    deterministically by ``tiebreak_col``). The standard web-corpus
    guard against a single domain dominating the training mix.

    Plan shape: one rank window per group. Spark rewrites the
    ``row_number() <= cap`` filter into WindowGroupLimit, which takes
    the per-group top-``cap`` on the MAP side before the shuffle — at
    100 TB the exchange moves at most ``cap`` rows per domain, not the
    domain's whole corpus."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        order_col.desc(), F.col(tiebreak_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def train_split(
    id_col: Column,
    buckets: int = 1000,
    test_per_mille: int = 10,
    val_per_mille: int = 30,
) -> Column:
    """Deterministic train/val/test assignment: hash the document id
    into ``buckets`` and carve fixed per-mille ranges for test and val.
    A pure function of the id — no RNG state, so every re-run, backfill,
    and engine assigns each document to the same split (the property
    that keeps eval sets stable while the corpus is re-curated), and
    near-dup-aware splitting composes by hashing the CLUSTER id instead
    of the doc id. One codegen scan, no shuffle."""
    b = h32(id_col.cast("string")) % buckets
    return (
        F.when(b < test_per_mille, "test")
        .when(b < test_per_mille + val_per_mille, "val")
        .otherwise("train")
    )


def token_budget_cap(
    df,
    quality_col: str,
    n_col: str,
    id_col: str,
    budget: int,
    buckets: int = 1000,
):
    """Cut the corpus to a global token budget, taking documents in
    quality order (best first; ties by id): keep every row whose
    cumulative token count BEFORE it is under ``budget`` — the "fill
    the training mix to N tokens" operator.

    A naive global cumsum is ``Window.orderBy(quality desc)`` — one
    task. Here the quality axis itself provides the shards: bucket =
    ``floor((1-q) * buckets)`` is a pure row-local function that is
    monotone in the global order, so per-bucket totals (one small
    shuffle) + a bucket-count-sized cumsum + a within-bucket window
    reproduce the exact global prefix sum with every corpus-sized stage
    parallel. Same hierarchy as pack_offsets, with value-range sharding
    instead of id-range sharding (works for any bounded sort key).
    Returns the kept rows plus ``prior_tokens``."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    q = F.col(quality_col)
    sized = df.withColumn(
        "__qb", F.floor((F.lit(1.0) - q) * buckets).cast("long")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bucket_tot = sized.groupBy("__qb").agg(F.sum(n_col).alias("__tot"))
    # unpartitioned window over the BUCKET-TOTALS frame (<= `buckets`
    # rows) — the "No Partition Defined" warning is benign here; see
    # the matching note in pack_offsets
    w_b = Window.orderBy("__qb").rowsBetween(Window.unboundedPreceding, -1)
    bucket_base = bucket_tot.select(
        "__qb", F.coalesce(F.sum("__tot").over(w_b), F.lit(0)).alias("__base")
    )
    w_local = (
        Window.partitionBy("__qb")
        .orderBy(q.desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = (
        sized.join(F.broadcast(bucket_base), "__qb")
        .withColumn(
            "prior_tokens",
            (F.col("__base") + F.coalesce(F.sum(n_col).over(w_local), F.lit(0)))
            .cast("long"),
        )
        .drop("__qb", "__base")
    )
    return placed.filter(F.col("prior_tokens") < budget)


def mix_epochs(
    df,
    id_col: str,
    group_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
):
    """Deterministic mixture weighting: replicate each document
    ``weights[group]`` times on average — ``floor(w)`` guaranteed
    copies, plus one more iff ``h32(id) % 100 < frac(w) * 100`` — and
    emit (row, epoch). The fractional epoch is a pure function of the
    id (same property as rebalance_keep), so the realized mixture is
    reproducible and a re-run of any partition emits identical copies.
    Weights below 1 subsample (floor = 0); the explode is row-local —
    no shuffle, output size = sum of realized weights."""
    w = None
    for g, wt in weights.items():
        w = F.when(F.col(group_col) == g, float(wt)) if w is None else w.when(
            F.col(group_col) == g, float(wt)
        )
    w = F.lit(float(default_weight)) if w is None else w.otherwise(
        float(default_weight)
    )
    whole = F.floor(w).cast("long")
    frac_pct = ((w - F.floor(w)) * 100.0).cast("long")
    extra = (h32(F.col(id_col).cast("string")) % 100 < frac_pct).cast("long")
    n_copies = whole + extra
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
        .withColumn("epoch", F.col("epoch").cast("long"))
    )


def passage_dedup(
    df,
    text_col: str,
    id_col: str,
    passage_tokens: int = 12,
):
    """Passage-level (sub-document) dedup — the boilerplate-removal pass
    of a training pipeline: repeated headers/footers/navigation chunks
    are duplicated ACROSS documents even when no two documents are
    near-duplicates, so whole-doc dedup never catches them.

    Each document splits into non-overlapping ``passage_tokens``-token
    windows; a passage survives only in the document with the smallest
    id that contains it (ownership via ``min(doc_id) over (partition by
    passage_hash)`` — ONE shuffle keyed by the 32-bit passage hash,
    never the passage text), then each document reassembles from its
    surviving passages in position order (second shuffle, keyed by doc).
    At 100 TB both shuffles move (hash, doc_id, pos) triples plus only
    the KEPT passage strings; the window's min aggregates map-side.

    Returns (id, n_passages, n_kept, kept_text).
    """
    from pyspark.sql import Window

    # let-bind the token array (transform over a 1-element array): the
    # window lambda slices ``toks`` per passage index, which re-evaluated
    # the whole tokenize tree per window when embedded (optimization
    # r13, same fix as shingles/bigrams)
    def _windows(toks: Column) -> Column:
        n_pass = F.ceil(F.size(toks) / F.lit(passage_tokens)).cast("long")
        # guard: sequence(1, 0) DESCENDS in Spark — a token-less doc must
        # yield zero passages, not two bogus ones
        return F.when(
            n_pass >= 1,
            F.transform(
                F.sequence(F.lit(1), n_pass),
                lambda i: F.array_join(
                    F.slice(toks, (i - 1) * passage_tokens + 1, passage_tokens),
                    " ",
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    windows = F.transform(F.array(tokenize(F.col(text_col))), _windows)[0]
    passages = df.select(
        F.col(id_col), F.posexplode(windows).alias("pos", "passage")
    )
    ph = h32(F.col("passage"))
    w = Window.partitionBy(ph)
    marked = passages.withColumn(
        "__keep", F.col(id_col) == F.min(id_col).over(w)
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_passages"),
            F.sum(F.col("__keep").cast("long")).cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__keep"),
                                F.struct(F.col("pos"), F.col("passage")),
                            )
                        )
                    ),
                    lambda s: s["passage"],
                ),
                " ",
            ).alias("kept_text"),
        )
    )


ENTROPY_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "


def char_entropy(text: Column) -> Column:
    """Character-distribution Shannon entropy (bits) over a fixed
    alphabet — the cheap stand-in for the gzip-compressibility quality
    signal: machine-generated/repetitive text scores low, natural prose
    ~4.1 bits. Counting is replace()-based (length delta per alphabet
    char), so the whole thing is one codegen expression — no char-array
    explode, no shuffle; term order is the fixed alphabet order on both
    engines, keeping the double fold bit-identical."""
    # Chained let-bindings (transform over a 1-element array evaluates
    # its argument once): the lowered string, then the 37 per-char
    # counts as ONE array, then the alphabet total. The old flat
    # expression inlined each count tree (lower + replace + 2 lengths)
    # into the n-sum AND each entropy term's guard/p/log — ~4 copies of
    # every count, ~150 full-text scans per row; measured 33s -> 0.5s
    # at sf0.1 with bit-identical output (optimization r13, guide §1.2).
    # Fold order is the fixed alphabet order in both shapes, so the
    # double summation is unchanged: integer count sum is
    # order-exact, and the entropy fold starts 0.0 + term_0 + ... which
    # is bitwise equal to term_0 + term_1 + ... (terms are >= 0.0).
    alph = F.array(*[F.lit(c) for c in ENTROPY_ALPHABET])

    def _entropy(s: Column) -> Column:
        counts = F.transform(
            alph, lambda ch: F.length(s) - F.length(F.replace(s, ch))
        )

        def _fold(cnts: Column) -> Column:
            n = F.greatest(
                F.aggregate(cnts, F.lit(0), lambda a, c: a + c), F.lit(1)
            ).cast("double")

            def _sum(nn: Column) -> Column:
                # natural log on both engines (ln parity is proven by
                # t_lm_quality); bits = nats / ln(2) with the same
                # literal
                return F.aggregate(
                    cnts,
                    F.lit(0.0),
                    lambda acc, c: acc
                    + F.when(c > 0, -(c / nn) * F.log(c / nn)).otherwise(
                        F.lit(0.0)
                    ),
                )

            return F.transform(F.array(n), _sum)[0]

        return F.transform(F.array(counts), _fold)[0]

    ent = F.transform(F.array(F.lower(text)), _entropy)[0]
    return F.round(ent / F.lit(0.6931471805599453), 6)


def char_entropy_sql(text_expr: str) -> str:
    """DuckDB mirror of :func:`char_entropy` — same alphabet order,
    same replace()-count, same log2 fold."""
    counts = [
        f"(len(lower({text_expr})) - len(replace(lower({text_expr}), '{c}', '')))"
        for c in ENTROPY_ALPHABET
    ]
    n = " + ".join(counts)
    terms = [
        f"CASE WHEN {c} > 0 THEN -(CAST({c} AS DOUBLE) / __n) * ln(CAST({c} AS DOUBLE) / __n) ELSE 0.0 END"
        for c in counts
    ]
    return (
        f"round((SELECT {' + '.join(terms)} FROM (SELECT CAST(greatest({n}, 1) AS DOUBLE) AS __n))"
        f" / 0.6931471805599453, 6)"
    )
