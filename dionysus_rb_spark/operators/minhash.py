"""MinHash + LSH near-duplicate detection, Spark-first.

Pipeline (the standard web-dedup shape: shingle -> minhash -> band ->
bucket-join -> verify):
  1. word k-shingles per doc (distinct)
  2. num_perm minhash values  sig_i = min over shingles of
     (a_i * h32(shingle) + b_i) mod (2^31-1)
  3. bands of r rows; band key = "band_idx:sig values"
  4. docs sharing any band bucket are candidate pairs (one shuffle on
     the band key — never an all-pairs join)
  5. candidates verified with exact shingle-set Jaccard >= threshold

Permutation parameters are generated from a fixed seed and inlined both
here and into the DuckDB oracle SQL, so the whole approximate pipeline
is deterministic and cross-engine checkable.

Scale note: the only shuffles are groupBy(doc) for shingles (map-side)
and the band-bucket self-join; bucket skew (a degenerate band shared by
thousands of docs) is the classic hazard — cap bucket width
(``max_bucket``) exactly like production LSH dedups do, and let AQE
handle residual skew.
"""

from __future__ import annotations

import json
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import MERSENNE_PRIME, h32, shingles, tokenize

NUM_PERM = 16
BANDS = 4
ROWS_PER_BAND = NUM_PERM // BANDS


def perm_params(num_perm: int = NUM_PERM, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_PRIME) | 1, rng.randrange(0, MERSENNE_PRIME))
        for _ in range(num_perm)
    ]


def doc_shingles(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """Per-doc distinct shingle sets; ZERO-token docs (empty,
    whitespace-only, or non-Latin under the ASCII tokenizer) are
    excluded — they have no content to near-dup match on, so they never
    band, never pair, and pass through the kept-decision join as
    uniques. Without this, an empty signature still produces band keys
    (concat_ws skips the NULL minhashes), silently collapsing every
    zero-token doc into one candidate bucket."""
    return (
        # the zero-token gate tests LOWERCASED text for one [a-z0-9] —
        # tokenize's own domain, so the equivalence with "tokenize()
        # yields >= 1 token" is exact in BOTH directions (a raw-text
        # [a-zA-Z0-9] gate missed characters that lowercase INTO ascii,
        # e.g. Kelvin K and dotted İ — round-7 review find). Still a
        # cheap scan-level predicate Catalyst pushes below the
        # projection —
        # filtering on size(shingle_set) instead makes the pushed-down
        # predicate re-evaluate the whole tokenize+shingle expression
        # per row on top of the projection's own copy (measured 4.3x on
        # dd_minhash_lsh at sf0.1)
        df.filter(F.lower(F.col(text_col)).rlike("[a-z0-9]"))
        .select(
            F.col(id_col).alias("doc_id"),
            shingles(tokenize(F.col(text_col)), k).alias("shingle_set"),
        )
        .withColumn("shingle_hashes", F.transform("shingle_set", h32))
    )


def minhash_signature(
    sh: DataFrame, num_perm: int = NUM_PERM, seed: int = 42
) -> DataFrame:
    params = perm_params(num_perm, seed)
    # One F.expr string instead of ~6 Column calls per permutation: the
    # assembled tree is identical, but driver-side construction drops
    # from ~100 Py4J round trips to one (the same expression-string
    # technique pq.py uses for ADC distance tables). h32 values are
    # longs, so the int literals promote and all arithmetic stays int64.
    sig_sql = "array(%s)" % ", ".join(
        f"array_min(transform(shingle_hashes,"
        f" h -> (h * {a} + {b}) % {MERSENNE_PRIME}))"
        for a, b in params
    )
    return sh.withColumn("signature", F.expr(sig_sql))


def band_keys_expr(bands: int = BANDS, rows_per_band: int = ROWS_PER_BAND) -> str:
    """SQL expression string for a signature's band keys — one
    "<band_idx>,<sig values>" string per band (shared by the batch
    pipeline, the delta gate, and the validation harnesses so every
    consumer banding-joins on byte-identical keys)."""
    return "array(%s)" % ", ".join(
        "concat_ws(',', '%d', %s)"
        % (
            b,
            ", ".join(
                f"cast(signature[{i}] as string)"
                for i in range(b * rows_per_band, (b + 1) * rows_per_band)
            ),
        )
        for b in range(bands)
    )


def lsh_candidate_pairs(
    signed: DataFrame,
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing >= 1 band bucket.

    One shuffle total: groupBy(band_key) collects each bucket's doc ids,
    and ordered pairs are expanded bucket-locally (no self-join, so the
    upstream signature pipeline is computed exactly once). The skew guard
    is free — a degenerate bucket is just a long collected list, dropped
    by size before expansion.
    """
    band_rows = signed.select(
        "doc_id", F.explode(F.expr(band_keys_expr(bands, rows_per_band))).alias("band_key")
    )
    buckets = band_rows.groupBy("band_key").agg(
        F.array_sort(F.collect_set("doc_id")).alias("ids")
    )
    buckets = buckets.filter(F.size("ids") >= 2)
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket)
    pairs_arr = F.expr(
        "flatten(transform(ids, (x, i) ->"
        " transform(slice(ids, i + 2, size(ids)),"
        " y -> named_struct('doc_a', x, 'doc_b', y))))"
    )
    return (
        buckets.select(F.explode(pairs_arr).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def verify_jaccard(
    pairs: DataFrame, sh: DataFrame, threshold: float
) -> DataFrame:
    """Exact shingle-set Jaccard on candidate pairs only."""
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingle_set").alias("__sa"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle_set").alias("__sb"))
    joined = pairs.join(sa, "doc_a").join(sb, "doc_b")
    inter = F.size(F.array_intersect("__sa", "__sb"))
    union = F.size(F.array_union("__sa", "__sb"))
    return (
        joined.withColumn("n_intersect", inter.cast("long"))
        .withColumn("n_union", union.cast("long"))
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_intersect", "n_union", "jaccard")
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = NUM_PERM,
    bands: int = BANDS,
    threshold: float = 0.7,
    seed: int = 42,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Full pipeline -> verified near-duplicate pairs.

    ``max_bucket`` mirrors :func:`minhash_lsh_dedup_sql`'s parameter of
    the same name — both sides must cap (or not cap) identically for
    cross-engine parity, so the knob is exposed here rather than only
    on the oracle.

    The shingle stage is persisted: it feeds the signature branch once
    and the verification join twice; recomputing tokenize+shingle+md5
    three times dominates runtime otherwise (at cluster scale this stage
    would be a checkpointed/staged table).
    """
    from pyspark.storagelevel import StorageLevel

    sh = doc_shingles(df, text_col, id_col, k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    signed = minhash_signature(sh, num_perm, seed)
    pairs = lsh_candidate_pairs(signed, bands, num_perm // bands, max_bucket)
    return verify_jaccard(pairs, sh, threshold)


def delta_dedup_gate(
    delta: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = NUM_PERM,
    bands: int = BANDS,
    threshold: float = 0.7,
    seed: int = 42,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Incremental dedup: admit a NEW batch (``delta``) against an
    EXISTING corpus (``index``) without re-deduping the corpus.

    At 100 TB nobody re-runs whole-corpus dedup per arriving batch —
    the corpus side becomes a PERSISTED band-key index table
    ``(band_key, doc_id)`` bucketed on band_key (plus the shingle-set
    store for verification), and each delta batch pays one
    band-key join against it plus one verify join: cost is
    O(delta + matched buckets), never O(corpus). This operator is that
    gate with the index side computed inline (so the whole thing stays
    oracle-checkable on one table); the banding/verify semantics are
    byte-identical to the batch pipeline (band_keys_expr /
    verify-Jaccard with the same rounding), so a doc rejected here is
    exactly a doc the full pipeline would have paired.

    Returns one row per delta doc: ``doc_id``, ``n_dup_matches`` (the
    count of DISTINCT index docs with verified Jaccard >= threshold),
    and ``kept`` (1 when n_dup_matches = 0). Within-delta duplicates
    are NOT resolved here — that is the normal batch pipeline's job on
    the admitted batch; this gate answers only "is it already in the
    corpus". Zero-token delta docs have no shingles, band with nothing,
    and are admitted (consistent with the pipeline's zero-token
    exclusion); ``max_bucket`` caps the INDEX side — a degenerate index
    bucket (> max_bucket docs sharing a band key) emits no candidates,
    mirroring the batch pipeline's bucket drop.
    """
    from pyspark.storagelevel import StorageLevel

    sh_d = doc_shingles(delta, text_col, id_col, k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sh_i = doc_shingles(index, text_col, id_col, k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    keys = band_keys_expr(bands, num_perm // bands)
    bd = minhash_signature(sh_d, num_perm, seed).select(
        F.col("doc_id").alias("delta_id"),
        F.explode(F.expr(keys)).alias("band_key"),
    )
    bi = minhash_signature(sh_i, num_perm, seed).select(
        F.col("doc_id").alias("index_id"),
        F.explode(F.expr(keys)).alias("band_key"),
    )
    sb = sh_i.select(
        F.col("doc_id").alias("index_id"), F.col("shingle_set").alias("__sb")
    )
    return _gate_against(delta, id_col, sh_d, bd, bi, sb, threshold, max_bucket)


def _gate_against(
    delta: DataFrame,
    id_col: str,
    sh_d: DataFrame,
    bd: DataFrame,
    bi: DataFrame,
    sb: DataFrame,
    threshold: float,
    max_bucket: int | None,
) -> DataFrame:
    """The join half of the delta gate, shared by the inline and the
    persisted-index paths: band-bucket join -> exact-Jaccard verify ->
    distinct-match count -> per-delta-doc decision. ``bd``/``bi`` are
    (delta_id|index_id, band_key) rows; ``sb`` is (index_id, __sb
    shingle_set); ``sh_d`` is the delta shingle frame."""
    if max_bucket is not None:
        # window, not agg+join: the width count rides the same band_key
        # partitioning the bucket join needs, so the cap costs no extra
        # shuffle (the exchange is reused). Applied at GATE time, so a
        # persisted index stores uncapped band rows and the cap stays a
        # query-time knob.
        from pyspark.sql import Window

        bi = bi.withColumn(
            "__w", F.count("*").over(Window.partitionBy("band_key"))
        ).filter(F.col("__w") <= max_bucket).drop("__w")
    # no distinct() on candidates: a pair banding in several bands
    # verifies identically each time, and the final count is DISTINCT
    # over index ids — same result, one less corpus-sized shuffle
    cand = bd.join(bi, "band_key").select("delta_id", "index_id")
    sa = sh_d.select(
        F.col("doc_id").alias("delta_id"), F.col("shingle_set").alias("__sa")
    )
    inter = F.size(F.array_intersect("__sa", "__sb"))
    union = F.size(F.array_union("__sa", "__sb"))
    matches = (
        cand.join(sa, "delta_id")
        .join(sb, "index_id")
        .filter(F.round(inter / union, 6) >= threshold)
        .groupBy("delta_id")
        .agg(F.count_distinct("index_id").alias("__n"))
    )
    return (
        delta.select(F.col(id_col).alias("doc_id"))
        .join(matches.withColumnRenamed("delta_id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias(
                "n_dup_matches"
            ),
            (F.coalesce(F.col("__n"), F.lit(0)) == 0)
            .cast("long")
            .alias("kept"),
        )
    )


_INDEX_MANIFEST = "_dedup_index_manifest.json"


def build_dedup_index(
    index: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = NUM_PERM,
    bands: int = BANDS,
    seed: int = 42,
    mode: str = "overwrite",
) -> None:
    """Persist the corpus side of the delta gate as a reusable artifact:
    ``<path>/bands`` — (index_id, band_key) rows repartitioned on
    band_key — ``<path>/shingles`` — (index_id, shingle_set) — and a
    manifest recording the signature parameters (k, num_perm, bands,
    seed), which are INDEX properties: every future gate call reads
    them from the manifest, so a delta can never be signed with
    different constants than the corpus it is gated against.

    This is the production shape the inline :func:`delta_dedup_gate`
    docstring promises: the corpus pays its shingle+signature cost
    once, and each arriving delta pays O(delta + matched buckets). On a
    cluster the bands relation belongs in a band_key-bucketed table so
    the gate join co-locates without a shuffle; plain parquet (this
    function) still confines the per-delta cost to one keyed shuffle
    per side.

    ``mode="append"`` adds newly admitted docs to an existing index
    (band rows are per-doc independent, so growth is incremental) —
    but ONLY under the recorded signature constants: band keys signed
    with a different (k, num_perm, bands, seed) never collide with the
    corpus's keys, so a mismatched append would make every future
    delta silently sail past the appended docs. Validated against the
    manifest BEFORE any data lands, like the corpus sink's layout
    check. Caller supplies only NEW docs — the index does not dedup
    itself (gate first, then append the admitted batch).
    """
    from ..sources.corpus_sink import _fs_exists, _fs_read_text, _fs_write_text

    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be 'overwrite' or 'append', got {mode!r}")
    spark = index.sparkSession
    params = {"k": k, "num_perm": num_perm, "bands": bands, "seed": seed}
    manifest_path = f"{path.rstrip('/')}/{_INDEX_MANIFEST}"
    if mode == "append":
        if not _fs_exists(spark, manifest_path):
            raise ValueError(
                f"append into {path!r}: no index manifest — build the "
                "index with mode='overwrite' first"
            )
        recorded = json.loads(_fs_read_text(spark, manifest_path))
        if recorded != params:
            raise ValueError(
                "append signature-parameter mismatch: index recorded "
                f"{recorded!r}, append passed {params!r} — mismatched "
                "band keys never collide, so the appended docs would be "
                "invisible to every future gate"
            )
    sh_i = doc_shingles(index, text_col, id_col, k)
    signed = minhash_signature(sh_i, num_perm, seed)
    keys = band_keys_expr(bands, num_perm // bands)
    (
        signed.select(
            F.col("doc_id").alias("index_id"),
            F.explode(F.expr(keys)).alias("band_key"),
        )
        .repartition("band_key")
        .write.mode(mode)
        .parquet(f"{path.rstrip('/')}/bands")
    )
    (
        sh_i.select(
            F.col("doc_id").alias("index_id"),
            F.col("shingle_set").alias("__sb"),
        )
        .write.mode(mode)
        .parquet(f"{path.rstrip('/')}/shingles")
    )
    if mode == "overwrite":
        _fs_write_text(spark, manifest_path, json.dumps(params))


def delta_dedup_gate_indexed(
    delta: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Gate a delta batch against a PERSISTED dedup index
    (:func:`build_dedup_index`) — result-identical to
    :func:`delta_dedup_gate` over the same corpus (pinned by test), but
    the corpus-side shingle/signature work is amortized into the index
    build instead of re-run per batch. Signature parameters come from
    the index manifest; ``threshold`` and ``max_bucket`` remain
    query-time knobs (the index stores uncapped band rows)."""
    from pyspark.storagelevel import StorageLevel

    from ..sources.corpus_sink import _fs_read_text

    spark = delta.sparkSession
    manifest = json.loads(
        _fs_read_text(spark, f"{index_path.rstrip('/')}/{_INDEX_MANIFEST}")
    )
    k, num_perm = manifest["k"], manifest["num_perm"]
    bands, seed = manifest["bands"], manifest["seed"]
    sh_d = doc_shingles(delta, text_col, id_col, k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    keys = band_keys_expr(bands, num_perm // bands)
    bd = minhash_signature(sh_d, num_perm, seed).select(
        F.col("doc_id").alias("delta_id"),
        F.explode(F.expr(keys)).alias("band_key"),
    )
    bi = spark.read.parquet(f"{index_path.rstrip('/')}/bands")
    sb = spark.read.parquet(f"{index_path.rstrip('/')}/shingles")
    return _gate_against(delta, id_col, sh_d, bd, bi, sb, threshold, max_bucket)


# ---------------------------------------------------------------------------
# DuckDB oracle SQL mirror (inlined perm params, same constants)
# ---------------------------------------------------------------------------


def minhash_lsh_dedup_sql(
    k: int = 3,
    num_perm: int = NUM_PERM,
    bands: int = BANDS,
    threshold: float = 0.7,
    seed: int = 42,
    max_bucket: int | None = 1000,
) -> str:
    """DuckDB mirror of the full pipeline, INCLUDING the ``max_bucket``
    degenerate-bucket drop: a band bucket above the cap emits no
    candidate pairs on the Spark side, so the oracle must apply the
    same size filter or the two sides diverge once a bucket saturates
    (the SimHash twin broke exactly this way at sf0.1; MinHash buckets
    only collect truly-similar docs, so saturation needs >cap
    near-identical docs — rarer, but the semantics must still match)."""
    from ..functions.hashing import h32_sql, shingles_sql, tokenize_sql

    params = perm_params(num_perm, seed)
    rows = num_perm // bands
    sig_exprs = ",\n      ".join(
        f"list_aggregate(list_transform(shingle_hashes,"
        f" h -> (h * {a} + {b}) % {MERSENNE_PRIME}), 'min') AS s{i}"
        for i, (a, b) in enumerate(params)
    )
    band_keys = ", ".join(
        "concat_ws(',', '%d', %s)"
        % (b, ", ".join(f"CAST(s{i} AS VARCHAR)" for i in range(b * rows, (b + 1) * rows)))
        for b in range(bands)
    )
    return f"""
    WITH sh AS (
      SELECT doc_id,
             {shingles_sql(tokenize_sql('text'), k)} AS shingle_set
      FROM documents
      WHERE regexp_matches(lower(text), '[a-z0-9]')
    ),
    hashed AS (
      SELECT doc_id, shingle_set,
             list_transform(shingle_set, s -> {h32_sql('s')}) AS shingle_hashes
      FROM sh
    ),
    signed AS (
      SELECT doc_id, shingle_set,
      {sig_exprs}
      FROM hashed
    ),
    band_rows AS (
      SELECT doc_id, unnest([{band_keys}]) AS band_key FROM signed
    ),
    kept_buckets AS (
      SELECT band_key FROM band_rows GROUP BY band_key
      {f"HAVING count(*) <= {max_bucket}" if max_bucket is not None else ""}
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM band_rows a
      JOIN kept_buckets kb ON kb.band_key = a.band_key
      JOIN band_rows b
        ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT p.doc_a, p.doc_b,
           CAST(len(list_intersect(sa.shingle_set, sb.shingle_set)) AS BIGINT)
               AS n_intersect,
           CAST(len(list_distinct(sa.shingle_set || sb.shingle_set)) AS BIGINT)
               AS n_union,
           round(CAST(len(list_intersect(sa.shingle_set, sb.shingle_set)) AS DOUBLE)
                 / len(list_distinct(sa.shingle_set || sb.shingle_set)), 6) AS jaccard
    FROM pairs p
    JOIN hashed sa ON sa.doc_id = p.doc_a
    JOIN hashed sb ON sb.doc_id = p.doc_b
    WHERE round(CAST(len(list_intersect(sa.shingle_set, sb.shingle_set)) AS DOUBLE)
                / len(list_distinct(sa.shingle_set || sb.shingle_set)), 6) >= {threshold}
    """

def delta_dedup_gate_sql(
    delta_pred: str,
    index_pred: str,
    k: int = 3,
    num_perm: int = NUM_PERM,
    bands: int = BANDS,
    threshold: float = 0.7,
    seed: int = 42,
    max_bucket: int | None = 1000,
) -> str:
    """DuckDB mirror of :func:`delta_dedup_gate` over the ``documents``
    view, with the delta/index membership given as SQL predicates on
    its columns. Same inlined permutation constants, band-key shape,
    INDEX-side bucket cap, and verify rounding as the Spark side, so
    the admit/reject decision is cross-engine exact."""
    from ..functions.hashing import h32_sql, shingles_sql, tokenize_sql

    params = perm_params(num_perm, seed)
    rows = num_perm // bands
    sig_exprs = ",\n      ".join(
        f"list_aggregate(list_transform(shingle_hashes,"
        f" h -> (h * {a} + {b}) % {MERSENNE_PRIME}), 'min') AS s{i}"
        for i, (a, b) in enumerate(params)
    )
    band_keys = ", ".join(
        "concat_ws(',', '%d', %s)"
        % (b, ", ".join(f"CAST(s{i} AS VARCHAR)" for i in range(b * rows, (b + 1) * rows)))
        for b in range(bands)
    )

    def side(name: str, pred: str) -> str:
        return f"""
    sh_{name} AS (
      SELECT doc_id,
             {shingles_sql(tokenize_sql('text'), k)} AS shingle_set
      FROM documents
      WHERE ({pred}) AND regexp_matches(lower(text), '[a-z0-9]')
    ),
    hashed_{name} AS (
      SELECT doc_id, shingle_set,
             list_transform(shingle_set, s -> {h32_sql('s')}) AS shingle_hashes
      FROM sh_{name}
    ),
    signed_{name} AS (
      SELECT doc_id, shingle_set,
      {sig_exprs}
      FROM hashed_{name}
    ),
    band_{name} AS (
      SELECT doc_id, unnest([{band_keys}]) AS band_key FROM signed_{name}
    )"""

    cap = (
        f"HAVING count(*) <= {max_bucket}" if max_bucket is not None else ""
    )
    jac = (
        "round(CAST(len(list_intersect(sa.shingle_set, sb.shingle_set))"
        " AS DOUBLE)"
        " / len(list_distinct(sa.shingle_set || sb.shingle_set)), 6)"
    )
    return f"""
    WITH {side('d', delta_pred)},
    {side('i', index_pred)},
    kept_buckets AS (
      SELECT band_key FROM band_i GROUP BY band_key {cap}
    ),
    cand AS (
      SELECT DISTINCT bd.doc_id AS delta_id, bi.doc_id AS index_id
      FROM band_d bd
      JOIN kept_buckets kb ON kb.band_key = bd.band_key
      JOIN band_i bi ON bi.band_key = bd.band_key
    ),
    matches AS (
      SELECT c.delta_id, count(*) AS n
      FROM cand c
      JOIN hashed_d sa ON sa.doc_id = c.delta_id
      JOIN hashed_i sb ON sb.doc_id = c.index_id
      WHERE {jac} >= {threshold}
      GROUP BY c.delta_id
    )
    SELECT d.doc_id,
           CAST(coalesce(m.n, 0) AS BIGINT) AS n_dup_matches,
           CAST(CASE WHEN coalesce(m.n, 0) = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS kept
    FROM (SELECT doc_id FROM documents WHERE ({delta_pred})) d
    LEFT JOIN matches m ON m.delta_id = d.doc_id
    """
