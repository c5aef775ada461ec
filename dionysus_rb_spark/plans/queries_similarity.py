"""Similarity-search queries over ``embeddings`` (beyond-reference,
BASELINE.json north star): exact brute-force cosine top-k as the
baseline, hyperplane-LSH bucketing as the scale path — both
deterministic and oracle-checked (fold-order-identical double math)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity
from ..tables import ensure_min_parallelism, load_table
from .catalog import query


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ensure_min_parallelism(load_table(spark, sf_dir, "embeddings"))

QUERY_IDS = [0, 1, 2, 3, 4]
LSH_PLANES = similarity.planes(num_planes=8, dim=64, seed=42)


@query(
    "ann_bruteforce_topk",
    refs="beyond:similarity",
    bench=True,
    pure_plan=True,
    oracle=similarity.brute_force_topk_sql(QUERY_IDS, k=10),
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for a query batch: broadcast(queries) x one
    corpus scan, per-query rank — the recall=1.0 ANN baseline."""
    emb = _emb(spark, sf_dir)
    return similarity.brute_force_topk(emb, QUERY_IDS, k=10)


@query(
    "ann_lsh_neardup",
    refs="beyond:similarity",
    bench=True,
    pure_plan=True,
    oracle=similarity.lsh_near_dup_sql(LSH_PLANES, threshold=0.2, max_bucket=1000),
)
def ann_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH near-dup: 8 deterministic sign planes bucket the
    corpus (2^8 buckets — a testdata setting; scale num_planes with the
    corpus); capped bucket-local pair expansion + exact cosine verify
    within buckets only — the O(n·bucket) scale path vs the O(n^2)
    exact join, skew-proof via the max_bucket drop."""
    emb = _emb(spark, sf_dir)
    return similarity.lsh_near_dup_pairs(
        emb, threshold=0.2, num_planes=8, seed=42, dim=64, max_bucket=1000
    )


@query(
    "ann_ivf_topk",
    refs="beyond:similarity",
    oracle=similarity.ivf_topk_sql(QUERY_IDS, k=10, n_centroids=8, nprobe=2),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: corpus bucketed into centroid cells (broadcast
    assignment, shuffle-free), queries probe their 2 nearest of 8 cells,
    exact cosine rank within — the inverted-file scale path next to the
    LSH one."""
    emb = _emb(spark, sf_dir)
    return similarity.ivf_topk(emb, QUERY_IDS, k=10, n_centroids=8, nprobe=2)


@query(
    "emb_label_centroids",
    refs="beyond:similarity",
    oracle=f"""
    WITH base AS (
        SELECT label, v FROM (
          SELECT label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS v
          FROM embeddings) t
        WHERE {similarity.finite_vec_sql('v')}
    ),
    un AS (
        SELECT label,
               unnest(range(len(v))) AS idx,
               unnest(v) AS x
        FROM base
    ),
    dims AS (
        SELECT label, idx,
               CASE WHEN abs(round(avg(x), 6)) < 1e9
                    THEN CAST(round(avg(x), 6) AS DECIMAL(38, 6)) END AS m
        FROM un GROUP BY label, idx
    )
    SELECT label,
           (SELECT count(*) FROM base e
            WHERE e.label IS NOT DISTINCT FROM dims.label) AS n,
           array_to_string(array_agg(coalesce(CAST(m AS VARCHAR), '')
                                     ORDER BY idx), ',') AS centroid
    FROM dims GROUP BY label
    """,
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed vector mean per label (the k-means/IVF training inner
    step): posexplode to (label, dim, value), partial-aggregated avg per
    dimension — one shuffle on (label, dim), never a driver-side vector
    sum — then reassembled in dimension order. Non-finite vectors are
    excluded up front (one NaN member would poison its label's whole
    centroid), and components render NULL outside the |mean| < 1e9
    fixed-point window: 9 integer + 6 fraction digits is the most a
    double's ~16 significant digits can render IDENTICALLY in both
    engines — beyond it Spark's shortest-repr cast and DuckDB's exact
    binary expansion disagree in sub-ulp digits (and the old
    DECIMAL(18,6) cast raised under ANSI). Round-7 adversarial content
    fuzz."""
    emb = _emb(spark, sf_dir).filter(
        similarity.finite_vec(similarity.as_double(F.col("embedding")))
    )
    un = emb.select(
        "label",
        F.posexplode(similarity.as_double(F.col("embedding"))).alias("idx", "x"),
    )
    # decimal rendering: double->string uses scientific notation for
    # small magnitudes in Spark but not DuckDB; DECIMAL prints fixed-point
    rounded = F.round(F.avg("x"), 6)
    dims = un.groupBy("label", "idx").agg(
        F.when(F.abs(rounded) < 1e9, rounded.cast("decimal(38,6)")).alias("m"),
        F.count("*").alias("n"),
    )
    return (
        dims.groupBy("label")
        .agg(
            F.max("n").alias("n"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("idx"), F.col("m")))
                    ),
                    lambda s: s["m"].cast("string"),
                ),
                ",",
                # out-of-render-window components join as an EMPTY slot
                # (both engines) — array_join/array_to_string would
                # otherwise silently skip NULLs and misalign dimensions
                "",
            ).alias("centroid"),
        )
        .select("label", F.col("n").cast("long").alias("n"), "centroid")
    )


@query(
    "emb_cosine_neardup",
    refs="beyond:dedup,beyond:similarity",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({similarity.cosine_sql('a.v', 'b.v')}, 6) AS cos
    FROM base a JOIN base b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round({similarity.cosine_sql('a.v', 'b.v')}, 6) >= 0.25
    """,
)
def emb_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact, blocked on label
    (the cluster prior) so the self-join never goes all-pairs."""
    emb = _emb(spark, sf_dir)
    return similarity.cosine_near_dup_pairs(emb, threshold=0.25, block_col="label")


@query(
    "emb_quantize_int8",
    bench=True,
    pure_plan=True,
    refs="beyond:similarity,beyond:multimodal",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, v FROM (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings) t
      WHERE {similarity.finite_vec_sql('v')}
    ),
    scaled AS (
      SELECT vec_id, v,
             127.0 / greatest(list_aggregate(list_transform(v, x -> abs(x)),
                                             'max'), 1e-30) AS scale
      FROM base
    ),
    quant AS (
      SELECT vec_id, v, scale,
             list_transform(v, x -> greatest(least(
                 floor(x * scale + 0.5), 127.0), -127.0)) AS q
      FROM scaled
    )
    SELECT vec_id,
           round(scale, 6) AS scale,
           CAST(len(list_filter(q, x -> abs(x) = 127.0)) AS BIGINT)
               AS n_saturated,
           round(list_reduce(
                   list_transform(range(len(v)),
                     i -> (v[i+1] - q[i+1] / scale) * (v[i+1] - q[i+1] / scale)),
                   (a, b) -> a + b) / len(v), 9) AS recon_mse
    FROM quant
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization per vector (scale = 127 /
    max|x|) with saturation count and reconstruction MSE — the storage
    path that makes billion-vector ANN affordable (4x smaller + SIMD
    int8 dot products). floor(x*scale + 0.5) instead of round() because
    floor is IEEE-exact and engine-identical, while half-even vs
    half-away rounding diverges between engines; the MSE fold is a
    sequential left fold in index order on both sides, so the double
    math is bit-identical. One codegen scan, no shuffle."""
    # non-finite vectors are excluded (an Inf element makes max|x| = Inf
    # => scale 0 => the dequant division raises under ANSI; a NaN makes
    # every derived stat NaN). Zero/constant vectors stay: the 1e-30
    # floor keeps their scale finite. Round-7 adversarial content fuzz.
    #
    # Let-bound shape (optimization r13): the old single projection
    # inlined the cast vector / scale / quantized array TREES into every
    # consumer, so per row the cast ran ~4x, the scale fold ~3x and the
    # whole quantize transform twice (n_saturated + the error fold).
    # Each now binds once as an attribute; every alias is non-cheap and
    # multiply referenced, the shape CollapseProject leaves alone. Same
    # expressions per element, same fold order — outputs bit-identical
    # (oracle-pinned).
    base = (
        _emb(spark, sf_dir)
        .filter(similarity.finite_vec(similarity.as_double(F.col("embedding"))))
        .select(
            "vec_id", similarity.as_double(F.col("embedding")).alias("__v")
        )
    )
    scaled = base.select(
        "*",
        (
            127.0
            / F.greatest(
                F.array_max(F.transform(F.col("__v"), F.abs)), F.lit(1e-30)
            )
        ).alias("__scale"),
    )
    quant = scaled.select(
        "*",
        F.transform(
            F.col("__v"),
            lambda x: F.greatest(
                F.least(F.floor(x * F.col("__scale") + 0.5), F.lit(127.0)),
                F.lit(-127.0),
            ),
        ).alias("__q"),
    )
    err = F.zip_with(
        F.col("__v"),
        F.col("__q"),
        lambda x, qi: (x - qi / F.col("__scale")) * (x - qi / F.col("__scale")),
    )
    mse = F.aggregate(err, F.lit(0.0), lambda a, b: a + b) / F.size(F.col("__v"))
    return quant.select(
        "vec_id",
        F.round(F.col("__scale"), 6).alias("scale"),
        F.size(F.filter(F.col("__q"), lambda x: F.abs(x) == 127.0))
        .cast("long")
        .alias("n_saturated"),
        F.round(mse, 9).alias("recon_mse"),
    )


from ..operators import clustering  # noqa: E402


@query(
    "emb_kmeans",
    refs="beyond:similarity",
    oracle=clustering.kmeans_sql(k=8, iters=2),
)
def emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means (k=8, 2 Lloyd iterations, id-ordered
    seeds): the corpus-clustering step behind topic balancing and
    cluster-aware sampling. Per iteration: one broadcast of the k
    centroids across a corpus scan (assignment) and one shuffle of
    (cluster, dim, value) triples (update) — the corpus is never
    shuffled by cluster membership. The per-cell mean is a sorted
    sequential fold, so the whole ITERATIVE algorithm stays
    bit-reproducible across engines; swap F.avg in for throughput when
    the oracle guarantee isn't needed."""
    return clustering.kmeans_assign(_emb(spark, sf_dir), k=8, iters=2)


from ..operators import pq  # noqa: E402


@query(
    "emb_pq_encode",
    refs="beyond:similarity",
    oracle=pq.pq_encode_sql(n_codes=8, n_sub=8, dim=64),
)
def emb_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: 64-dim vectors -> 8 sub-space codes
    (8 bytes/vector, 32x smaller) + reconstruction MSE. The codebook
    (seeded from the 8 lowest-id vectors; train with emb_kmeans per
    sub-space in production) inlines into the plan as literals, so
    ENCODING IS A PURE MAP STAGE — one codegen scan, no join, no
    shuffle: the property that makes petabyte-scale re-encoding a
    throughput-bound job. Sub-space L2s are index-order folds and the
    MSE is a fixed m-order fold, so codes and error match the oracle
    bit-for-bit."""
    emb = _emb(spark, sf_dir)
    codebook = pq.seed_codebook(emb, n_codes=8)
    return pq.pq_encode(emb, codebook, n_sub=8)


@query(
    "emb_pq_adc_topk",
    bench=True,
    refs="beyond:similarity",
    oracle=pq.pq_adc_topk_sql(QUERY_IDS, k=10),
)
def emb_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-10: each query precomputes its 8x8
    sub-centroid distance table (literals in the plan), so scoring a
    corpus vector is 8 table lookups + a fixed-order sum — no vector
    math in the scan, and the per-query rank prunes map-side
    (WindowGroupLimit). Paired with ann_bruteforce_topk this exhibits
    the full ANN trade: exact rank over raw vectors vs O(M) lookups
    over 8-byte codes."""
    emb = _emb(spark, sf_dir)
    # one collect job for codebook seed + query vectors instead of two
    # (optimization r13, guide §5 — identical values, tagged union)
    codebook, qvecs = pq.seed_codebook_with_queries(
        emb, n_codes=8, query_ids=QUERY_IDS
    )
    return pq.pq_adc_topk(emb, codebook, QUERY_IDS, k=10, query_vecs=qvecs)


@query(
    "ann_recall_eval",
    refs="beyond:similarity",
    oracle=f"""
    WITH exact AS (
      SELECT query_id, cand_id FROM ({similarity.brute_force_topk_sql(QUERY_IDS, k=10)}) e
    ),
    adc_raw AS (
      SELECT query_id, cand_id, adist FROM ({pq.pq_adc_topk_sql(QUERY_IDS, k=11)}) a
      WHERE cand_id <> query_id
    ),
    adc10 AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adist ASC, cand_id ASC) AS rn
        FROM adc_raw) t
      WHERE rn <= 10
    )
    SELECT e.query_id,
           CAST(count(a.cand_id) AS BIGINT) AS n_overlap,
           round(count(a.cand_id) / 10.0, 3) AS recall_at_10
    FROM exact e
    LEFT JOIN adc10 a
      ON a.query_id = e.query_id AND a.cand_id = e.cand_id
    GROUP BY e.query_id
    """,
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of PQ asymmetric-distance search against the exact
    brute-force rank — the evaluation loop that decides whether a
    compressed index is good enough to ship. Both pipelines are
    deterministic, so even the EVALUATION is oracle-checked: the
    measured recall is reproducible, not a point sample."""
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    exact = similarity.brute_force_topk(emb, QUERY_IDS, k=10).select(
        "query_id", "cand_id"
    )
    # same one-collect seed+queries job as emb_pq_adc_topk (r13)
    codebook, qvecs = pq.seed_codebook_with_queries(
        emb, n_codes=8, query_ids=QUERY_IDS
    )
    adc = (
        pq.pq_adc_topk(emb, codebook, QUERY_IDS, k=11, query_vecs=qvecs)
        .filter(F.col("cand_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("cand_id"))
    adc10 = (
        adc.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 10)
        .select("query_id", F.col("cand_id").alias("__ac"))
    )
    return (
        exact.join(
            adc10,
            (exact["query_id"] == adc10["query_id"])
            & (exact["cand_id"] == adc10["__ac"]),
            "left",
        )
        .drop(adc10["query_id"])
        .groupBy("query_id")
        .agg(
            F.count("__ac").alias("n_overlap"),
            F.round(F.count("__ac") / 10.0, 3).alias("recall_at_10"),
        )
    )


@query(
    "emb_pq_trained",
    refs="beyond:similarity",
    oracle=pq.pq_trained_sql(n_codes=8, n_sub=8, dim=64),
)
def emb_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ with a TRAINED codebook: one distributed Lloyd iteration per
    sub-space (L2 assignment under broadcast sub-centroids, dim-parallel
    sorted-fold means, empty clusters fall back to their seed), then the
    same map-only encode. The whole train->encode loop — an iterative
    distributed algorithm feeding a literal-codebook projection — is
    oracle-checked end to end; recon_mse strictly improves on the seed
    codebook (asserted in tests)."""
    emb = _emb(spark, sf_dir)
    codebook = pq.train_codebook(emb, n_codes=8, n_sub=8, iters=1, dim=64)
    return pq.pq_encode(emb, codebook, n_sub=8)


@query(
    "ann_ivfpq_topk",
    refs="beyond:similarity",
    oracle=pq.ivfpq_topk_sql(
        QUERY_IDS, k=10, n_codes=8, n_sub=8, dim=64, n_centroids=8, nprobe=2
    ),
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (FAISS IVFADC shape): coarse cells prune the corpus to
    each query's 2-of-8 probed cells, PQ-ADC scores the survivors with
    per-query literal distance tables — the billion-vector production
    index as ONE map-only corpus scan (assignment + encode + lookup all
    literal) plus a WindowGroupLimit top-k. On a cell-partitioned layout
    the probe filter becomes partition pruning."""
    emb = _emb(spark, sf_dir)
    codebook = pq.seed_codebook(emb, n_codes=8)
    return pq.ivfpq_topk(
        emb, codebook, QUERY_IDS, k=10, n_sub=8, n_centroids=8, nprobe=2
    )


from ..operators import clustering  # noqa: E402


@query(
    "emb_semantic_dedup",
    refs="beyond:dedup,beyond:similarity",
    oracle=f"""
    WITH asg AS (
      SELECT vec_id, cluster_id, cos FROM ({clustering.kmeans_sql(k=8, iters=1)}) t
    )
    SELECT vec_id, cluster_id,
           CAST(floor(cos * 50 + 0.5) AS BIGINT) AS bucket,
           vec_id = min(vec_id) OVER (
               PARTITION BY cluster_id, CAST(floor(cos * 50 + 0.5) AS BIGINT))
               AS is_kept
    FROM asg
    """,
)
def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup (cluster, then drop near-identical
    embeddings within each cluster — the curation pass that removes
    *meaning*-level duplicates paraphrase dedup misses). The ε-ball
    around each kept point is approximated by quantizing the
    cosine-to-centroid into width-0.02 buckets and keeping one vector
    (min id) per (cluster, bucket): the whole pass is the k-means
    assignment scan plus ONE (cluster, bucket)-keyed window — no
    within-cluster pair materialization, so a 10B-vector cluster costs
    the same per row as a 10k one. floor(x+0.5) not round() for
    engine-identical bucketing."""
    from pyspark.sql import Window

    asg = clustering.kmeans_assign(_emb(spark, sf_dir), k=8, iters=1)
    bucket = F.floor(F.col("cos") * 50 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("cluster_id", "bucket")
    return (
        asg.withColumn("bucket", bucket)
        .withColumn("is_kept", F.col("vec_id") == F.min("vec_id").over(w))
        .select("vec_id", "cluster_id", "bucket", "is_kept")
    )


@query(
    "emb_outlier_filter",
    refs="beyond:similarity",
    oracle=f"""
    WITH asg AS (
      SELECT vec_id, cluster_id, cos FROM ({clustering.kmeans_sql(k=8, iters=1)}) t
    ),
    stats AS (
      SELECT cluster_id, round(quantile_cont(cos, 0.1), 6) AS p10
      FROM asg GROUP BY cluster_id
    )
    SELECT a.vec_id, a.cluster_id, a.cos, s.p10,
           a.cos < s.p10 AS is_outlier
    FROM asg a JOIN stats s ON s.cluster_id = a.cluster_id
    """,
)
def emb_outlier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier filtering (the CLIP-score-style quality
    pass): vectors in the bottom decile of cosine-to-their-centroid are
    flagged — mislabeled/garbage samples sit far from every cluster
    center. The assignment frame is STAGED (persisted): it feeds both
    the per-cluster quantile and the join back, and without staging
    each consumer would re-run the full assignment scan (two corpus
    passes at 100 TB instead of one staged narrow table). The k-row
    quantile side joins back via AQE broadcast; exact percentile for
    oracle parity — at web scale swap percentile_approx, same plan
    shape."""
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    asg = clustering.kmeans_assign(_emb(spark, sf_dir), k=8, iters=1).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    stats = asg.groupBy("cluster_id").agg(
        F.round(F.expr("percentile(cos, 0.1)"), 6).alias("p10")
    )
    return asg.join(stats, "cluster_id").select(
        "vec_id", "cluster_id", "cos", "p10",
        (F.col("cos") < F.col("p10")).alias("is_outlier"),
    )
