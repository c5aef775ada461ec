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
    oracle=similarity.lsh_near_dup_sql(LSH_PLANES, threshold=0.2),
)
def ann_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH near-dup: 8 deterministic sign planes bucket the
    corpus (2^8 buckets); exact cosine verify within buckets only —
    the O(n·bucket) scale path vs the O(n^2) exact join."""
    emb = _emb(spark, sf_dir)
    return similarity.lsh_near_dup_pairs(
        emb, threshold=0.2, num_planes=8, seed=42
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
    oracle="""
    WITH base AS (
        SELECT label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS v
        FROM embeddings
    ),
    un AS (
        SELECT label,
               unnest(range(len(v))) AS idx,
               unnest(v) AS x
        FROM base
    ),
    dims AS (
        SELECT label, idx,
               CAST(round(avg(x), 6) AS DECIMAL(18, 6)) AS m
        FROM un GROUP BY label, idx
    )
    SELECT label,
           (SELECT count(*) FROM embeddings e WHERE e.label = dims.label) AS n,
           array_to_string(array_agg(CAST(m AS VARCHAR) ORDER BY idx), ',') AS centroid
    FROM dims GROUP BY label
    """,
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed vector mean per label (the k-means/IVF training inner
    step): posexplode to (label, dim, value), partial-aggregated avg per
    dimension — one shuffle on (label, dim), never a driver-side vector
    sum — then reassembled in dimension order."""
    emb = _emb(spark, sf_dir)
    un = emb.select(
        "label",
        F.posexplode(similarity.as_double(F.col("embedding"))).alias("idx", "x"),
    )
    # decimal rendering: double->string uses scientific notation for
    # small magnitudes in Spark but not DuckDB; DECIMAL prints fixed-point
    dims = un.groupBy("label", "idx").agg(
        F.round(F.avg("x"), 6).cast("decimal(18,6)").alias("m"),
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
