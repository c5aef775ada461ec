"""Adversarial-NULL parity: missing values in every nullable column.

Fourth corpus of the round-7 adversarial program (content, events,
relational, NULL). The first three salted *values*; this one salts
*absence*: NULL text / lang / source / n_chars in ``documents`` and a
NULL embedding / NULL label in ``embeddings`` — the single most
production-likely dirty input of a 100 TB ingest (a failed fetch, an
unannotated vector, a half-written row).

The initial probe found 6 of 104 queries diverging, one mechanism each:

  * three oracles' ``coalesce(sum, 0)`` — added for the EMPTY-doc case —
    silently promoted NULL text to "0 tokens" while Spark's fold stayed
    NULL (t_token_stats, t_bpe_token_count, t_repetition_quality);
  * the packing prefix-sum assigned a NULL-length doc a stream position
    (the preceding-rows window is defined even when the row's own n is
    NULL) while the oracle's cumsum-minus-n form was NULL
    (ctx_pack_sequences / textops.pack_offsets);
  * the centroid oracle's correlated count used ``e.label = d.label`` —
    NULL never equi-joins, so the NULL-label group counted 0 members in
    DuckDB and 1 in Spark (emb_label_centroids);
  * the multimodal stub rendered a NULL payload as ``byte_len = 0``
    while SQL ``octet_length(NULL)`` is NULL (mm_decode_features).

The contract they now share: **missing is not empty**. An empty document
has zero tokens, zero bytes, offset in the stream; a MISSING document
has NULL everything and no stream position — and NULL never silently
becomes 0 on either engine. NULL lang / source fall through to each
operator's default branch (rebalance ELSE-rate, domain-cap NULL group)
with SQL grouping semantics, which the engines already agreed on.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dionysus_rb_spark.plans import all_queries

from test_edge_content_parity import _values_close
from test_oracle_parity import _duck, _normalize

SRC_DIR = "/root/testdata/sf0.001"

# doc_id -> (text, lang, source, n_chars); NULL-text ids carry NULL
# n_chars too (the columns fail together in a half-written row)
NULL_DOCS = {
    80001: (None, "en", "src1", None),
    80002: ("normal words here for a null lang doc", None, "src2", 37),
    80003: (None, None, None, None),
    80004: ("another normal doc with a null source", "en", None, 37),
    80005: ("", "en", "src1", 0),  # EMPTY — the contrast row, not NULL
}
NULL_TEXT_IDS = {80001, 80003}
EMPTY_TEXT_ID = 80005

# the affected surface + the neighbors that read the salted columns
EDGE_QUERIES = [
    "t_token_stats", "t_bpe_token_count", "t_repetition_quality",
    "t_quality_score", "t_lang_id", "t_fingerprint", "t_corpus_stats",
    "ctx_pack_sequences", "samp_rebalance", "samp_domain_cap",
    "dd_exact_dedup", "dd_minhash_lsh",
    "mm_decode_features", "mm_embed_lsh",
    "emb_label_centroids", "emb_kmeans", "ann_bruteforce_topk",
    "pipe_full_curation",
    # NULL lang -> __HIVE_DEFAULT_PARTITION__ directory -> NULL again;
    # all-NULL n_chars groups must stay NULL (missing is not empty)
    "pipe_corpus_shard_roundtrip",
]


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory) -> str:
    out: Path = tmp_path_factory.mktemp("edge_null")
    for f in Path(SRC_DIR).glob("*.parquet"):
        shutil.copy(f, out / f.name)

    docs = pq.read_table(out / "documents.parquet").to_pandas()
    extra = pd.DataFrame(
        {
            "doc_id": list(NULL_DOCS),
            "text": [v[0] for v in NULL_DOCS.values()],
            "lang": [v[1] for v in NULL_DOCS.values()],
            "source": [v[2] for v in NULL_DOCS.values()],
            "n_chars": pd.array(
                [v[3] for v in NULL_DOCS.values()], dtype="Int64"
            ),
        }
    )
    docs = pd.concat([docs, extra], ignore_index=True)
    docs["n_chars"] = docs["n_chars"].astype("Int64")
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        out / "documents.parquet",
    )

    emb = pq.read_table(out / "embeddings.parquet")
    dim = 64
    extra_vecs = pa.table(
        {
            "vec_id": pa.array([80001, 80002], pa.int64()),
            "embedding": pa.array(
                [None, [1.0] * dim], pa.list_(pa.float32())
            ),
            "label": pa.array([3, None], pa.int32()),
        }
    )
    pq.write_table(
        pa.concat_tables([emb, extra_vecs.cast(emb.schema)]),
        out / "embeddings.parquet",
    )
    return str(out)


def test_edge_null_parity(spark, null_dir):
    qs = all_queries()
    failures: dict[str, str] = {}
    results: dict[str, pd.DataFrame] = {}
    for name in EDGE_QUERIES:
        qd = qs[name]
        assert qd.oracle, f"{name} lost its oracle"
        try:
            got = qd.fn(spark, null_dir).toPandas()
            results[name] = got
            con = _duck(null_dir)
            want = con.execute(qd.oracle).df()
            con.close()
            if sorted(got.columns) != sorted(want.columns):
                failures[name] = (
                    f"columns {sorted(got.columns)} != {sorted(want.columns)}"
                )
                continue
            if len(got) != len(want):
                failures[name] = f"rows {len(got)} != {len(want)}"
                continue
            g, w = _normalize(got), _normalize(want)
            for col in g.columns:
                bad = [
                    (col, i, x, y)
                    for i, (x, y) in enumerate(
                        zip(g[col].tolist(), w[col].tolist())
                    )
                    if not _values_close(x, y)
                ][:3]
                if bad:
                    failures[name] = f"value mismatches {bad}"
                    break
        except Exception as e:  # noqa: BLE001 - report per-query
            failures[name] = f"error: {type(e).__name__}: {e}"[:400]
    assert not failures, (
        f"{len(failures)}/{len(EDGE_QUERIES)} queries diverge on NULL inputs:\n"
        + "\n".join(f"  {k}: {v}" for k, v in sorted(failures.items()))
    )

    # --- power guards: missing != empty, and each contract fired ------
    stats = results["t_token_stats"].set_index("doc_id")
    for i in NULL_TEXT_IDS:
        assert pd.isna(stats.loc[i, "n_tokens"]), "NULL text -> NULL count"
        assert pd.isna(stats.loc[i, "mean_token_len"]), "NULL text -> NULL mean"
    assert stats.loc[EMPTY_TEXT_ID, "n_tokens"] == 0, "empty text -> 0 tokens"
    assert stats.loc[EMPTY_TEXT_ID, "mean_token_len"] == 0.0

    bpe = results["t_bpe_token_count"].set_index("doc_id")
    assert all(pd.isna(bpe.loc[i, "n_bpe_tokens"]) for i in NULL_TEXT_IDS)
    assert bpe.loc[EMPTY_TEXT_ID, "n_bpe_tokens"] == 0

    # packing: a missing doc has NO stream position, and the stream is
    # contiguous without it (the doc after a NULL row starts where the
    # doc before it ended)
    packed = results["ctx_pack_sequences"].set_index("doc_id").sort_index()
    for i in NULL_TEXT_IDS:
        assert pd.isna(packed.loc[i, "global_offset"])
        assert pd.isna(packed.loc[i, "first_seq"])
    measured = packed[packed["n_tokens"].notna()]
    ends = (measured["global_offset"] + measured["n_tokens"]).tolist()
    starts = measured["global_offset"].tolist()
    assert starts[1:] == ends[:-1], "packed stream must stay contiguous"
    # the EMPTY doc is measured: offset defined, zero width
    assert packed.loc[EMPTY_TEXT_ID, "n_tokens"] == 0
    assert not pd.isna(packed.loc[EMPTY_TEXT_ID, "global_offset"])

    # NULL-text docs survive dedup as uniques and never pair
    kept = set(results["dd_exact_dedup"]["doc_id"])
    assert NULL_TEXT_IDS <= kept
    mh = results["dd_minhash_lsh"]
    paired = set(mh["doc_a"]) | set(mh["doc_b"])
    assert not (paired & NULL_TEXT_IDS)

    # NULL media payload -> NULL features across the board
    mm = results["mm_decode_features"].set_index("media_id")
    for i in NULL_TEXT_IDS:
        row = mm.loc[i]
        assert all(
            pd.isna(row[c])
            for c in ("byte_len", "digest", "width", "height", "channels")
        ), f"media {i}: NULL payload must yield NULL features"
    assert mm.loc[EMPTY_TEXT_ID, "byte_len"] == 0, "empty payload has 0 bytes"

    # the NULL label forms its own (parity-checked) centroid group...
    cent = results["emb_label_centroids"]
    nulls = cent[cent["label"].isna()]
    assert len(nulls) == 1 and int(nulls["n"].iloc[0]) == 1
    # ...the NULL embedding is inadmissible everywhere (kmeans drops
    # it), while the valid NULL-label vector still clusters (labels
    # play no part in kmeans)
    km = set(results["emb_kmeans"]["vec_id"])
    assert 80001 not in km and 80002 in km

    # NULL lang falls through to the ELSE branch (100% keep rate)
    reb = set(results["samp_rebalance"]["doc_id"])
    assert 80002 in reb, "NULL-lang doc must keep at the default rate"
