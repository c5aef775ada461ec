"""JSONL ingestion: every input line parsed or dead-lettered, never
silently dropped; canonical schema enforced at the scan."""

from __future__ import annotations

import gzip
import json

import pytest

from dionysus_rb_spark.sources.text_ingest import read_csv, read_jsonl, split_corrupt

GOOD = [
    {"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11},
    # missing field -> NULL (missing is not empty)
    {"doc_id": 2, "text": "bonjour", "lang": "fr"},
    # unicode payload
    {"doc_id": 3, "text": "你好世界", "lang": "zh", "source": "web", "n_chars": 4},
]
BROKEN_SYNTAX = '{"doc_id": 4, "text": "trunca'
BROKEN_TYPE = '{"doc_id": "not-a-number", "text": "x", "lang": "en"}'


def _write(path, lines, compress=False):
    data = "\n".join(lines) + "\n"
    if compress:
        with gzip.open(path, "wt") as f:
            f.write(data)
    else:
        path.write_text(data)


@pytest.mark.parametrize("compress", [False, True], ids=["plain", "gzip"])
def test_every_line_parsed_or_dead_lettered(spark, tmp_path, compress):
    name = "docs.jsonl.gz" if compress else "docs.jsonl"
    _write(
        tmp_path / name,
        [json.dumps(g) for g in GOOD] + [BROKEN_SYNTAX, BROKEN_TYPE],
        compress=compress,
    )
    df = read_jsonl(spark, str(tmp_path / name), table="documents")
    clean, dead = split_corrupt(df)

    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2]["source"] is None and rows[2]["n_chars"] is None
    assert rows[3]["text"] == "你好世界"
    # schema is the canonical one, not inferred
    assert dict(clean.dtypes)["doc_id"] == "bigint"

    dead_rows = dead.collect()
    assert len(dead_rows) == 2, "a malformed line was silently dropped"
    raws = {r["raw"] for r in dead_rows}
    assert BROKEN_SYNTAX in raws and BROKEN_TYPE in raws
    assert all(name in r["source_file"] for r in dead_rows)


def test_ingest_to_sink_roundtrip(spark, tmp_path):
    """The raw-to-parquet landing path: read_jsonl -> split -> sharded
    sink -> read back equals the clean frame."""
    from dionysus_rb_spark.sources.corpus_sink import read_corpus, write_corpus_shards

    _write(tmp_path / "in.jsonl", [json.dumps(g) for g in GOOD] + [BROKEN_SYNTAX])
    clean, dead = split_corrupt(
        read_jsonl(spark, str(tmp_path / "in.jsonl"), table="documents")
    )
    out = str(tmp_path / "landed")
    write_corpus_shards(
        clean, out, shard_key="doc_id", partition_by=("lang",), mode="overwrite"
    )
    back = sorted(
        (r["doc_id"], r["text"], r["lang"]) for r in read_corpus(spark, out).collect()
    )
    want = sorted((g["doc_id"], g["text"], g["lang"]) for g in GOOD)
    assert back == want
    assert dead.count() == 1


def test_arg_validation(spark):
    with pytest.raises(ValueError, match="exactly one"):
        read_jsonl(spark, "/nonexistent")
    with pytest.raises(ValueError, match="exactly one"):
        read_jsonl(spark, "/nonexistent", table="documents", schema="a int")
    with pytest.raises(ValueError, match="exactly one"):
        read_csv(spark, "/nonexistent")


CSV_SCHEMA = "doc_id bigint, text string, lang string"


def test_csv_anomaly_surface(spark, tmp_path):
    """Pins the probed Spark 4.1 PERMISSIVE CSV contract: under-length,
    over-length, and type-mismatched rows all capture the raw line
    (best-effort parse retained) and route to dead-letter; clean holds
    only fully round-tripped rows. Quoted separators are legal."""
    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,text,lang\n"
        "1,hello,en\n"
        "2,bye\n"  # under-length: positional absence is anomalous
        "x,typo,en\n"  # type mismatch in doc_id
        "3,a,b,EXTRA\n"  # over-length
        '4,"q,uoted",fr\n'  # quoted separator: clean
    )
    clean, dead = split_corrupt(read_csv(spark, str(p), schema=CSV_SCHEMA))
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 4}
    assert rows[4]["text"] == "q,uoted" and rows[4]["lang"] == "fr"
    dead_raws = {r["raw"] for r in dead.collect()}
    assert dead_raws == {"2,bye", "x,typo,en", "3,a,b,EXTRA"}


def test_split_modes_agree_and_release_frees_both_kinds(spark, tmp_path):
    """ADVICE r7 + VERDICT r8 item 3 + ADVICE r8 item 3: the default
    split must not pin the whole raw input in executor memory for the
    session's lifetime, AND every materialization must be releasable
    through the SplitResult handle — cache mode unpersists the relation,
    land mode deletes the parquet landing directory (so a long-running
    ingest loop holds O(one batch) of scratch disk, not O(history)).
    The handle lives on the SplitResult, not the frames: a transformed
    frame carries nothing, and release_split on a bare frame raises
    instead of silently leaving the input pinned."""
    import os

    from dionysus_rb_spark.sources.text_ingest import release_split

    _write(
        tmp_path / "in.jsonl",
        [json.dumps(g) for g in GOOD] + [BROKEN_SYNTAX, BROKEN_TYPE],
    )
    src = str(tmp_path / "in.jsonl")

    def snap(clean, dead):
        return (
            sorted(map(tuple, clean.collect())),
            sorted(r["raw"] for r in dead.collect()),
        )

    jsc = spark.sparkContext._jsc.sc()
    cached_before = jsc.getRDDStorageInfo()

    land = split_corrupt(read_jsonl(spark, src, table="documents"))
    clean, dead = land  # tuple-compatible unpacking still works
    land_snap = snap(clean, dead)
    assert len(jsc.getRDDStorageInfo()) == len(cached_before), (
        "mode='land' pinned a cached relation"
    )
    kind, (_, landing_dir) = land._state
    assert kind == "land" and os.path.isdir(landing_dir)
    assert land.release() is True
    assert not os.path.exists(landing_dir), (
        "release must delete the landing directory"
    )
    assert land.release() is False  # idempotent

    cache = split_corrupt(read_jsonl(spark, src, table="documents"), mode="cache")
    assert snap(cache.clean, cache.dead) == land_snap
    assert len(jsc.getRDDStorageInfo()) == len(cached_before) + 1, (
        "mode='cache' should hold exactly one cached relation"
    )
    assert release_split(cache) is True
    assert len(jsc.getRDDStorageInfo()) == len(cached_before), (
        "release did not unpersist"
    )
    assert release_split(cache) is False

    # the old footgun now fails loudly: frames carry no handle
    with pytest.raises(TypeError, match="SplitResult"):
        release_split(cache.clean)

    with pytest.raises(ValueError, match="mode"):
        split_corrupt(read_jsonl(spark, src, table="documents"), mode="nope")


def test_repeated_ingest_disk_is_bounded_with_release(spark, tmp_path):
    """VERDICT r8 item 3 steady-state check: an ingest loop that releases
    each batch's SplitResult keeps exactly zero landings resident between
    batches; without release, landings accumulate one per batch until
    interpreter exit. (The 500k-scale A/B lives in
    tools/validation/ingest500k.py; this pins the mechanism.)"""
    import os

    from dionysus_rb_spark.operators import lineage

    _write(tmp_path / "in.jsonl", [json.dumps(g) for g in GOOD])
    src = str(tmp_path / "in.jsonl")

    root = lineage._root_dir(spark)

    def n_dirs():
        return len(os.listdir(root)) if os.path.isdir(root) else 0

    base = n_dirs()
    unreleased = []
    for _ in range(3):
        res = split_corrupt(read_jsonl(spark, src, table="documents"))
        res.clean.collect()
        unreleased.append(res)
    assert n_dirs() == base + 3, "each un-released ingest lands once"
    for res in unreleased:
        assert res.release() is True
    assert n_dirs() == base, "release reclaims every landing"

    for _ in range(3):
        res = split_corrupt(read_jsonl(spark, src, table="documents"))
        res.clean.collect()
        res.release()
        assert n_dirs() == base, "released loop holds zero resident landings"


@pytest.mark.parametrize("compress", [False, True], ids=["plain", "gzip"])
def test_csv_canonical_table_roundtrip(spark, tmp_path, compress):
    """Canonical-schema CSV over the documents shape, gzip-transparent,
    TSV via sep — the vendor-delivery ingestion path."""
    lines = [
        "doc_id\ttext\tlang\tsource\tn_chars",
        "1\thello world\ten\tweb\t11",
        "2\tbonjour\tfr\t\t",  # empty trailing fields -> NULL, clean
        "3\t你好世界\tzh\tweb\t4",
    ]
    name = "docs.tsv.gz" if compress else "docs.tsv"
    _write(tmp_path / name, lines, compress=compress)
    clean, dead = split_corrupt(
        read_csv(spark, str(tmp_path / name), table="documents", sep="\t")
    )
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2]["source"] is None and rows[2]["n_chars"] is None
    assert rows[3]["text"] == "你好世界"
    assert dict(clean.dtypes)["doc_id"] == "bigint"
    assert dead.count() == 0
