"""Hand-built semantics check for passage-level dedup (the oracle
parity test covers the testdata corpus; this pins the ownership and
reassembly rules on a readable fixture)."""

from __future__ import annotations

from dionysus_rb_spark.operators.textops import passage_dedup

HEADER = " ".join(f"h{i}" for i in range(12))  # one full 12-token passage
BODY_A = " ".join(f"a{i}" for i in range(12))
BODY_B = " ".join(f"b{i}" for i in range(12))
TAIL = "t0 t1 t2"  # short final window


def test_passage_ownership_and_reassembly(spark):
    df = spark.createDataFrame(
        [
            (1, f"{HEADER} {BODY_A} {TAIL}"),
            (2, f"{HEADER} {BODY_B}"),  # header duplicated across docs
            (3, ""),  # token-less doc: zero passages, drops out
        ],
        "doc_id LONG, text STRING",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in passage_dedup(df, "text", "doc_id", passage_tokens=12).collect()
    }
    assert set(out) == {1, 2}
    # doc 1 (lowest id) owns the shared header and keeps everything
    assert out[1]["n_passages"] == 3 and out[1]["n_kept"] == 3
    assert out[1]["kept_text"] == f"{HEADER} {BODY_A} {TAIL}"
    # doc 2 loses the header, keeps its own body, in position order
    assert out[2]["n_passages"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["kept_text"] == BODY_B


def test_passage_dedup_identity_within_doc(spark):
    # a passage repeated WITHIN one doc is kept (ownership is per-doc,
    # not per-occurrence — within-doc repetition is the repetition
    # filter's job, not the cross-doc dedup's)
    df = spark.createDataFrame(
        [(7, f"{BODY_A} {BODY_A}")], "doc_id LONG, text STRING"
    )
    row = passage_dedup(df, "text", "doc_id", passage_tokens=12).collect()[0]
    assert row["n_passages"] == 2 and row["n_kept"] == 2
