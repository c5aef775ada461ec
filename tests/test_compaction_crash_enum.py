"""Exhaustive crash-point enumeration for corpus compaction.

The hand-picked crash tests in test_corpus_sink.py pin the states the
design document worried about; this suite removes the hand-picking: it
instruments every filesystem mutation the compaction path performs
(os.rename / os.replace / os.remove / os.makedirs / shutil.rmtree on
paths under the corpus root), crashes immediately BEFORE the N-th one
for EVERY N, and asserts the invariant the protocol claims — after
recovery, the corpus holds exactly the original row multiset, with no
underscore residue. Three matrices:

1. single crash, unpartitioned root protocol (phase marker + commit
   rename) — every FS op;
2. single crash, partitioned leaf swaps — every FS op;
3. crash DURING RECOVERY of every single-crash state (the double-crash
   / crash-looping compactor case): recovery is pure-FS, so this
   cross-product is cheap — and it is the matrix that found the
   case-(b) re-entrancy hole (recovery's restore loop deleting
   already-restored old files on its second pass; fixed with the
   _restoring commit rename, see _recover_crashed_compaction).

Additionally, rmtree sites get a "silent partial failure" variant
(ignore_errors swallowing a half-finished delete, then the run
CONTINUING) — the exact shape of ADVICE r7's data-loss report.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from dionysus_rb_spark.sources import corpus_sink
from dionysus_rb_spark.sources.corpus_sink import (
    compact_corpus,
    read_corpus,
    write_corpus_shards,
)
from dionysus_rb_spark.tables import load_table

from conftest import SF_DIR


class _InjectedCrashError(Exception):
    pass


_MUTATORS = ("rename", "replace", "remove", "makedirs")


class _CrashFS:
    """Counts FS mutations under ``root``; optionally crashes before
    op #``budget`` (1-indexed), or silently half-deletes at an rmtree
    instead of performing it (``partial_rmtree_at``)."""

    def __init__(self, root: str, budget: int | None = None,
                 partial_rmtree_at: int | None = None) -> None:
        self.root = os.path.abspath(root) + os.sep
        self.budget = budget
        self.partial_rmtree_at = partial_rmtree_at
        self.ops: list[str] = []
        self._orig_os = {n: getattr(os, n) for n in _MUTATORS}
        self._orig_rmtree = shutil.rmtree

    def _in_root(self, target) -> bool:
        return os.path.abspath(str(target)).startswith(self.root.rstrip(os.sep))

    def _tick(self, name: str, target) -> str:
        """Returns 'run' | 'skip-partial'; raises on crash budget."""
        if not self._in_root(target):
            return "run"
        self.ops.append(name)
        n = len(self.ops)
        if self.budget is not None and n == self.budget:
            raise _InjectedCrashError(f"injected crash before op {n}: {name}")
        if self.partial_rmtree_at is not None and n == self.partial_rmtree_at:
            assert name == "rmtree", f"op {n} is {name}, not rmtree"
            return "skip-partial"
        return "run"

    def __enter__(self):
        for n in _MUTATORS:
            orig = self._orig_os[n]

            def wrapped(*a, _n=n, _orig=orig, **kw):
                self._tick(_n, a[0])
                return _orig(*a, **kw)

            setattr(os, n, wrapped)

        def rmtree(p, *a, **kw):
            action = self._tick("rmtree", p)
            if action == "skip-partial":
                # silently delete roughly half the files, then "succeed"
                files = sorted(
                    str(f) for f in Path(p).rglob("*") if f.is_file()
                )
                for f in files[: max(1, len(files) // 2)]:
                    self._orig_os["remove"](f)
                return None
            return self._orig_rmtree(p, *a, **kw)

        shutil.rmtree = rmtree
        return self

    def __exit__(self, *exc):
        for n in _MUTATORS:
            setattr(os, n, self._orig_os[n])
        shutil.rmtree = self._orig_rmtree
        return False


KNOBS = dict(shard_key="doc_id", sort_by=("doc_id",),
             target_rows_per_file=40, shards=3)


def _build_template(spark, out: str, partitioned: bool) -> None:
    docs = load_table(spark, SF_DIR, "documents").limit(400)
    knobs = dict(KNOBS, partition_by=("lang",) if partitioned else ())
    write_corpus_shards(
        docs.filter(F.col("doc_id") % 2 == 0), out, mode="overwrite", **knobs
    )
    write_corpus_shards(
        docs.filter(F.col("doc_id") % 2 == 1), out, mode="append", **knobs
    )


def _rows(spark, path: str):
    return sorted(
        tuple(r) for r in read_corpus(spark, path).collect()
    )


def _ids_fs(path: str) -> list[int]:
    """doc_id multiset straight off the non-underscore parquet files —
    duckdb, no Spark job; doc_id is unique per template row, so this
    detects both loss and duplication. Used in the double-crash inner
    loop where a Spark read per (n, m) pair would dominate runtime."""
    import duckdb

    files = []
    for base, dirs, fnames in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith("_") and not d.startswith(".")]
        files += [
            os.path.join(base, f)
            for f in fnames
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
    if not files:
        return []
    return [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet({files!r}) ORDER BY doc_id"
        ).fetchall()
    ]


def _residue(path: str) -> list[str]:
    """Underscore leftovers that should not survive a clean compact."""
    out = []
    for base, dirs, files in os.walk(path):
        for n in dirs + files:
            if n.startswith("_compact_"):
                out.append(os.path.relpath(os.path.join(base, n), path))
    return out


def _fresh_copy(template: str, dst: str) -> str:
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(template, dst)
    return dst


@pytest.fixture(scope="module")
def root_template(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crash_enum") / "root_tpl")
    _build_template(spark, out, partitioned=False)
    return out


@pytest.fixture(scope="module")
def leaf_template(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crash_enum") / "leaf_tpl")
    _build_template(spark, out, partitioned=True)
    return out


def _count_compact_ops(spark, template: str, scratch: str) -> int:
    work = _fresh_copy(template, scratch)
    with _CrashFS(work) as fs:
        compact_corpus(spark, work)
    assert fs.ops, "instrumentation saw no FS ops — wiring broken"
    return len(fs.ops)


def _enum_single_crash(spark, template: str, tmp_path: Path):
    """Yield (n, crashed_dir) for every crash point; caller verifies."""
    scratch = str(tmp_path / "count")
    total = _count_compact_ops(spark, template, scratch)
    for n in range(1, total + 1):
        work = _fresh_copy(template, str(tmp_path / "work"))
        with pytest.raises(_InjectedCrashError):
            with _CrashFS(work, budget=n):
                compact_corpus(spark, work)
        yield n, work


def test_root_protocol_every_crash_point_recovers(spark, root_template, tmp_path):
    want = _rows(spark, root_template)
    for n, work in _enum_single_crash(spark, root_template, tmp_path):
        compact_corpus(spark, work)  # recovery + fresh compaction
        assert _rows(spark, work) == want, f"crash before op {n} lost data"
        assert not _residue(work), f"crash before op {n} left residue"


def test_leaf_protocol_every_crash_point_recovers(spark, leaf_template, tmp_path):
    want = _rows(spark, leaf_template)
    for n, work in _enum_single_crash(spark, leaf_template, tmp_path):
        compact_corpus(spark, work)
        assert _rows(spark, work) == want, f"crash before op {n} lost data"
        assert not _residue(work), f"crash before op {n} left residue"


def _recovery_ops(crashed: str, part_cols) -> int:
    """Count FS mutations a recovery pass performs on this state
    (recovery is pure-FS: cheap to enumerate)."""
    probe = crashed + "_probe"
    if os.path.exists(probe):
        shutil.rmtree(probe)
    shutil.copytree(crashed, probe)
    with _CrashFS(probe) as fs:
        corpus_sink._recover_crashed_compaction(probe, part_cols)
    shutil.rmtree(probe)
    return len(fs.ops)


def _double_crash_matrix(spark, template: str, tmp_path: Path, part_cols):
    """For every first-crash state, crash recovery before every one of
    ITS ops, then let an unpatched recovery finish — data must be exact.
    This is the crash-looping-compactor scenario (OOM-killed compactor
    restarted by an orchestrator, dying again mid-recovery)."""
    want = _ids_fs(template)
    pairs = 0
    for n, crashed in _enum_single_crash(spark, template, tmp_path):
        # preserve the crashed state; iterate recovery crash points on it
        state = str(tmp_path / "state")
        _fresh_copy(crashed, state)
        r_ops = _recovery_ops(state, part_cols)
        for m in range(1, r_ops + 1):
            work = _fresh_copy(state, str(tmp_path / "work2"))
            with pytest.raises(_InjectedCrashError):
                with _CrashFS(work, budget=m):
                    corpus_sink._recover_crashed_compaction(work, part_cols)
            corpus_sink._recover_crashed_compaction(work, part_cols)
            got = _ids_fs(work)
            assert got == want, (
                f"first crash before op {n}, recovery crash before op "
                f"{m}: {len(got)} rows vs {len(want)}"
            )
            pairs += 1
    assert pairs > 0, "no double-crash states enumerated — wiring broken"


def test_root_protocol_recovery_is_reentrant(spark, root_template, tmp_path):
    _double_crash_matrix(spark, root_template, tmp_path, ())


def test_leaf_protocol_recovery_is_reentrant(spark, leaf_template, tmp_path):
    _double_crash_matrix(spark, leaf_template, tmp_path, ("lang",))


def test_silent_partial_rmtree_never_loses_data(spark, root_template,
                                                leaf_template, tmp_path):
    """ignore_errors can swallow a HALF-FINISHED delete and let the run
    report success (ADVICE r7's failure shape). At every rmtree site:
    half-delete silently, let the run finish, then re-compact — the
    leftover must be reclaimed, never restored, and rows stay exact."""
    for template, part in ((root_template, False), (leaf_template, True)):
        want = _rows(spark, template)
        scratch = str(tmp_path / "count")
        work = _fresh_copy(template, scratch)
        with _CrashFS(work) as fs:
            compact_corpus(spark, work)
        rmtree_sites = [i + 1 for i, op in enumerate(fs.ops) if op == "rmtree"]
        assert rmtree_sites
        for site in rmtree_sites:
            work = _fresh_copy(template, str(tmp_path / "work3"))
            with _CrashFS(work, partial_rmtree_at=site):
                compact_corpus(spark, work)  # "succeeds" despite the lie
            assert _rows(spark, work) == want, f"partial rmtree at {site}"
            compact_corpus(spark, work)  # next run must reclaim leftovers
            assert _rows(spark, work) == want
            assert not _residue(work), f"partial rmtree at {site} residue"
