"""User-declared version column (VERDICT r3 missing #3; the reference's
`version-column`/`version-check` contract, README-EN.org:122-123): the
upsert version can be any id- or time-typed column of the source row
instead of the snapshot id — within-delta dedupe, cross-delta
supersession, and the stale-replay guard must all follow the user's
declared ordering, including rows arriving in the SAME snapshot."""

import pytest
from pyspark.sql import functions as F

from conftest import TEST_CFG
from mysql2es_spark.plans.build import SearchIndex, apply_delta, full_build

SCHEMA = ("repo string, path string, commit string, lang string, "
          "content string, mtime long, snapshot_id long")


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_same_snapshot_higher_user_version_wins(spark, tmp_path):
    """Two deltas in the SAME snapshot: the row with the higher user
    version supersedes (tombstones) the older one — impossible under the
    default version=snapshot_id ordering, the point of the knob."""
    root = str(tmp_path / "idx")
    m1 = full_build(
        spark,
        _df(spark, [
            ("r0", "a.py", "c1", "py", "alphaterm oldbody", 100, 1),
            ("r0", "b.py", "c2", "py", "betaterm stable", 100, 1),
        ]),
        root, TEST_CFG, snapshot_id=1, version_column="mtime",
    )
    assert m1.version_column == "mtime"
    store = SearchIndex(spark, root).docstore().collect()
    assert {int(r["version"]) for r in store} == {100}

    # same snapshot_id, higher mtime: must win over the indexed row
    m2 = apply_delta(
        spark,
        _df(spark, [("r0", "a.py", "c9", "py", "alphaterm newbody", 200, 1)]),
        root, TEST_CFG, target_snap=1,
    )
    assert m2.version_column == "mtime"
    assert sum(s.n_tombstones for s in m2.segments) == 1
    idx = SearchIndex(spark, root)
    assert idx.search("alphaterm", k=5).count() == 1
    # the new body is searchable, the old one is tombstoned away
    assert idx.search("newbody", k=5).count() == 1
    assert idx.search("oldbody", k=5).count() == 0


def test_stale_user_version_never_regresses(spark, tmp_path):
    """A replayed row with a LOWER user version than the indexed doc is
    dead on arrival (the reverse guard), regardless of snapshot order."""
    root = str(tmp_path / "idx")
    full_build(
        spark,
        _df(spark, [("r0", "a.py", "c5", "py", "alphaterm currentbody", 500, 1)]),
        root, TEST_CFG, snapshot_id=1, version_column="mtime",
    )
    # later snapshot, but older mtime: stale — must not resurface
    m2 = apply_delta(
        spark,
        _df(spark, [("r0", "a.py", "c3", "py", "alphaterm stalebody", 300, 2)]),
        root, TEST_CFG, target_snap=2,
    )
    assert sum(s.n_tombstones for s in m2.segments) == 1  # the stale new doc
    idx = SearchIndex(spark, root)
    assert idx.search("currentbody", k=5).count() == 1
    assert idx.search("stalebody", k=5).count() == 0


def test_within_delta_user_version_dedupe(spark, tmp_path):
    """One delta carrying two versions of the same (repo, path): the
    higher user version is the one that gets indexed."""
    root = str(tmp_path / "idx")
    full_build(
        spark,
        _df(spark, [("r0", "z.py", "c0", "py", "seed doc", 10, 1)]),
        root, TEST_CFG, snapshot_id=1, version_column="mtime",
    )
    m2 = apply_delta(
        spark,
        _df(spark, [
            ("r0", "a.py", "cA", "py", "alphaterm loserbody", 100, 2),
            ("r0", "a.py", "cB", "py", "alphaterm winnerbody", 900, 2),
        ]),
        root, TEST_CFG, target_snap=2,
    )
    assert m2.n_docs_total == 2  # seed + ONE row for a.py
    idx = SearchIndex(spark, root)
    assert idx.search("winnerbody", k=5).count() == 1
    assert idx.search("loserbody", k=5).count() == 0
    row = idx.docstore().filter(F.col("path") == "a.py").collect()
    assert len(row) == 1 and int(row[0]["version"]) == 900


def test_timestamp_version_column(spark, tmp_path):
    """Time-typed version columns cast to epoch seconds
    (README-EN.org:122-123 allows id- OR time-typed)."""
    root = str(tmp_path / "idx")
    rows = [("r0", "a.py", "c1", "py", "alphaterm one", "2024-01-01 00:00:00", 1),
            ("r0", "b.py", "c2", "py", "betaterm two", "2024-06-01 00:00:00", 1)]
    df = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "content string, mtime_s string, snapshot_id long",
    ).withColumn("mtime", F.to_timestamp("mtime_s")).drop("mtime_s")
    m = full_build(spark, df, root, TEST_CFG, snapshot_id=1,
                   version_column="mtime")
    vers = {
        int(r["version"])
        for r in SearchIndex(spark, root).docstore().collect()
    }
    assert vers == {1704067200, 1717200000}  # epoch seconds, UTC


def test_default_unchanged_without_knob(spark, tmp_path):
    """No version_column: version == snapshot_id exactly as before."""
    root = str(tmp_path / "idx")
    m = full_build(
        spark,
        _df(spark, [("r0", "a.py", "c1", "py", "alphaterm", 999, 7)]),
        root, TEST_CFG, snapshot_id=7,
    )
    assert m.version_column is None
    row = SearchIndex(spark, root).docstore().collect()[0]
    assert int(row["version"]) == 7


def test_version_tiebreak_picks_one_consistent_winner(spark, tmp_path):
    """ADVICE r3/r4: two rows share (doc_key, version) with DIFFERENT
    content (a replay violating same-version-same-bytes).  With
    version_tiebreak='commit' the max-commit row must win in BOTH the
    docstore and the postings — the searchable term is the winner's,
    never the loser's."""
    root = str(tmp_path / "idx")
    m = full_build(
        spark,
        _df(spark, [
            ("r0", "a.py", "c_aaa", "py", "loserterm body shared", 100, 1),
            ("r0", "a.py", "c_zzz", "py", "winnerterm body shared", 100, 1),
            ("r0", "b.py", "c_mid", "py", "betaterm stable", 100, 1),
        ]),
        root, TEST_CFG, snapshot_id=1,
        version_column="mtime", version_tiebreak="commit",
    )
    assert m.version_tiebreak == "commit"
    assert m.n_docs_total == 2  # one winner per doc_key
    idx = SearchIndex(spark, root)
    store = {r["path"]: r["commit"] for r in idx.docstore().collect()}
    assert store["a.py"] == "c_zzz"
    # postings agree with the docstore: the winner's term hits, the
    # loser's does not
    assert [r["path"] for r in idx.search("winnerterm", k=5,
                                          exact=True).collect()] == ["a.py"]
    assert idx.search("loserterm", k=5, exact=True).count() == 0


def test_version_tiebreak_mega_path_matches(spark, tmp_path):
    """The shuffle-join mega-build path must qualify its id join on the
    tiebreak too (same winner as the broadcast path)."""
    import mysql2es_spark.plans.build as B

    rows = [("r0", f"f{i}.py", "c_aaa", "py",
             f"tok{i} loserterm", 100, 1) for i in range(30)]
    rows += [("r0", f"f{i}.py", "c_zzz", "py",
              f"tok{i} winnerterm", 100, 1) for i in range(30)]
    root = str(tmp_path / "idx")
    cfg = TEST_CFG.__class__(**{**TEST_CFG.__dict__,
                                "broadcast_id_threshold": 1})
    full_build(spark, _df(spark, rows), root, cfg, snapshot_id=1,
               version_column="mtime", version_tiebreak="commit")
    idx = SearchIndex(spark, root, cfg)
    assert idx.manifest.n_docs_total == 30
    assert idx.search("loserterm", k=40, exact=True).count() == 0
    assert idx.search("winnerterm", k=40, exact=True).count() == 30


def test_full_build_dedupes_logical_key_like_apply_delta(spark, tmp_path):
    """A bootstrap corpus carrying two versions of one (repo, path) must
    index only the winner — the same U2 rule apply_delta applies to
    deltas (higher version wins; commit desc breaks version ties)."""
    root = str(tmp_path / "idx")
    m = full_build(
        spark,
        _df(spark, [
            ("r0", "a.py", "c1", "py", "oldterm body", 100, 1),
            ("r0", "a.py", "c2", "py", "newterm body", 200, 1),
        ]),
        root, TEST_CFG, snapshot_id=1, version_column="mtime",
    )
    assert m.n_docs_total == 1
    idx = SearchIndex(spark, root)
    assert idx.docstore().first()["commit"] == "c2"
    assert idx.search("newterm", k=5, exact=True).count() == 1
    assert idx.search("oldterm", k=5, exact=True).count() == 0
