"""ES bool-query semantics through the real engine (VERDICT r5 #3):
must = conjunctive requirement + score, should = score-only, must_not =
exclusion; exact==blockmax rank identity; boosts reweight clauses."""

import pytest
from pyspark.sql import functions as F

from mysql2es_spark.functions.analyze import tokenize_code
from mysql2es_spark.plans.build import SearchIndex


def _live_tokens(spark, fixture_index):
    idx = SearchIndex(spark, fixture_index["root"])
    raw = fixture_index["log"].read_all(spark).withColumn(
        "doc_key", F.concat_ws("-", "repo", "path", "commit")
    )
    live = idx.docstore().select("doc_id", "doc_key")
    tomb = idx.tombstones()
    if tomb is not None:
        live = live.join(tomb, "doc_id", "left_anti")
    return idx, live.join(raw, "doc_key").select(
        "doc_id", tokenize_code("content").alias("ts")
    )


def test_bool_exact_blockmax_identity_and_semantics(spark, fixture_index):
    idx, toks = _live_tokens(spark, fixture_index)
    kw = dict(must="import return", should="get user name",
              must_not="raise", k=25)
    ex = [(r["doc_id"], r["score"])
          for r in idx.search_bool(exact=True, **kw).collect()]
    bm = [(r["doc_id"], r["score"])
          for r in idx.search_bool(**kw).collect()]
    assert ex and ex == bm  # bit-identical through the shared tail

    # must: every hit contains ALL must terms; must_not: none contains
    # the excluded term — verified against an independent corpus scan
    hit_ids = [d for d, _ in ex]
    rows = {
        r["doc_id"]: set(r["ts"])
        for r in toks.filter(F.col("doc_id").isin(hit_ids)).collect()
    }
    for d in hit_ids:
        assert {"import", "return"} <= rows[d], d
        assert "raise" not in rows[d], d


def test_bool_must_only_equals_filtered_or(spark, fixture_index):
    """With every query term in must and no should/must_not, bool is the
    OR scorer restricted to docs containing all terms — pin it against
    `search` + a conjunctive where-filter via the independent tf scan."""
    idx, toks = _live_tokens(spark, fixture_index)
    got = [(r["doc_id"], r["score"])
           for r in idx.search_bool(must="import return", k=10_000,
                                    exact=True).collect()]
    both = {
        r["doc_id"]
        for r in toks.filter(
            F.array_contains("ts", "import") & F.array_contains("ts", "return")
        ).collect()
    }
    assert {d for d, _ in got} == both
    # scores equal the plain OR query's scores on that doc subset
    all_or = {
        r["doc_id"]: r["score"]
        for r in idx.search("import return", k=10_000, exact=True).collect()
    }
    for d, s in got:
        assert s == all_or[d]


def test_bool_should_adds_score_and_boost_scales(spark, fixture_index):
    idx = SearchIndex(spark, fixture_index["root"])
    base = {r["doc_id"]: r["score"]
            for r in idx.search_bool(must="import", k=10_000,
                                     exact=True).collect()}
    plus = {r["doc_id"]: r["score"]
            for r in idx.search_bool(must="import", should="getUserName",
                                     k=10_000, exact=True).collect()}
    assert set(plus) == set(base)  # should never changes the match set
    assert any(plus[d] > base[d] for d in plus)  # ...but lifts scores
    assert all(plus[d] >= base[d] for d in plus)
    # a half boost halves the should contribution exactly
    half = {r["doc_id"]: r["score"]
            for r in idx.search_bool(must="import", should="getUserName",
                                     should_boost=0.5, k=10_000,
                                     exact=True).collect()}
    for d in plus:
        delta_full = plus[d] - base[d]
        delta_half = half[d] - base[d]
        assert abs(delta_half - 0.5 * delta_full) < 1e-9


def test_bool_edge_cases(spark, fixture_index):
    idx = SearchIndex(spark, fixture_index["root"])
    with pytest.raises(ValueError, match="scoring clause"):
        idx.search_bool(must_not="import")
    # a must term absent from the index empties the result
    assert idx.search_bool(must="import zzqqneverterm", k=5).count() == 0
    # should-only bool == plain OR search
    a = [(r["doc_id"], r["score"])
         for r in idx.search_bool(should="import return", k=15,
                                  exact=True).collect()]
    b = [(r["doc_id"], r["score"])
         for r in idx.search("import return", k=15, exact=True).collect()]
    assert a == b
