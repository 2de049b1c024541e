"""Round-6 extras: bool minimum_should_match and ES-style highlighting
(token snippets around the first matched term, served from the token
store when present)."""

import pytest
from pyspark.sql import functions as F

from mysql2es_spark.functions.analyze import tokenize_code
from mysql2es_spark.operators.index import IndexConfig
from mysql2es_spark.plans.build import SearchIndex, full_build
from mysql2es_spark.sources.corpus import generate_corpus

CFG = IndexConfig(n_buckets=8, block_size=64, salt_threshold=200,
                  n_salts=4, chunk_span=128, id_partitions=8,
                  token_store=True)


@pytest.fixture(scope="module")
def hidx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hl") / "idx")
    corpus = generate_corpus(spark, 250)
    full_build(spark, corpus, root, CFG, snapshot_id=1)
    return {"root": root, "corpus": corpus}


def _toks(spark, hidx):
    return hidx["corpus"].select(
        tokenize_code("content").alias("ts")
    )


def test_minimum_should_match(spark, hidx):
    idx = SearchIndex(spark, hidx["root"], CFG)
    should = "import return get user"
    loose = idx.search_bool(should=should, k=10_000, exact=True)
    tight = idx.search_bool(should=should, minimum_should_match=3,
                            k=10_000, exact=True)
    loose_ids = {r["doc_id"] for r in loose.collect()}
    tight_rows = {r["doc_id"]: r["score"] for r in tight.collect()}
    assert set(tight_rows) < loose_ids  # strictly fewer docs
    # every kept doc really contains >= 3 distinct should terms,
    # verified against an independent corpus scan
    terms = ["import", "return", "get", "user"]
    cnt = hidx["corpus"].select(
        F.concat_ws("-", "repo", "path", "commit").alias("doc_key"),
        F.size(
            F.array_intersect(
                F.array_distinct(tokenize_code("content")),
                F.array(*[F.lit(t) for t in terms]),
            )
        ).alias("n"),
    )
    key_n = {r["doc_key"]: r["n"] for r in cnt.collect()}
    meta = {r["doc_id"]: r["doc_key"]
            for r in idx.docstore().select("doc_id", "doc_key").collect()}
    for d in tight_rows:
        assert key_n[meta[d]] >= 3, d
    # and no doc with >= 3 matches was dropped
    expect = {d for d, key in meta.items() if key_n[key] >= 3}
    assert set(tight_rows) == (expect & loose_ids)
    # scores are unchanged by the msm filter (it gates, never rescores)
    loose_scores = {r["doc_id"]: r["score"] for r in loose.collect()}
    for d, s in tight_rows.items():
        assert s == loose_scores[d]
    with pytest.raises(ValueError, match="minimum_should_match"):
        idx.search_bool(should="import", minimum_should_match=5, k=5)


def test_highlight_snippets(spark, hidx):
    idx = SearchIndex(spark, hidx["root"], CFG)
    out = idx.highlight("import return", k=8, window=3).collect()
    assert out
    top = idx.search("import return", k=8).collect()
    assert [r["doc_id"] for r in out] == [r["doc_id"] for r in top]
    assert [r["score"] for r in out] == [r["score"] for r in top]
    # snippet really is a window of the doc's analyzed tokens around
    # the first matched term
    toks_by_key = {
        r["doc_key"]: list(r["ts"])
        for r in hidx["corpus"].select(
            F.concat_ws("-", "repo", "path", "commit").alias("doc_key"),
            tokenize_code("content").alias("ts"),
        ).collect()
    }
    meta = {r["doc_id"]: r["doc_key"]
            for r in idx.docstore().select("doc_id", "doc_key").collect()}
    for r in out:
        ts = toks_by_key[meta[r["doc_id"]]]
        firsts = [ts.index(t) for t in ("import", "return") if t in ts]
        assert firsts, r["doc_id"]
        i = min(firsts)
        lo = max(0, i - 3)
        expect = " ".join(ts[lo:lo + 7])
        assert r["snippet"] == expect, (r["doc_id"], r["snippet"], expect)
        assert r["matched"] == sum(
            1 for t in ("import", "return") if t in ts
        )
    # store-less path: same snippets via the source fetch
    idx2 = SearchIndex(spark, hidx["root"], CFG)
    idx2._token_dir_cache = {"content": None}
    out2 = idx2.highlight(
        "import return", k=8, window=3, source_df=hidx["corpus"]
    ).collect()
    assert [(r["doc_id"], r["snippet"]) for r in out2] == [
        (r["doc_id"], r["snippet"]) for r in out
    ]
