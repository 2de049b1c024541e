"""Phrase search (match_phrase analogue over a position-free index).

The reference delegates phrase queries to ES positional postings
(README-EN.org:186-187); our index stays position-free and verifies
adjacency on the pruned candidate set.  These tests pin (1) the
overlap-aware occurrence counter, (2) end-to-end identity between
``SearchIndex.search_phrase`` (index-pruned candidates + source
verification) and an independent full-scan ``phrase_topk`` over the
live corpus, and (3) filtered-phrase semantics.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from mysql2es_spark.functions.analyze import tokenize_code
from mysql2es_spark.operators.search import phrase_count, phrase_topk
from mysql2es_spark.plans.build import SearchIndex


def test_phrase_count_overlap_and_guards(spark):
    df = spark.createDataFrame(
        [
            (1, ["a", "b", "a", "b", "a"]),  # overlapping 'a b a' at 1 and 3
            (2, ["a", "b"]),                 # shorter than the phrase
            (3, []),                         # empty doc
            (4, ["x", "a", "b", "a", "y"]),  # one occurrence mid-doc
        ],
        "doc_id long, ts array<string>",
    )
    got = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", phrase_count("ts", ["a", "b", "a"]).alias("c")
        ).collect()
    }
    assert got == {1: 2, 2: 0, 3: 0, 4: 1}
    # empty phrase counts nothing
    assert df.select(phrase_count("ts", []).alias("c")).first()["c"] == 0


def _live_corpus(spark, fixture_index):
    """(idx, (doc_id, ts)) of the engine's LIVE docs: docstore minus
    tombstones, content = latest version per doc_key from the raw
    snapshot log — an independent reconstruction, not the engine's own
    join."""
    idx = SearchIndex(spark, fixture_index["root"])
    live = idx.docstore().select("doc_id", "doc_key")
    tomb = idx.tombstones()
    if tomb is not None:
        live = live.join(tomb, "doc_id", "left_anti")
    raw = (
        fixture_index["log"].read_all(spark)
        .withColumn(
            "doc_key",
            F.concat_ws("-", F.col("repo"), F.col("path"), F.col("commit")),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("doc_key").orderBy(F.desc("snapshot_id"))
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("doc_key", "content")
    )
    return idx, live.join(raw, "doc_key").select(
        "doc_id", tokenize_code("content").alias("ts")
    )


def test_search_phrase_matches_independent_fullscan(spark, fixture_index):
    idx, toks = _live_corpus(spark, fixture_index)
    # deterministic 2-token phrase that exists: first two tokens of the
    # lowest-id doc
    phrase = list(toks.orderBy("doc_id").select("ts").first()["ts"][:2])
    expect = phrase_topk(
        toks, "ts", "doc_id", phrase, k=20,
        n_docs=idx.manifest.n_docs_total, avgdl=idx.manifest.avgdl,
    ).collect()
    assert len(expect) > 0, f"picked phrase {phrase} matches nothing"
    got = idx.search_phrase(
        " ".join(phrase), fixture_index["log"].read_all(spark), k=20
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in expect
    ]
    # display metadata joined from the doc store
    assert got[0]["doc_key"] is not None and got[0]["repo"] is not None


def test_search_phrase_lang_filter_and_misses(spark, fixture_index):
    idx = SearchIndex(spark, fixture_index["root"])
    src = fixture_index["log"].read_all(spark)
    r = src.select(tokenize_code("content").alias("ts")).first()
    phrase = " ".join(r["ts"][:2])
    # unbounded k: the filtered list must be a subset of ALL phrase
    # matches (a filtered top-k can surface docs below the global cut)
    unfiltered = idx.search_phrase(phrase, src, k=1_000_000).collect()
    filtered = idx.search_phrase(phrase, src, k=50, lang="py").collect()
    assert {x["doc_id"] for x in filtered} <= {x["doc_id"] for x in unfiltered}
    assert all(x["lang"] == "py" for x in filtered)
    # nonexistent terms return nothing; empty query returns nothing
    assert idx.search_phrase("zzqqxx yyzzqq", src, k=5).count() == 0
    assert idx.search_phrase("", src, k=5).count() == 0


def test_search_phrase_reads_only_phrase_term_buckets(spark, fixture_index):
    """The candidate phase must keep the bucket-pruned posting read —
    phrase search pays for the terms it queries, not the index."""
    idx = SearchIndex(spark, fixture_index["root"])
    src = fixture_index["log"].read_all(spark)
    r = src.select(tokenize_code("content").alias("ts")).first()
    phrase = [t for t in r["ts"][:2]]
    n_buckets = fixture_index["cfg"].n_buckets
    files = idx.postings(sorted(set(phrase))).inputFiles()
    buckets = {f.split("bucket=")[1].split("/")[0] for f in files}
    assert 0 < len(buckets) <= min(len(set(phrase)), n_buckets)


def test_facets_match_independent_count(spark, fixture_index):
    """SearchIndex.facets == independent reconstruction: OR-match set
    from re-tokenized live corpus, counted by lang."""
    idx, toks_live = _live_corpus(spark, fixture_index)
    src = fixture_index["log"].read_all(spark)
    r = src.select(tokenize_code("content").alias("ts")).first()
    terms = sorted(set(r["ts"][:3]))
    got = {
        (x["facet"], x["value"]): x["cnt"]
        for x in idx.facets(" ".join(terms), by=["lang"]).collect()
    }
    live_meta = idx.docstore().select("doc_id", "lang")
    tomb = idx.tombstones()
    if tomb is not None:
        live_meta = live_meta.join(tomb, "doc_id", "left_anti")
    expect = {
        ("lang", x["lang"]): x["c"]
        for x in toks_live.filter(
            F.arrays_overlap("ts", F.array(*[F.lit(t) for t in terms]))
        )
        .join(live_meta, "doc_id")
        .groupBy("lang")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert got == expect and len(got) > 0
    # top_n bounds each facet's bucket list
    top1 = idx.facets(" ".join(terms), by=["lang", "repo"], top_n=1).collect()
    assert len(top1) == 2 and {x["facet"] for x in top1} == {"lang", "repo"}


def test_search_prefix_expansion_and_rank_identity(spark, fixture_index):
    """Prefix query: dictionary-backed expansion (sorted, capped), unit
    query weights, and exact==blockmax rank identity on the expanded OR
    query — the same north-rule contract as plain search."""
    idx = SearchIndex(spark, fixture_index["root"])
    # derive a prefix guaranteed productive: first 2 chars of a real term
    some_term = next(iter(idx._try_load_dict_cache() or {"def": 1}))
    pfx = some_term[:2]
    exp = idx.expand_prefix(pfx, max_expansions=10)
    assert 0 < len(exp) <= 10
    assert exp == sorted(exp) and all(t.startswith(pfx) for t in exp)
    ex = idx.search_prefix(pfx, k=15, exact=True, max_expansions=10).collect()
    bm = idx.search_prefix(pfx, k=15, exact=False, max_expansions=10).collect()
    assert [(r["doc_id"], r["score"]) for r in ex] == [
        (r["doc_id"], r["score"]) for r in bm
    ]
    assert len(ex) > 0
    # cap honored: a 1-expansion query scores like a single-term search
    one = idx.search_prefix(some_term, k=15, exact=True,
                            max_expansions=1).collect()
    single = idx.search(some_term, k=15, exact=True).collect()
    assert [(r["doc_id"], r["score"]) for r in one] == [
        (r["doc_id"], r["score"]) for r in single
    ]
    # nonexistent prefix
    assert idx.search_prefix("zzzzqx", k=5).count() == 0


def test_search_wildcard_expansion_and_identity(spark, fixture_index):
    """Wildcard query: glob expansion over the dictionary; '<term>*'
    must equal the prefix expansion, exact==blockmax on the expanded
    query, and every expansion matches the glob."""
    import fnmatch

    idx = SearchIndex(spark, fixture_index["root"])
    some_term = next(iter(idx._try_load_dict_cache() or {"def": 1}))
    pfx = some_term[:2]
    wc = idx.expand_wildcard(pfx + "*", max_expansions=10)
    assert wc == idx.expand_prefix(pfx, max_expansions=10)
    # infix glob: all hits match, sorted, capped
    mid = idx.expand_wildcard("*" + some_term[1:-1] + "*", max_expansions=10)
    assert some_term in mid
    assert all(
        fnmatch.fnmatchcase(t, "*" + some_term[1:-1] + "*") for t in mid
    )
    ex = idx.search_wildcard(pfx + "*", k=15, exact=True,
                             max_expansions=10).collect()
    bm = idx.search_wildcard(pfx + "*", k=15, exact=False,
                             max_expansions=10).collect()
    assert [(r["doc_id"], r["score"]) for r in ex] == [
        (r["doc_id"], r["score"]) for r in bm
    ]
    assert len(ex) > 0
    assert idx.search_wildcard("zz?qx*", k=5).count() == 0


def test_more_like_this_selection_and_identity(spark, fixture_index):
    """MLT: tf-idf term selection is capped and deterministic; the
    expanded query keeps exact==blockmax identity; the seed doc (whose
    own text is the query) ranks first unfiltered."""
    idx = SearchIndex(spark, fixture_index["root"])
    src = fixture_index["log"].read_all(spark)
    seed = src.orderBy("repo", "path").select("content").first()["content"]
    ex = idx.more_like_this(seed, k=15, max_query_terms=8, exact=True).collect()
    bm = idx.more_like_this(seed, k=15, max_query_terms=8).collect()
    assert [(r["doc_id"], r["score"]) for r in ex] == [
        (r["doc_id"], r["score"]) for r in bm
    ]
    assert len(ex) > 0
    # empty seed -> empty result
    assert idx.more_like_this("", k=5).count() == 0
