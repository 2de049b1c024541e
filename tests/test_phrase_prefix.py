"""ES match_phrase_prefix (autocomplete): head tokens immediately
followed by a prefix-matched completion; engine two-phase result equals
an independent full-scan over the live corpus; token-store and source
phase-2 paths agree; single-token form reduces to prefix-position
match."""

from pyspark.sql import functions as F

from mysql2es_spark.functions.analyze import tokenize_code
from mysql2es_spark.operators.search import (
    phrase_prefix_count,
    phrase_prefix_topk,
)
from mysql2es_spark.plans.build import SearchIndex


def test_phrase_prefix_count_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, ["get", "user", "name"]),     # get + us* at pos 1
            (2, ["get", "usage", "get", "user"]),  # two matches
            (3, ["get"]),                     # shorter than head+1
            (4, ["user", "get"]),             # head present, no completion
            (5, []),
        ],
        "doc_id long, ts array<string>",
    )
    got = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", phrase_prefix_count("ts", ["get"], "us").alias("c")
        ).collect()
    }
    assert got == {1: 1, 2: 2, 3: 0, 4: 0, 5: 0}


def _live_toks(spark, fixture_index):
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


def test_engine_matches_independent_fullscan(spark, fixture_index):
    idx, toks = _live_toks(spark, fixture_index)
    # head 'import', completion prefix from a real following token
    r = toks.filter(F.array_contains("ts", "import")).first()
    ts = list(r["ts"])
    i = ts.index("import")
    assert i + 1 < len(ts)
    prefix = ts[i + 1][:2]
    expect = phrase_prefix_topk(
        toks, "ts", "doc_id", ["import"], prefix, k=20,
        n_docs=idx.manifest.n_docs_total, avgdl=idx.manifest.avgdl,
    ).collect()
    assert expect
    got = idx.search_phrase_prefix(
        f"import {prefix}", fixture_index["log"].read_all(spark), k=20
    ).collect()
    assert [(x["doc_id"], x["score"]) for x in got] == [
        (x["doc_id"], x["score"]) for x in expect
    ]
    # empty-prefix-expansion and empty-query guards
    assert idx.search_phrase_prefix(
        "import zzqqnever", fixture_index["log"].read_all(spark), k=5
    ).count() == 0
    assert idx.search_phrase_prefix("", None, k=5).count() == 0


def test_single_token_prefix_phrase(spark, fixture_index):
    """Head-empty form: any doc with a term starting with the prefix,
    tf = number of such positions."""
    idx, toks = _live_toks(spark, fixture_index)
    expect = phrase_prefix_topk(
        toks, "ts", "doc_id", [], "imp", k=15,
        n_docs=idx.manifest.n_docs_total, avgdl=idx.manifest.avgdl,
    ).collect()
    got = idx.search_phrase_prefix(
        "imp", fixture_index["log"].read_all(spark), k=15
    ).collect()
    assert expect and [(x["doc_id"], x["score"]) for x in got] == [
        (x["doc_id"], x["score"]) for x in expect
    ]


def test_token_store_path_agrees(spark, tmp_path):
    from mysql2es_spark.operators.index import IndexConfig
    from mysql2es_spark.plans.build import full_build
    from mysql2es_spark.sources.corpus import generate_corpus

    cfg = IndexConfig(n_buckets=8, block_size=64, salt_threshold=200,
                      n_salts=4, chunk_span=128, id_partitions=8,
                      token_store=True)
    root = str(tmp_path / "ppidx")
    corpus = generate_corpus(spark, 250)
    full_build(spark, corpus, root, cfg, snapshot_id=1)
    idx = SearchIndex(spark, root, cfg)
    via_store = [
        (r["doc_id"], r["score"])
        for r in idx.search_phrase_prefix("import re", k=15).collect()
    ]
    idx2 = SearchIndex(spark, root, cfg)
    idx2._token_dir_cache = {"content": None}
    via_src = [
        (r["doc_id"], r["score"])
        for r in idx2.search_phrase_prefix("import re", corpus, k=15).collect()
    ]
    assert via_store and via_store == via_src
