"""Chunk-partitioned token store (VERDICT r5 #2): phrase phase-2 must
read only the CANDIDATE chunks' files instead of scanning the source
corpus, results staying hash-identical to the source-join path, and the
store must survive deltas and compaction."""

import os

import pytest
from pyspark.sql import functions as F

from mysql2es_spark.functions.analyze import tokenize_code
from mysql2es_spark.operators.index import IndexConfig
from mysql2es_spark.plans.build import (
    SearchIndex, apply_delta, compact, full_build,
)
from mysql2es_spark.sources.corpus import generate_corpus

TOK_CFG = IndexConfig(
    n_buckets=8, block_size=64, salt_threshold=200, n_salts=4,
    chunk_span=128, id_partitions=8, token_store=True,
)


@pytest.fixture(scope="module")
def tok_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tokidx") / "idx")
    rare = spark.createDataFrame(
        [
            ("zrepo", "zz/a.py", "c1", "py", "zzuniqa zzuniqb padding one"),
            ("zrepo", "zz/b.py", "c2", "py", "lead zzuniqa zzuniqb tail"),
        ],
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    corpus = generate_corpus(spark, 500).unionByName(rare)
    full_build(spark, corpus, root, TOK_CFG, snapshot_id=1)
    return {"root": root, "corpus": corpus}


def _pick_phrase(corpus):
    r = corpus.select(tokenize_code("content").alias("ts")).first()
    return [t for t in r["ts"][:2]]


def test_token_store_layout_and_pruned_read(spark, tok_index):
    idx = SearchIndex(spark, tok_index["root"], TOK_CFG)
    dirs = idx._token_dirs("content")
    assert dirs is not None and all(os.path.isdir(d) for d in dirs)
    chunks = idx._token_chunk_dirs(dirs[0])
    assert len(chunks) >= 3  # 500 docs / span 128 -> >= 4 chunks
    # pruned read touches ONLY the asked chunk's files
    sub = idx.token_chunks("content", [chunks[1]])
    files = sub.inputFiles()
    assert files and all(f"/chunk={chunks[1]}/" in f for f in files)
    # round-trip: the store holds exactly the analyzer's tokens
    got = sub.limit(1).collect()[0]
    doc = idx.docstore().filter(F.col("doc_id") == got["doc_id"]).first()
    src = tok_index["corpus"].filter(
        F.concat_ws("-", "repo", "path", "commit") == doc["doc_key"]
    ).select(tokenize_code("content").alias("ts")).first()
    assert list(got["ts"]) == list(src["ts"])


def test_phrase_token_path_matches_source_path(spark, tok_index):
    idx = SearchIndex(spark, tok_index["root"], TOK_CFG)
    phrase = _pick_phrase(tok_index["corpus"])
    via_store = idx.search_phrase(" ".join(phrase), k=20)  # no source_df
    via_src = idx.search_phrase(
        " ".join(phrase), tok_index["corpus"], k=20
    )
    # force the source path by bypassing the store detection
    idx2 = SearchIndex(spark, tok_index["root"], TOK_CFG)
    idx2._token_dir_cache = {"content": None}
    via_src = idx2.search_phrase(" ".join(phrase), tok_index["corpus"], k=20)
    a = [(r["doc_id"], r["score"]) for r in via_store.collect()]
    b = [(r["doc_id"], r["score"]) for r in via_src.collect()]
    assert a and a == b


def test_phrase_reads_only_candidate_chunks(spark, tok_index):
    """The inputFiles-asserted pruning gate (VERDICT r5 #2 'done'
    criterion): every token-store file in the phrase plan belongs to a
    chunk that actually holds a candidate doc."""
    idx = SearchIndex(spark, tok_index["root"], TOK_CFG)
    phrase = ["zzuniqa", "zzuniqb"]  # df=2: candidates live in few chunks
    assert idx.search_phrase(" ".join(phrase), k=20).count() == 2
    top = idx.search_phrase(" ".join(phrase), k=20)
    # candidate chunks, recomputed independently
    iterms = sorted(set(phrase))
    tf = idx.tf_table(iterms).filter(F.col("term").isin(iterms))
    cand = (
        tf.groupBy("doc_id")
        .agg(F.count_distinct("term").alias("nt"))
        .filter(F.col("nt") == len(iterms))
    )
    span = idx.manifest.chunk_span
    want = {
        int(r["c"])
        for r in cand.select(
            F.expr(f"doc_id div {span}").alias("c")
        ).distinct().collect()
    }
    tok_files = [f for f in top.inputFiles() if "/tokens/" in f]
    assert tok_files, "phrase plan did not read the token store"
    touched = {
        int(f.split("/chunk=")[1].split("/")[0]) for f in tok_files
    }
    assert touched <= want
    # and it must NOT read every chunk the store has
    all_chunks = set(idx._token_chunk_dirs(idx._token_dirs("content")[0]))
    assert touched < all_chunks


def test_no_token_store_requires_source(spark, tmp_path):
    root = str(tmp_path / "plain")
    cfg = IndexConfig(n_buckets=8, chunk_span=128, id_partitions=8)
    corpus = generate_corpus(spark, 60)
    full_build(spark, corpus, root, cfg, snapshot_id=1)
    idx = SearchIndex(spark, root, cfg)
    phrase = _pick_phrase(corpus)
    with pytest.raises(ValueError, match="token store"):
        idx.search_phrase(" ".join(phrase), k=5)


def test_token_store_survives_delta_and_compact(spark, tmp_path):
    root = str(tmp_path / "lifecycle")
    corpus = generate_corpus(spark, 300)
    full_build(spark, corpus, root, TOK_CFG, snapshot_id=1)
    # delta: update 30 docs (tombstones old revisions), add 40
    upd = generate_corpus(spark, 30, snap_ordinal=1)
    new = generate_corpus(spark, 40, snap_ordinal=1, id_start=300)
    delta = upd.unionByName(new).withColumn(
        "snapshot_id", F.lit(2).cast("long")
    )
    apply_delta(spark, delta, root, TOK_CFG, target_snap=2)
    live = upd.unionByName(new).unionByName(
        generate_corpus(spark, 270, id_start=30)
    )
    idx = SearchIndex(spark, root, TOK_CFG)
    phrase = _pick_phrase(upd)  # phrase from an UPDATED doc's v2 text
    before = [
        (r["doc_id"], r["score"])
        for r in idx.search_phrase(" ".join(phrase), k=30).collect()
    ]
    # source-path twin over the live corpus agrees
    idx_src = SearchIndex(spark, root, TOK_CFG)
    idx_src._token_dir_cache = {"content": None}
    twin = [
        (r["doc_id"], r["score"])
        for r in idx_src.search_phrase(" ".join(phrase), live, k=30).collect()
    ]
    assert before and before == twin
    # compact drops tombstoned docs physically; token path still serves.
    # Scores legitimately shift (post-compact N/avgdl exclude the dead
    # docs — Lucene semantics, same as `search`), so compare against the
    # source-path twin recomputed on the compacted index: identical
    # rows, and the same doc set as pre-compact (only stats moved).
    compact(spark, root, TOK_CFG)
    idx2 = SearchIndex(spark, root, TOK_CFG)
    assert idx2._token_dirs("content") is not None
    after = [
        (r["doc_id"], r["score"])
        for r in idx2.search_phrase(" ".join(phrase), k=30).collect()
    ]
    idx2_src = SearchIndex(spark, root, TOK_CFG)
    idx2_src._token_dir_cache = {"content": None}
    twin2 = [
        (r["doc_id"], r["score"])
        for r in idx2_src.search_phrase(
            " ".join(phrase), live, k=30
        ).collect()
    ]
    assert after == twin2
    assert {d for d, _ in after} == {d for d, _ in before}
