"""Round-7 fixes (ADVICE r6 + VERDICT r6 #4).

1. (medium) token-store writes from a corpus carrying byte-identical
   replayed rows must not store duplicate (doc_id, ts) rows — they'd
   inflate the phrase-df denominator and duplicate top-k doc_ids on the
   store path (the docstore and the source-join phrase path already
   guard this).
2. (VERDICT r6 #4) the token-store write must be file-count-bounded:
   one file per chunk partition, not tasks x chunks small files.
3. (low) enabling token_store on an index whose docstore/postings are
   complete must NOT re-run the tokenize spill — only the token dirs
   are missing and they re-analyze from the source.
4. (low) delete_from_ann_index must accept int-like ids that are not
   Python ints (numpy int64 from a collect) on long-typed layouts.
"""

import os

import pytest
from pyspark.sql import functions as F

from mysql2es_spark.operators.index import IndexConfig
from mysql2es_spark.plans.build import SearchIndex, full_build
from mysql2es_spark.sources.corpus import generate_corpus

TOK_CFG = IndexConfig(
    n_buckets=8, block_size=64, salt_threshold=200, n_salts=4,
    chunk_span=128, id_partitions=8, token_store=True,
)


def test_token_store_replayed_rows_deduped(spark, tmp_path):
    """ADVICE r6 medium: a byte-identical replayed corpus (same
    doc_key/version twice) must yield ONE token-store row per doc_id,
    and the store-path phrase results must match a clean build's."""
    root = str(tmp_path / "idx")
    clean_root = str(tmp_path / "idx_clean")
    base = generate_corpus(spark, 120)
    replayed = base.unionByName(base)  # byte-identical duplicates
    full_build(spark, replayed, root, TOK_CFG, snapshot_id=1)
    full_build(spark, base, clean_root, TOK_CFG, snapshot_id=1)

    idx = SearchIndex(spark, root, TOK_CFG)
    toks = idx.token_chunks("content")
    assert toks.count() == 120
    assert toks.select("doc_id").distinct().count() == 120

    from mysql2es_spark.functions.analyze import tokenize_code

    ts = base.orderBy("repo", "path").select(
        tokenize_code("content").alias("ts")
    ).first()["ts"]
    phrase = " ".join(ts[:2])
    got = [
        (r["doc_key"], r["score"])
        for r in idx.search_phrase(phrase, k=20).collect()
    ]
    want = [
        (r["doc_key"], r["score"])
        for r in SearchIndex(spark, clean_root, TOK_CFG)
        .search_phrase(phrase, k=20).collect()
    ]
    assert got and got == want
    assert len({k for k, _ in got}) == len(got)  # no duplicate docs


def test_token_store_one_file_per_chunk(spark, tmp_path):
    """VERDICT r6 #4: the chunk repartition bounds the store at one
    data file per chunk partition."""
    root = str(tmp_path / "idx")
    full_build(spark, generate_corpus(spark, 300), root, TOK_CFG,
               snapshot_id=1)
    tok_dir = os.path.join(root, "segments", "seg-000001", "tokens",
                           "content")
    chunk_dirs = [d for d in os.listdir(tok_dir) if d.startswith("chunk=")]
    assert len(chunk_dirs) >= 2
    for d in chunk_dirs:
        files = [
            f for f in os.listdir(os.path.join(tok_dir, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)


def test_resume_adds_token_store_without_respill(spark, tmp_path, monkeypatch):
    """ADVICE r6 low: re-running a completed build with token_store=True
    must add ONLY the token dirs — the tokenize spill (docstore/postings
    feed) must not be rewritten."""
    import dataclasses

    import mysql2es_spark.plans.build as B

    root = str(tmp_path / "idx")
    corpus = generate_corpus(spark, 80)
    plain = dataclasses.replace(TOK_CFG, token_store=False)
    full_build(spark, corpus, root, plain, snapshot_id=1)
    seg_dir = os.path.join(root, "segments", "seg-000001")
    assert not os.path.exists(os.path.join(seg_dir, "_tfspill"))
    assert not os.path.exists(os.path.join(seg_dir, "tokens"))

    # a spill write during the resume would recreate _tfspill; also trap
    # it via the stage_done gate by watching the spill dir afterwards
    full_build(spark, corpus, root, TOK_CFG, snapshot_id=1)
    assert os.path.isdir(os.path.join(seg_dir, "tokens", "content"))
    assert not os.path.exists(os.path.join(seg_dir, "_tfspill"))

    # and the resumed store serves the phrase path
    idx = SearchIndex(spark, root, TOK_CFG)
    assert idx._token_dirs("content") is not None
    assert idx.token_chunks("content").count() == 80


def test_ann_delete_accepts_numpy_ints(spark, tmp_path):
    """ADVICE r6 low: int-like-but-not-int ids (numpy int64) must
    tombstone long-typed layouts."""
    np = pytest.importorskip("numpy")

    from mysql2es_spark.operators.ann_index import (
        AnnIndex,
        build_ann_index,
        delete_from_ann_index,
    )

    rng = np.random.default_rng(7)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(8)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    root = str(tmp_path / "ann")
    build_ann_index(spark, df, "emb", "vec_id", root, nbits=3,
                    n_centroids=2, iters=1)
    delete_from_ann_index(spark, root, [np.int64(3), np.int64(11)])
    idx = AnnIndex(spark, root)
    got = {int(r["vec_id"]) for r in idx.brute_topk(rows[0][1], k=40).collect()}
    assert 3 not in got and 11 not in got
    assert len(got) == 38
