"""more_like_this by document id (ES MLT's primary `like: [{_id}]`
form, VERDICT r5 #7): seed tokens come from the token store (one pruned
chunk read) or the source fetch; by-id equals by-that-doc's-text with
the seed excluded."""

import pytest
from pyspark.sql import functions as F

from mysql2es_spark.operators.index import IndexConfig
from mysql2es_spark.plans.build import SearchIndex, full_build
from mysql2es_spark.sources.corpus import generate_corpus

CFG = IndexConfig(
    n_buckets=8, block_size=64, salt_threshold=200, n_salts=4,
    chunk_span=128, id_partitions=8, token_store=True,
)


@pytest.fixture(scope="module")
def mlt_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mlt") / "idx")
    corpus = generate_corpus(spark, 300)
    full_build(spark, corpus, root, CFG, snapshot_id=1)
    return {"root": root, "corpus": corpus}


def _seed_text(spark, mlt_index, idx, seed_id):
    key = idx.docstore().filter(F.col("doc_id") == seed_id).head()["doc_key"]
    return (
        mlt_index["corpus"]
        .withColumn("doc_key", F.concat_ws("-", "repo", "path", "commit"))
        .filter(F.col("doc_key") == key)
        .head()["content"]
    )


def test_mlt_by_id_equals_mlt_by_text(spark, mlt_index):
    idx = SearchIndex(spark, mlt_index["root"], CFG)
    seed_id = int(idx.docstore().agg(F.min("doc_id")).head()[0])
    by_id = [
        (r["doc_id"], r["score"])
        for r in idx.more_like_this(doc_id=seed_id, k=15, exact=True).collect()
    ]
    text = _seed_text(spark, mlt_index, idx, seed_id)
    by_text = [
        (r["doc_id"], r["score"])
        for r in idx.more_like_this(
            text, k=15, exact=True, where=f"doc_id <> {seed_id}"
        ).collect()
    ]
    assert by_id and by_id == by_text
    assert all(d != seed_id for d, _ in by_id)  # ES excludes the seed


def test_mlt_by_id_source_fallback_matches_token_store(spark, mlt_index):
    idx = SearchIndex(spark, mlt_index["root"], CFG)
    seed_id = int(idx.docstore().agg(F.min("doc_id")).head()[0])
    via_store = [
        (r["doc_id"], r["score"])
        for r in idx.more_like_this(doc_id=seed_id, k=15, exact=True).collect()
    ]
    idx2 = SearchIndex(spark, mlt_index["root"], CFG)
    idx2._token_dir_cache = {"content": None}  # force the source fetch
    via_src = [
        (r["doc_id"], r["score"])
        for r in idx2.more_like_this(
            doc_id=seed_id, source_df=mlt_index["corpus"], k=15, exact=True
        ).collect()
    ]
    assert via_store == via_src


def test_mlt_by_id_errors(spark, mlt_index):
    idx = SearchIndex(spark, mlt_index["root"], CFG)
    with pytest.raises(ValueError, match="exactly one"):
        idx.more_like_this("text", doc_id=1)
    with pytest.raises(ValueError, match="exactly one"):
        idx.more_like_this()
    with pytest.raises(KeyError):
        idx.more_like_this(doc_id=10_000_000, k=5)
    idx2 = SearchIndex(spark, mlt_index["root"], CFG)
    idx2._token_dir_cache = {"content": None}
    with pytest.raises(ValueError, match="token store"):
        idx2.more_like_this(doc_id=0, k=5)
