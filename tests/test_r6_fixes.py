"""Round-6 correctness fixes (VERDICT r5 #6/#8, ADVICE r5):

1. wildcard expansion: '[' rejected (ES contract is '*'/'?' only) and
   literal '%'/'_' escaped on the Spark LIKE fallback, so the fnmatch
   driver-cache path and the Spark path expand every pattern identically;
2. template_routed_build applies the same bootstrap upsert dedupe as
   full_build — two revisions of one file dated into different months
   yield ONE live doc (the U2 contract both bootstraps must honor);
3. string-keyed ANN layouts: list-path deletes use the persisted id
   dtype instead of assuming long;
4. search_phrase is replay-proof: a source log carrying the same
   doc_key twice neither duplicates doc_ids in the top-k nor inflates
   the phrase-df denominator.
"""

import pytest
from pyspark.sql import functions as F

from conftest import TEST_CFG
from mysql2es_spark.operators.index import IndexConfig
from mysql2es_spark.plans.build import (
    SearchIndex,
    full_build,
    template_routed_build,
)
from mysql2es_spark.sources.corpus import generate_corpus


# ---------------------------------------------------------------------------
# 1. wildcard two-path agreement
# ---------------------------------------------------------------------------

def test_wildcard_bracket_rejected(spark, fixture_index):
    idx = SearchIndex(spark, fixture_index["root"])
    with pytest.raises(ValueError, match="character classes"):
        idx.expand_wildcard("im[op]ort")


def test_wildcard_like_metachars_are_literal_on_both_paths(
    spark, fixture_index
):
    """Terms are alphanumeric (tokenizer output), so a '_'/'%'-bearing
    pattern must match NOTHING on either path; '?' keeps matching one
    char on both.  Pre-fix the Spark LIKE path treated '_' as
    any-char and diverged from fnmatch."""
    root = fixture_index["root"]
    cached = SearchIndex(spark, root)  # driver dictionary cache path
    nocache = SearchIndex(
        spark, root, IndexConfig(dict_cache_max_terms=0)
    )  # forced Spark dictionary-scan fallback
    assert cached._try_load_dict_cache() is not None
    probe = cached.expand_wildcard("i?port")
    for pat in ("imp_rt", "i%port", "imp_", "%import%"):
        a = cached.expand_wildcard(pat)
        b = nocache.expand_wildcard(pat)
        assert a == b == [], (pat, a, b)
    assert probe == nocache.expand_wildcard("i?port")
    assert "import" in probe


# ---------------------------------------------------------------------------
# 2. routed bootstrap honors the upsert dedupe
# ---------------------------------------------------------------------------

def test_routed_bootstrap_dedupes_across_buckets(spark, tmp_path):
    """A bootstrap corpus carrying v1 (January) and v2 (February) of the
    same 10 files must index ONE live doc per file — the winner by the
    user version column — exactly like full_build would (ADVICE r5)."""
    v1 = generate_corpus(spark, 40, snap_ordinal=0).withColumn(
        "commit_ts", F.to_timestamp(F.lit("2024-01-15"))
    ).withColumn("mtime", F.lit(1000).cast("long"))
    v2 = generate_corpus(spark, 10, snap_ordinal=1).withColumn(
        "commit_ts", F.to_timestamp(F.lit("2024-02-15"))
    ).withColumn("mtime", F.lit(2000).cast("long"))
    root = str(tmp_path / "ridx")
    m = template_routed_build(
        spark, v1.unionByName(v2), root, "commit_ts", "yyyy_MM",
        TEST_CFG, snapshot_id=1, version_column="mtime",
    )
    idx = SearchIndex(spark, root)
    live = idx.docstore()
    tomb = idx.tombstones()
    if tomb is not None:
        live = live.join(tomb, "doc_id", "left_anti")
    rows = live.select("repo", "path", "version").collect()
    assert len(rows) == 40  # one live doc per logical file
    n_v2 = sum(1 for r in rows if r["version"] == 2000)
    assert n_v2 == 10  # every updated file serves the v2 revision
    # flat-index parity: full_build over the same corpus agrees on the
    # live (path -> version) map
    froot = str(tmp_path / "fidx")
    full_build(
        spark, v1.unionByName(v2).drop("commit_ts"), froot, TEST_CFG,
        snapshot_id=1, version_column="mtime",
    )
    flat = {
        (r["repo"], r["path"]): r["version"]
        for r in SearchIndex(spark, froot).docstore()
        .select("repo", "path", "version").collect()
    }
    routed = {(r["repo"], r["path"]): r["version"] for r in rows}
    assert routed == flat


# ---------------------------------------------------------------------------
# 3. string-keyed ANN delete
# ---------------------------------------------------------------------------

def test_ann_delete_with_string_ids(spark, tmp_path):
    from mysql2es_spark.operators.ann_index import (
        AnnIndex, build_ann_index, compact_ann_index, delete_from_ann_index,
    )

    df = spark.range(0, 200).select(
        F.concat(F.lit("vec-"), F.col("id").cast("string")).alias("vid"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: F.sin(F.col("id") * 0.37 + i * 1.13),
        ).cast("array<double>").alias("emb"),
    )
    root = str(tmp_path / "ann_str")
    meta = build_ann_index(spark, df, "emb", "vid", root, n_centroids=4)
    assert meta["id_type"] == "string"
    qv = [float(x) for x in df.filter(F.col("vid") == "vec-0")
          .head()["emb"]]
    idx = AnnIndex(spark, root)
    before = {r["vid"] for r in idx.cross_topk(qv, k=5).collect()}
    assert before
    dead = sorted(before)[:2]
    delete_from_ann_index(spark, root, dead)  # plain Python list of strs
    idx.refresh()
    mid = {r["vid"] for r in idx.cross_topk(qv, k=5).collect()}
    assert not (mid & set(dead))
    compact_ann_index(spark, root)
    idx.refresh()
    after = {r["vid"] for r in idx.cross_topk(qv, k=5).collect()}
    assert not (after & set(dead))


# ---------------------------------------------------------------------------
# 4. replay-proof phrase search
# ---------------------------------------------------------------------------

def test_search_phrase_replayed_source_rows(spark, fixture_index):
    from mysql2es_spark.functions.analyze import tokenize_code

    idx = SearchIndex(spark, fixture_index["root"])
    src = fixture_index["log"].read_all(spark)
    r = src.select(tokenize_code("content").alias("ts")).first()
    phrase = " ".join(r["ts"][:2])
    clean = idx.search_phrase(phrase, src, k=20).collect()
    assert clean
    # replay HALF the source rows (same repo/path/commit — the
    # compensation-window scenario): results must be identical
    replayed = src.unionByName(src.limit(src.count() // 2))
    got = idx.search_phrase(phrase, replayed, k=20).collect()
    ids = [x["doc_id"] for x in got]
    assert len(ids) == len(set(ids)), "duplicate doc_ids in phrase top-k"
    assert [(x["doc_id"], x["score"]) for x in got] == [
        (x["doc_id"], x["score"]) for x in clean
    ]
