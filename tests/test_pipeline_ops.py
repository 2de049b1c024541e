"""Semantics tests for the training-data pipeline operators: dedup
(exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search,
text stats, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mysql2es_spark.functions import textstats as TS
from mysql2es_spark.operators import dedup as DD
from mysql2es_spark.operators import multimodal as MM
from mysql2es_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs through the "
        "green field while birds sing in the morning light near the river"
    )
    near = base.replace("morning", "evening")  # one-token edit
    rows = [
        (0, base),
        (1, base),                      # exact duplicate of 0
        (2, near),                      # near-duplicate of 0
        (3, "completely different text about database query optimization "
            "and distributed systems with partitioned shuffle joins"),
        (4, "der hund läuft durch das feld und die vögel singen nicht ein "
            "lied mit der morgensonne über der stadt"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    reps = DD.exact_dedup(docs, "text", "doc_id").collect()
    by_id = {r["doc_id"]: r["dup_count"] for r in reps}
    assert by_id[0] == 2          # docs 0 and 1 collapse, rep = min id
    assert 1 not in by_id
    assert by_id[2] == 1 and by_id[3] == 1


def test_minhash_identical_docs_same_signature(spark, docs):
    sig = DD.minhash_signature(docs, "text", "doc_id", k=32).collect()
    rows = {r["doc_id"]: tuple(r[f"mh{i}"] for i in range(32)) for r in sig}
    assert rows[0] == rows[1]


def test_minhash_lsh_finds_near_dup(spark, docs):
    sig = DD.minhash_signature(docs, "text", "doc_id", k=64)
    cand = DD.minhash_lsh_candidates(sig, "doc_id", k=64, bands=16).collect()
    pairs = {(r["a"], r["b"]): r["est_jaccard"] for r in cand}
    assert pairs.get((0, 1)) == 1.0          # exact dup: all minhashes equal
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.5   # near dup collides
    assert (0, 3) not in pairs or pairs[(0, 3)] < 0.3


def test_ngram_jaccard_exact(spark, docs):
    out = DD.ngram_jaccard_pairs(docs, "text", "doc_id", shingle_n=3).collect()
    j = {(r["a"], r["b"]): r["jaccard"] for r in out}
    assert j[(0, 1)] == 1.0
    assert 0.5 < j[(0, 2)] < 1.0
    assert (0, 3) not in j                    # no shared 3-gram


def test_simhash(spark, docs):
    out = DD.simhash_candidates(docs, "text", "doc_id", max_hamming=10).collect()
    h = {(r["a"], r["b"]): r["hamming"] for r in out}
    assert h[(0, 1)] == 0
    assert h[(0, 2)] <= 10


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    rows = [(0, [float(x) for x in base])]
    # vec 1: tiny perturbation of 0 (the planted near-dup)
    rows.append((1, [float(x) for x in base + 0.001 * rng.standard_normal(16)]))
    for i in range(2, 200):
        rows.append((i, [float(x) for x in rng.standard_normal(16)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_cosine_matches_numpy(spark, vectors):
    pdf = vectors.toPandas()
    q = np.array(pdf[pdf.vec_id == 0].embedding.iloc[0])
    got = SIM.brute_force_cosine_topk(
        vectors.filter(F.col("vec_id") > 0), "embedding", "vec_id",
        [float(x) for x in q], k=5,
    ).collect()
    mat = np.stack(pdf[pdf.vec_id > 0].embedding.to_numpy())
    ids = pdf[pdf.vec_id > 0].vec_id.to_numpy()
    cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -cos))[:5]
    assert [r["vec_id"] for r in got] == [int(ids[i]) for i in order]
    assert got[0]["vec_id"] == 1  # the planted near-dup wins
    for r, i in zip(got, order):
        assert r["cosine"] == pytest.approx(float(cos[i]), rel=1e-12)


def test_lsh_topk_finds_planted_neighbor(spark, vectors):
    pdf = vectors.toPandas()
    q = [float(x) for x in pdf[pdf.vec_id == 0].embedding.iloc[0]]
    got = SIM.lsh_cosine_topk(
        vectors.filter(F.col("vec_id") > 0), "embedding", "vec_id", q,
        k=5, nbits=8, multiprobe=1,
    ).collect()
    assert got and got[0]["vec_id"] == 1  # near-identical vector shares bucket


def test_ivf_full_probe_equals_brute(spark, vectors):
    pdf = vectors.toPandas()
    q = [float(x) for x in pdf[pdf.vec_id == 0].embedding.iloc[0]]
    cand = vectors.filter(F.col("vec_id") > 0)
    cents = SIM.ivf_train_centroids(cand, "embedding", n_centroids=4, iters=2)
    brute = [(r["vec_id"], r["cosine"]) for r in
             SIM.brute_force_cosine_topk(cand, "embedding", "vec_id", q, 5).collect()]
    full = [(r["vec_id"], r["cosine"]) for r in
            SIM.ivf_cosine_topk(cand, "embedding", "vec_id", q, cents, 5,
                                nprobe=4).collect()]
    assert full == brute  # probing every cell == exact
    part = [r["vec_id"] for r in
            SIM.ivf_cosine_topk(cand, "embedding", "vec_id", q, cents, 5,
                                nprobe=1).collect()]
    assert part and part[0] == 1  # planted near-dup lands in the probed cell


def test_embedding_near_dup_pairs(spark, vectors):
    pairs = SIM.embedding_near_dup_pairs(
        vectors, "embedding", "vec_id", threshold=0.99
    ).collect()
    assert {(r["a"], r["b"]) for r in pairs} >= {(0, 1)}


def test_lang_id(spark):
    rows = [
        (0, "the cat and the dog went to the house of friends"),
        (1, "der hund und die katze sind nicht mit dem haus"),
        (2, "le chat est dans la maison avec les oiseaux"),
        (3, "xyzzy qwerty asdf"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["g"] for r in df.select("id", TS.lang_id("text").alias("g")).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "und"}


def test_quality_and_counts(spark):
    df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog near the hill "
             "and the birds are happy")],
        "id long, text string",
    )
    row = df.select(
        TS.token_count("text").alias("n"),
        TS.bpe_ish_token_count("text").alias("bpe"),
        TS.quality_score("text").alias("q"),
    ).head()
    assert row["n"] == 17
    assert row["bpe"] >= row["n"]
    assert 0.5 < row["q"] <= 1.0


def test_fingerprint_stability(spark):
    df = spark.createDataFrame(
        [(0, "Hello   World\n foo"), (1, "hello world foo")],
        "id long, text string",
    )
    fps = [r["fp"] for r in df.select(TS.fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]  # whitespace/case-normalized


def test_rolling_fingerprint_local_edit(spark):
    a = "one two three four five six seven eight nine ten eleven twelve"
    df = spark.createDataFrame(
        [(0, a), (1, a + " extra"), (2, "totally different words here now")],
        "id long, text string",
    )
    out = {r["id"]: r["rf"] for r in df.select(
        "id", TS.rolling_fingerprint("text", window=4).alias("rf")
    ).collect()}
    assert out[0] == out[1]          # min-shingle survives an append
    assert out[0] != out[2]


def test_media_features_deterministic(spark):
    media = MM.synth_media(spark, n=12)
    f1 = MM.extract_features(media, use_fake_decoder=True).collect()
    f2 = MM.extract_features(media, use_fake_decoder=True).collect()
    a = {r["media_id"]: r["features"] for r in f1}
    b = {r["media_id"]: r["features"] for r in f2}
    assert a == b
    assert all(len(v) == MM.FEATURE_DIM for v in a.values())


def test_media_decoder_stub_raises():
    with pytest.raises(NotImplementedError):
        MM._decode_and_featurize(b"bytes", use_fake=False)


def test_frame_sample_plan(spark):
    media = MM.synth_media(spark, n=12)
    plan = MM.frame_sample_plan(media, every_ms=1000)
    rows = plan.groupBy("media_id").count().collect()
    durs = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    for r in rows:
        assert r["count"] == durs[r["media_id"]] // 1000 + 1


def test_ngram_jaccard_df_cut_bounds_boilerplate(spark):
    # 40 docs sharing a license header: without the df-cut every pair
    # shares header shingles (quadratic candidates); with it, only pairs
    # sharing NON-boilerplate shingles survive.
    header = (
        "licensed under the apache license version two point zero you may "
        "not use this file except in compliance with the license"
    )
    rows = [
        (i, header + f" unique body token{i} alpha{i} beta{i} gamma{i}")
        for i in range(40)
    ]
    # plus one true near-dup pair whose bodies match
    rows.append((100, header + " identical twin body shared across pair"))
    rows.append((101, header + " identical twin body shared across pair"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncut = DD.ngram_jaccard_pairs(
        docs, "text", "doc_id", shingle_n=3, max_shingle_df=None
    )
    assert uncut.count() == 42 * 41 / 2  # all-pairs explosion
    cut = DD.ngram_jaccard_pairs(
        docs, "text", "doc_id", shingle_n=3, max_shingle_df=10
    ).collect()
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in cut}
    # candidate set collapses to the one real pair...
    assert set(pairs) == {(100, 101)}
    # ...and sizes are computed AFTER the cut, so identical post-cut docs
    # score 1.0 (a pre-cut denominator would systematically underestimate)
    assert pairs[(100, 101)] == 1.0


def test_rrf_fuse_full_outer_and_determinism(spark):
    """rrf_fuse: docs in both lists sum both reciprocal terms; docs in
    one list get only theirs; rank ties resolve by id so the fusion is
    deterministic across partitionings."""
    from mysql2es_spark.operators.search import rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 5.0), (4, 1.0)], "doc_id long, s double"
    )
    b = spark.createDataFrame(
        [(3, 0.9), (5, 0.8), (1, 0.7)], "doc_id long, c double"
    )
    got = {r["doc_id"]: r["rrf"]
           for r in rrf_fuse(a, b, "doc_id", "s", "c", k=10).collect()}
    # ranks: a -> 1:1, 2:2 (tie 5.0 -> lower id first), 3:3, 4:4
    #        b -> 3:1, 5:2, 1:3
    assert got[1] == round(1 / 61 + 1 / 63, 6)
    assert got[2] == round(1 / 62, 6)
    assert got[3] == round(1 / 63 + 1 / 61, 6)
    assert got[5] == round(1 / 62, 6)
    assert got[4] == round(1 / 64, 6)
    # repartitioned inputs fuse identically
    got2 = {r["doc_id"]: r["rrf"]
            for r in rrf_fuse(a.repartition(7), b.repartition(3),
                              "doc_id", "s", "c", k=10).collect()}
    assert got == got2
