"""The fused mapInPandas minhash_signature must produce EXACTLY the
values of the Column pipeline it replaced (explode(shingles) ->
xxhash64 -> pmod -> k min-aggregations), for every doc including the
degenerate ones (short docs, empty/null content)."""

from pyspark.sql import functions as F

from mysql2es_spark.operators.dedup import (
    _MERSENNE,
    _hash_params,
    minhash_signature,
    shingles,
)


def _column_pipeline_signature(df, text_col, id_col, k, shingle_n, seed):
    """The pre-r7 implementation, verbatim."""
    params = _hash_params(k, seed)
    ex = df.select(
        F.col(id_col), F.explode(shingles(text_col, shingle_n)).alias("sh")
    ).withColumn("h", F.pmod(F.xxhash64("sh"), F.lit(_MERSENNE)))
    aggs = [
        F.min(
            (F.col("h") * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE)
        ).alias(f"mh{i}")
        for i, (a, b) in enumerate(params)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def test_minhash_signature_matches_column_pipeline(spark):
    from mysql2es_spark.sources.corpus import generate_corpus

    corpus = generate_corpus(spark, 120).selectExpr(
        "xxhash64(repo, path, commit) as did", "content"
    )
    degenerate = spark.createDataFrame(
        [
            (1_000_001, "one two"),          # fewer tokens than shingle_n
            (1_000_002, "x"),                # single token
            (1_000_003, ""),                 # empty
            (1_000_004, None),               # null
            (1_000_005, "a b c a b c a b"),  # repeated shingles
        ],
        "did long, content string",
    )
    df = corpus.unionByName(degenerate)
    k = 16
    want = {
        r["did"]: tuple(r[f"mh{i}"] for i in range(k))
        for r in _column_pipeline_signature(
            df, "content", "did", k, 3, 42
        ).collect()
    }
    got = {
        r["did"]: tuple(r[f"mh{i}"] for i in range(k))
        for r in minhash_signature(df, "content", "did", k=k).collect()
    }
    assert set(got) == set(want)
    mismatches = {d for d in want if want[d] != got[d]}
    assert not mismatches, sorted(mismatches)[:5]


def test_minhash_signature_string_ids(spark):
    df = spark.createDataFrame(
        [("a", "alpha beta gamma delta"), ("b", "beta gamma delta eps")],
        "doc string, content string",
    )
    rows = minhash_signature(df, "content", "doc", k=8).collect()
    assert {r["doc"] for r in rows} == {"a", "b"}
