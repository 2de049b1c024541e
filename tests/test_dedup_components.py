"""Connected components + canonical selection over near-dup pairs —
the cluster-assignment step of the dedup pipeline (hash-to-min label
propagation; rounds = graph diameter, one shuffle per round)."""

from pyspark.sql import functions as F

from mysql2es_spark.operators import dedup as DD


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "a long, b long")


def _comp_map(df):
    return {int(r["id"]): int(r["component"]) for r in df.collect()}


def test_components_basic(spark):
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22),
                           (5, 6)])
    got = _comp_map(DD.connected_components(pairs))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 5: 5, 6: 5}


def test_components_long_chain(spark):
    """A path graph needs multiple propagation rounds — the min label
    must flow the whole diameter."""
    chain = [(i, i + 1) for i in range(1, 9)]
    got = _comp_map(DD.connected_components(_pairs(spark, chain)))
    assert set(got.values()) == {1} and len(got) == 9


def test_components_order_insensitive(spark):
    """Pairs may arrive in either orientation; components must agree."""
    got_fwd = _comp_map(DD.connected_components(_pairs(spark, [(3, 7), (7, 9)])))
    got_rev = _comp_map(DD.connected_components(_pairs(spark, [(9, 7), (7, 3)])))
    assert got_fwd == got_rev == {3: 3, 7: 3, 9: 3}


def test_dedup_canonical(spark):
    docs = spark.range(1, 13).select(F.col("id").alias("doc_id"))
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11)])
    kept = {
        int(r["doc_id"])
        for r in DD.dedup_canonical(docs, pairs, "doc_id").collect()
    }
    # one canonical per component (min id) + every unpaired doc
    assert kept == {1, 4, 5, 6, 7, 8, 9, 10, 12}


def test_dedup_canonical_empty_pairs(spark):
    docs = spark.range(1, 6).select(F.col("id").alias("doc_id"))
    empty = _pairs(spark, [])
    kept = DD.dedup_canonical(docs, empty, "doc_id")
    assert kept.count() == 5
