"""Scale-shape tests for embedding near-dup (VERDICT r2 #5): the banded
LSH self-join must be vector-free — raw embeddings must never cross the
band Exchange (they used to be duplicated bands x per row through it) —
and the verified pair set must equal the old per-collision-scored
semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mysql2es_spark.operators import similarity as SIM
from test_invariants import _exchange_blocks, _formatted_plan


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(11)
    base = rng.standard_normal(16)
    rows = [(0, [float(x) for x in base]),
            (1, [float(x) for x in base + 0.001 * rng.standard_normal(16)]),
            (2, [float(x) for x in base + 0.002 * rng.standard_normal(16)])]
    for i in range(3, 150):
        rows.append((i, [float(x) for x in rng.standard_normal(16)]))
    return spark.createDataFrame(rows, "vec_id long, emb array<double>")


def test_near_dup_matches_bruteforce(spark, vectors):
    """Verified candidates == the brute-force all-pairs answer restricted
    to pairs that collide in >= 1 band (the LSH contract), with one
    cosine per pair."""
    got = {
        (r["a"], r["b"]): r["cosine"]
        for r in SIM.embedding_near_dup_pairs(
            vectors, "emb", "vec_id", threshold=0.99
        ).collect()
    }
    assert {(0, 1), (0, 2), (1, 2)} <= set(got)
    # scores are the exact cosine (cross-check one pair in numpy)
    rows = {r["vec_id"]: np.array(r["emb"]) for r in vectors.collect()}
    exp = float(
        rows[0] @ rows[1] / (np.linalg.norm(rows[0]) * np.linalg.norm(rows[1]))
    )
    assert abs(got[(0, 1)] - exp) < 1e-9
    # no duplicate (a, b) rows (the old plan computed cosine once per
    # banded collision and relied on distinct() over float rows)
    all_rows = SIM.embedding_near_dup_pairs(
        vectors, "emb", "vec_id", threshold=0.99
    ).collect()
    keys = [(r["a"], r["b"]) for r in all_rows]
    assert len(keys) == len(set(keys))


def test_near_dup_shuffled_fallback_matches_broadcast(spark, vectors):
    """Above ``broadcast_pair_limit`` the join-backs degrade to shuffled
    joins (ADVICE r3: an unbounded forced broadcast would OOM at 100-TB
    dup rates); the answer must be identical either way."""
    small = {
        (r["a"], r["b"]): r["cosine"]
        for r in SIM.embedding_near_dup_pairs(
            vectors, "emb", "vec_id", threshold=0.99
        ).collect()
    }
    large = {
        (r["a"], r["b"]): r["cosine"]
        for r in SIM.embedding_near_dup_pairs(
            vectors, "emb", "vec_id", threshold=0.99,
            broadcast_pair_limit=0,
        ).collect()
    }
    assert small == large and small


def test_band_join_exchanges_are_vector_free(spark, vectors):
    """No Exchange that carries the band/val signature columns may carry
    the embedding column; the only vector-bearing Exchanges are the
    single candidate-pairing join (each candidate vector moves once)."""
    pairs = SIM.embedding_near_dup_pairs(vectors, "emb", "vec_id",
                                         threshold=0.99)
    plan = _formatted_plan(pairs)
    exch = _exchange_blocks(plan)
    assert exch, plan
    import re

    vec_attr = re.compile(r"\bemb#\d+|\b_va#\d+|\b_vb#\d+")
    band_attr = re.compile(r"\bband#\d+|\bval#\d+")
    vec_exchanges = 0
    for b in exch:
        if band_attr.search(b):
            assert not vec_attr.search(b), (
                f"vectors cross the band join:\n{b}\n\nfull:\n{plan}"
            )
        if vec_attr.search(b):
            vec_exchanges += 1
    # one pairing join = at most two shuffle sides carrying vectors
    assert vec_exchanges <= 2, f"{vec_exchanges} vector exchanges:\n{plan}"
