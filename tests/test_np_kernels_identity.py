"""The numpy scoring kernels (similarity.py) must be BIT-IDENTICAL to
the Column higher-order-function expressions they replace: same
IEEE-754 operation order (sequential fold per dimension), so cosine
scores, LSH sign decisions and IVF cell assignments are exactly equal
— not merely close.  This is what keeps the oracle-checked
embedding_cosine_topk hash and every ANN layout/recall row unchanged
while the scans drop the interpreted lambda dispatch."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mysql2es_spark.operators.similarity import (
    _lit_vec,
    cosine,
    cosine_scores,
    hyperplanes,
    ivf_assign,
    ivf_assign_np,
    lsh_signature,
    lsh_signature_np,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(1234)
    dim = 48
    rows = []
    for i in range(2000):
        scale = float(10.0 ** int(rng.integers(-3, 4)))
        rows.append((i, [float(x) for x in rng.standard_normal(dim) * scale]))
    df = spark.createDataFrame(rows, "id long, v array<double>")
    q = [float(x) for x in rng.standard_normal(dim)]
    return df, q, dim


def test_cosine_scores_bit_identical(spark, vecs):
    df, q, _ = vecs
    col_path = df.select(
        "id", cosine(F.col("v"), _lit_vec(q)).alias("c")
    ).collect()
    np_path = df.select("id", cosine_scores("v", q).alias("c")).collect()
    a = {r["id"]: r["c"] for r in col_path}
    b = {r["id"]: r["c"] for r in np_path}
    assert a == b  # exact float equality, all 2000 rows


def test_lsh_and_ivf_bit_identical(spark, vecs):
    df, q, dim = vecs
    rng = np.random.default_rng(99)
    planes = hyperplanes(dim, 6, 42)
    cents = [[float(x) for x in rng.standard_normal(dim)] for _ in range(16)]
    col_path = df.select(
        "id",
        lsh_signature(F.col("v"), planes).alias("b"),
        ivf_assign(F.col("v"), cents).alias("c"),
    ).collect()
    np_path = df.select(
        "id",
        lsh_signature_np("v", planes).alias("b"),
        ivf_assign_np("v", cents).alias("c"),
    ).collect()
    a = {r["id"]: (r["b"], r["c"]) for r in col_path}
    b = {r["id"]: (r["b"], r["c"]) for r in np_path}
    assert a == b


def test_cosine_scores_null_and_ragged_rows(spark):
    """Rows the Column path cannot score (null vector, wrong length —
    zip_with pads with null) must come back NULL, not NaN/garbage."""
    q = [1.0, 2.0, 3.0]
    df = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, None), (2, [1.0, 2.0])],
        "id long, v array<double>",
    )
    rows = {r["id"]: r["c"] for r in
            df.select("id", cosine_scores("v", q).alias("c")).collect()}
    assert rows[0] is not None
    assert rows[1] is None
    assert rows[2] is None
