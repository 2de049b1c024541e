"""ANN quality evidence (VERDICT r2 #8): recall@10 vs brute force at
default parameters on clustered embeddings — the regime ANN indexes are
built for.  (The driver's synthetic sf* embeddings are near-random,
where ANY sublinear method's recall ~= its scanned fraction; BENCH.md
reports those numbers separately and honestly.)"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mysql2es_spark.operators import similarity as SIM

DIM = 32
N_CLUSTERS = 20
PER_CLUSTER = 60


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((N_CLUSTERS, DIM)) * 3.0
    rows = []
    vid = 0
    for c in range(N_CLUSTERS):
        for _ in range(PER_CLUSTER):
            v = centers[c] + 0.6 * rng.standard_normal(DIM)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, emb array<double>")


def _brute(pdf, q, k=10):
    V = np.stack(pdf["emb"].to_numpy())
    ids = pdf["vec_id"].to_numpy()
    sims = (V @ q) / (np.linalg.norm(V, axis=1) * np.linalg.norm(q))
    order = np.argsort(-sims, kind="stable")
    return [int(ids[i]) for i in order[:k]]


def _recall(true_ids, got_ids):
    return len(set(true_ids) & set(got_ids)) / len(true_ids)


def test_lsh_recall_at_defaults(spark, clustered):
    pdf = clustered.toPandas()
    recalls, fractions = [], []
    n = len(pdf)
    for qi in [0, 171, 342, 513, 684]:
        q = np.array(pdf[pdf.vec_id == qi].emb.iloc[0])
        rest = clustered.filter(F.col("vec_id") != qi)
        true10 = _brute(pdf[pdf.vec_id != qi], q)
        got = SIM.lsh_cosine_topk(rest, "emb", "vec_id",
                                  [float(x) for x in q], k=10)
        got_ids = [int(r["vec_id"]) for r in got.collect()]
        recalls.append(_recall(true10, got_ids))
    assert np.mean(recalls) >= 0.9, recalls


def test_lsh_prunes_meaningfully(spark, clustered):
    """Multi-table union must still skip a real fraction of the corpus
    (otherwise "ANN" is a brute scan with extra steps)."""
    pdf = clustered.toPandas()
    q = [float(x) for x in pdf[pdf.vec_id == 0].emb.iloc[0]]
    qv = np.array(q)
    cond = None
    for t in range(8):
        planes = SIM.hyperplanes(DIM, 8, 42 + t)
        buckets = SIM._probe_buckets(qv, planes, 8, 1)
        c = SIM.lsh_signature(F.col("emb"), planes).isin(buckets)
        cond = c if cond is None else (cond | c)
    frac = clustered.filter(cond).count() / clustered.count()
    assert frac < 0.5, frac


def test_ivf_recall_at_defaults(spark, clustered):
    pdf = clustered.toPandas()
    cents = SIM.ivf_train_centroids(clustered, "emb", n_centroids=16, iters=3)
    recalls = []
    for qi in [0, 171, 342, 513, 684]:
        q = [float(x) for x in pdf[pdf.vec_id == qi].emb.iloc[0]]
        rest = clustered.filter(F.col("vec_id") != qi)
        true10 = _brute(pdf[pdf.vec_id != qi], np.array(q))
        got = SIM.ivf_cosine_topk(rest, "emb", "vec_id", q, cents, k=10)
        got_ids = [int(r["vec_id"]) for r in got.collect()]
        recalls.append(_recall(true10, got_ids))
    assert np.mean(recalls) >= 0.9, recalls
