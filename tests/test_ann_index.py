"""Materialized ANN layout (VERDICT r3 next-round #1): queries must read
ONLY probed partitions (asserted via inputFiles over the explicit
multi-path read) while holding recall@10 >= 0.9 on clustered embeddings
— the regime ANN indexes are built for."""

import os
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from mysql2es_spark.operators.ann_index import AnnIndex, build_ann_index

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


@pytest.fixture(scope="module")
def ann_root(spark, clustered, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ann") / "idx")
    meta = build_ann_index(spark, clustered, "emb", "vec_id", root)
    assert meta["dim"] == DIM
    return root


def _brute(pdf, q, k=10, exclude=None):
    mask = pdf["vec_id"] != exclude if exclude is not None else slice(None)
    sub = pdf[mask] if exclude is not None else pdf
    V = np.stack(sub["emb"].to_numpy())
    ids = sub["vec_id"].to_numpy()
    sims = (V @ q) / (np.linalg.norm(V, axis=1) * np.linalg.norm(q))
    order = np.argsort(-sims, kind="stable")
    return [int(ids[i]) for i in order[:k]]


QIDS = [0, 171, 342, 513, 684]


def test_lsh_indexed_recall_and_pruning(spark, clustered, ann_root):
    idx = AnnIndex(spark, ann_root)
    pdf = clustered.toPandas()
    total_parts = len(idx.partition_paths())
    recalls, fracs = [], []
    for qi in QIDS:
        q = [float(x) for x in pdf[pdf.vec_id == qi].emb.iloc[0]]
        true10 = set(_brute(pdf, np.array(q), exclude=qi))
        probes = idx.lsh_probes(q)
        paths = idx.partition_paths(buckets=probes)
        res = idx.lsh_topk(q, k=11)  # k+1: the query vector itself is in
        got = [int(r["vec_id"]) for r in res.collect() if r["vec_id"] != qi][:10]
        recalls.append(len(true10 & set(got)) / 10)
        fracs.append(len(paths) / total_parts)
        # the read touches ONLY probed lsh_bucket partitions
        files = res.inputFiles()
        assert files
        for f in files:
            m = re.search(r"lsh_bucket=(\d+)", f)
            assert m and int(m.group(1)) in probes, f
    assert np.mean(recalls) >= 0.9, recalls
    assert np.mean(fracs) < 0.75, fracs  # really pruned, not a full scan


def test_ivf_indexed_recall_and_pruning(spark, clustered, ann_root):
    idx = AnnIndex(spark, ann_root)
    pdf = clustered.toPandas()
    total_parts = len(idx.partition_paths())
    recalls, fracs = [], []
    for qi in QIDS:
        q = [float(x) for x in pdf[pdf.vec_id == qi].emb.iloc[0]]
        true10 = set(_brute(pdf, np.array(q), exclude=qi))
        probes = idx.ivf_probes(q)
        paths = idx.partition_paths(cells=probes)
        res = idx.ivf_topk(q, k=11)
        got = [int(r["vec_id"]) for r in res.collect() if r["vec_id"] != qi][:10]
        recalls.append(len(true10 & set(got)) / 10)
        fracs.append(len(paths) / total_parts)
        files = res.inputFiles()
        assert files
        for f in files:
            m = re.search(r"ivf_cell=(\d+)", f)
            assert m and int(m.group(1)) in probes, f
    assert np.mean(recalls) >= 0.9, recalls
    assert np.mean(fracs) < 0.5, fracs


def test_indexed_matches_probed_bruteforce(spark, clustered, ann_root):
    """The indexed top-k must EXACTLY equal brute-force cosine over the
    probe-restricted candidate set (the layout changes what is scanned,
    never how candidates are scored)."""
    from mysql2es_spark.operators.similarity import (
        hyperplanes, lsh_signature,
    )

    idx = AnnIndex(spark, ann_root)
    pdf = clustered.toPandas()
    q = [float(x) for x in pdf[pdf.vec_id == 342].emb.iloc[0]]
    probes = idx.lsh_probes(q)
    planes = hyperplanes(DIM, idx.meta["nbits"], idx.meta["seed"])
    cand = clustered.filter(
        lsh_signature(F.col("emb"), planes).isin(sorted(probes))
    )
    from mysql2es_spark.operators.similarity import brute_force_cosine_topk

    expect = [(int(r["vec_id"]), round(r["cosine"], 9))
              for r in brute_force_cosine_topk(
                  cand, "emb", "vec_id", q, k=10).collect()]
    got = [(int(r["vec_id"]), round(r["cosine"], 9))
           for r in idx.lsh_topk(q, k=10).collect()]
    assert got == expect and got


def test_append_to_layout(spark, clustered, tmp_path):
    """Incremental vectors: append uses the PERSISTED planes/centroids,
    so appended rows land in the same partition scheme and queries see
    one coherent layout."""
    from mysql2es_spark.operators.ann_index import append_ann_index

    first = clustered.filter(F.col("vec_id") < 900)
    rest = clustered.filter(F.col("vec_id") >= 900)
    root = str(tmp_path / "annapp")
    build_ann_index(spark, first, "emb", "vec_id", root)
    append_ann_index(spark, rest, root)
    idx = AnnIndex(spark, root)
    total = spark.read.parquet(*idx.partition_paths())
    assert total.count() == N_CLUSTERS * PER_CLUSTER
    # an appended vector is its own nearest neighbor through the index
    pdf = clustered.toPandas()
    q = [float(x) for x in pdf[pdf.vec_id == 1100].emb.iloc[0]]
    res = idx.lsh_topk(q, k=5)
    got = [int(r["vec_id"]) for r in res.collect()]
    assert got and got[0] == 1100
    # pruning still holds over the appended layout
    probes = idx.lsh_probes(q)
    for f in res.inputFiles():
        m = re.search(r"lsh_bucket=(\d+)", f)
        assert m and int(m.group(1)) in probes, f


def test_stream_ann_ingest(spark, clustered, tmp_path):
    """Streaming vectors append into the layout through the same
    persisted-scheme path as the batch append (foreachBatch)."""
    from mysql2es_spark.streaming.stream import stream_ann_ingest

    first = clustered.filter(F.col("vec_id") < 900)
    rest = clustered.filter(F.col("vec_id") >= 900)
    root = str(tmp_path / "annstream")
    build_ann_index(spark, first, "emb", "vec_id", root)
    vdir = str(tmp_path / "vstream")
    rest.write.mode("overwrite").parquet(vdir)
    q = stream_ann_ingest(spark, vdir, root,
                          str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    idx = AnnIndex(spark, root)
    total = spark.read.parquet(*idx.partition_paths())
    assert total.count() == N_CLUSTERS * PER_CLUSTER
    pdf = clustered.toPandas()
    qv = [float(x) for x in pdf[pdf.vec_id == 1150].emb.iloc[0]]
    got = [int(r["vec_id"]) for r in idx.lsh_topk(qv, k=3).collect()]
    assert got and got[0] == 1150


def test_ann_layout_via_hadoop_api(spark, clustered, tmp_path, monkeypatch):
    """The ANN layout is location-transparent like the search index: the
    sidecar write/read and partition-dir enumeration run through the
    Hadoop FileSystem API (file:/ here; same code path as hdfs://)."""
    from mysql2es_spark.sources import fs as fsmod

    monkeypatch.setattr(fsmod, "FORCE_HADOOP", True)
    root = str(tmp_path / "annh")
    build_ann_index(spark, clustered, "emb", "vec_id", root)
    idx = AnnIndex(spark, root)
    assert not idx._fs.local
    pdf = clustered.toPandas()
    q = [float(x) for x in pdf[pdf.vec_id == 0].emb.iloc[0]]
    got = [int(r["vec_id"]) for r in idx.lsh_topk(q, k=5).collect()]
    assert got and got[0] == 0  # the vector itself is its own 1-NN
    got_ivf = [int(r["vec_id"]) for r in idx.ivf_topk(q, k=5).collect()]
    assert got_ivf and got_ivf[0] == 0


def test_brute_topk_is_ground_truth(spark, clustered, ann_root):
    """AnnIndex.brute_topk over the whole layout == numpy brute force
    over the source vectors (the recall-measurement baseline)."""
    idx = AnnIndex(spark, ann_root)
    pdf = clustered.toPandas()
    q = np.array(pdf[pdf.vec_id == 513].emb.iloc[0])
    expect = _brute(pdf, q, k=5)
    got = [int(r["vec_id"])
           for r in idx.brute_topk([float(x) for x in q], k=5).collect()]
    assert got == expect


def test_layout_roundtrip_and_meta(spark, clustered, ann_root):
    idx = AnnIndex(spark, ann_root)
    # every row landed in exactly one leaf; ids survive the roundtrip
    total = spark.read.parquet(*idx.partition_paths())
    assert total.count() == N_CLUSTERS * PER_CLUSTER
    assert total.select("vec_id").distinct().count() == N_CLUSTERS * PER_CLUSTER
    assert os.path.exists(os.path.join(ann_root, "ann_meta.json"))
    assert len(idx.meta["planes"]) == idx.meta["nbits"]
    assert len(idx.meta["centroids"]) == idx.meta["n_centroids"]
