"""Posting-encode scaling experiments (VERDICT r2 #4).

The encode half of the build (tf shuffle -> applyInPandas varint encode
-> partitioned write) scaled 1.7x at 4x cores in round 2 while the
tokenize half hit the box ceiling (2.6-3.1x).  This script isolates the
stage and A/Bs candidate fixes, interleaved at local[8]/local[32] with
CPU pinning:

  baseline   groupBy(term, salt).applyInPandas(_encode_group)  (current)
  bucketgrp  groupBy(bucket, salt): one pandas group per (bucket, salt),
             pandas-side groupby(term) inside — trades ~vocab-count
             Spark group overheads for 32xS big groups
  arrowbatch baseline + arrow maxRecordsPerBatch 100k
  zstdshuf   baseline + spark.io.compression.codec=zstd

Usage: python scripts/encode_scaling.py [--files 100000] [--reps 2]
Prints one JSON line per (variant, cores, rep) and a summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

VARIANTS = ["baseline", "bucketgrp", "arrowbatch", "zstdshuf"]


def _worker(workdir: str, variant: str, cores: int) -> None:
    os.sched_setaffinity(0, set(range(cores)))
    sys.path.insert(0, "/root/repo")
    import pandas as pd
    from pyspark.sql import functions as F

    from mysql2es_spark.operators.index import (
        IndexConfig, POSTING_SCHEMA, _encode_group, encode_postings,
    )
    from mysql2es_spark.session import get_spark

    extra = {}
    if variant == "arrowbatch":
        extra["spark.sql.execution.arrow.maxRecordsPerBatch"] = "100000"
    if variant == "zstdshuf":
        extra["spark.io.compression.codec"] = "zstd"
    spark = get_spark(app_name=f"enc_{variant}_{cores}", cores=cores,
                      extra_conf=extra)
    tf = spark.read.parquet(os.path.join(workdir, "tf"))
    n_files = int(os.environ["ENC_N_FILES"])
    cfg = IndexConfig(
        n_buckets=32, block_size=128,
        salt_threshold=max(2000, n_files // 4), n_salts=8,
        id_partitions=64, chunk_span=max(1024, n_files // 64),
    )
    # warmup python workers
    tf.limit(1000).groupBy("term").count().count()

    out = os.path.join(workdir, f"post_{variant}_{cores}")
    t0 = time.time()
    if variant == "bucketgrp":
        from mysql2es_spark.operators.index import build_df_stats, term_bucket

        dfs = build_df_stats(tf)
        hot = dfs.filter(F.col("df") > cfg.salt_threshold).select("term")
        max_doc_id = n_files - 1
        span = max(1, (max_doc_id + 1 + cfg.n_salts - 1) // cfg.n_salts)
        with_salt = (
            tf.join(F.broadcast(hot.withColumn("_hot", F.lit(1))), "term",
                    "left")
            .withColumn(
                "salt",
                F.when(
                    F.col("_hot").isNotNull(),
                    (F.col("doc_id") / F.lit(span)).cast("int"),
                ).otherwise(F.lit(0)),
            )
            .withColumn("bucket", term_bucket(F.col("term"), cfg.n_buckets))
            .drop("_hot")
        )

        def encode_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            outs = [
                _encode_group(sub, cfg.block_size, cfg.chunk_span)
                for _, sub in pdf.groupby("term", sort=False)
            ]
            return pd.concat(outs) if outs else pdf.iloc[0:0]

        blocks = with_salt.groupBy("bucket", "salt").applyInPandas(
            encode_bucket, POSTING_SCHEMA
        )
    else:
        blocks = encode_postings(tf, cfg, max_doc_id=n_files - 1)
    (
        blocks.repartition("bucket")
        .sortWithinPartitions("term", "first_doc")
        .write.mode("overwrite").partitionBy("bucket").parquet(out)
    )
    dt = time.time() - t0
    rows = spark.read.parquet(out).count()
    print("WORKER_RESULT " + json.dumps(
        {"variant": variant, "cores": cores, "sec": round(dt, 2),
         "blocks": rows}))
    spark.stop()


def main() -> None:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        _worker(sys.argv[i + 1], sys.argv[i + 2], int(sys.argv[i + 3]))
        return

    def arg(name, default):
        return sys.argv[sys.argv.index(name) + 1] if name in sys.argv else default

    n_files = int(arg("--files", "100000"))
    reps = int(arg("--reps", "2"))
    only = arg("--variants", ",".join(VARIANTS)).split(",")
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    if shm and "SPARK_LOCAL_DIRS" not in os.environ:
        os.makedirs(os.path.join(shm, "spark_local"), exist_ok=True)
        os.environ["SPARK_LOCAL_DIRS"] = os.path.join(shm, "spark_local")
    os.environ["ENC_N_FILES"] = str(n_files)
    workdir = tempfile.mkdtemp(prefix="enc_scale_", dir=shm)
    import shutil

    try:
        # one-time: corpus -> fused tokenize -> tf spill (the encode input)
        sys.path.insert(0, "/root/repo")
        from mysql2es_spark.functions.analyze import tokenize_to_tf
        from mysql2es_spark.session import get_spark
        from mysql2es_spark.sources.corpus import generate_corpus

        from pyspark.sql import functions as F

        spark = get_spark(app_name="enc_gen", cores=32)
        corpus = generate_corpus(spark, n_files, partitions=64)
        # dense-enough fake ids (collisions harmless for a perf probe)
        with_ids = corpus.withColumn(
            "doc_id", F.pmod(F.xxhash64("repo", "path", "commit"),
                             F.lit(n_files)).cast("long")
        )
        tokenize_to_tf(with_ids).write.mode("overwrite").parquet(
            os.path.join(workdir, "tf")
        )
        spark.stop()

        results = []
        for rep in range(reps):
            for v in only:
                for c in (8, 32):
                    out = subprocess.run(
                        [sys.executable, os.path.abspath(__file__),
                         "--worker", workdir, v, str(c)],
                        capture_output=True, text=True, env=os.environ,
                    )
                    got = None
                    for line in out.stdout.splitlines():
                        if line.startswith("WORKER_RESULT "):
                            got = json.loads(line[14:])
                    if got is None:
                        print("WORKER FAILED", v, c,
                              out.stdout[-1500:], out.stderr[-1500:])
                        continue
                    got["rep"] = rep
                    results.append(got)
                    print(json.dumps(got), flush=True)
        summary = {}
        for v in only:
            lo = [r["sec"] for r in results if r["variant"] == v and r["cores"] == 8]
            hi = [r["sec"] for r in results if r["variant"] == v and r["cores"] == 32]
            if lo and hi:
                summary[v] = {
                    "t8_min": min(lo), "t32_min": min(hi),
                    "speedup": round(min(lo) / min(hi), 2),
                    "efficiency": round(min(lo) / min(hi) / 4, 3),
                }
        print("SUMMARY " + json.dumps(summary))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
