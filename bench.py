"""Benchmark harness (driver contract: prints ONE JSON line).

Measures the engine's headline metric — index-build throughput
(files/sec) on the synthesized source-code corpus (BASELINE.json) —
plus query latency (block-max BM25 top-20 over the built index) and the
training-data pipeline operators at scale.

Env:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1);
                       also sets corpus size: sf0.1 -> 100k files
  SPARK_GRAFT_CPUS     local[N] (default 32)
  SPARK_GRAFT_FILES    override corpus file count

Modes:
  python bench.py              one timed run, one JSON line
  python bench.py --scaling    same build at local[N/4] and local[N]
                               (the sandbox form of the north rule's
                               N-vs-4N cluster-size criterion); prints
                               the JSON line with scaling fields and
                               rewrites BENCH.md
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

_SF_FILES = {"sf0.001": 1_000, "sf0.01": 10_000, "sf0.1": 100_000}


def corpus_files() -> int:
    if "SPARK_GRAFT_FILES" in os.environ:
        return int(os.environ["SPARK_GRAFT_FILES"])
    tag = os.path.basename(SF_DIR.rstrip("/"))
    return _SF_FILES.get(tag, 100_000)


BENCH_QUERIES = [
    "import getUserName",
    "parse token query merge",
    "import return class def",
    "hashNode treeClose",
    "load save batch sync checkpoint",
    "import import return",
    "scan byte path",
    "zzqqxx unknown import",
]


def run_suite(cores: int, n_files: int, workdir: str) -> dict:
    """Build the index from pre-materialized corpus parquet and query it.
    Returns per-phase seconds + derived throughputs."""
    from pyspark.sql import functions as F

    from mysql2es_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signature,
    )
    from mysql2es_spark.functions.textstats import quality_score, token_count
    from mysql2es_spark.operators.index import IndexConfig
    from mysql2es_spark.plans.build import SearchIndex, full_build
    from mysql2es_spark.session import get_spark
    from mysql2es_spark.sources.corpus import generate_corpus

    spark = get_spark(app_name=f"bench_c{cores}", cores=cores)
    timings: dict[str, float] = {}

    corpus_path = os.path.join(workdir, "corpus")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        generate_corpus(spark, n_files, partitions=max(cores * 2, 8)).write.mode(
            "overwrite"
        ).parquet(corpus_path)

    cfg = IndexConfig(
        n_buckets=32,
        block_size=128,
        salt_threshold=max(2000, n_files // 4),
        n_salts=8,
        id_partitions=32,
        chunk_span=max(1024, n_files // (cores * 4)),
    )
    root = os.path.join(workdir, f"idx_c{cores}")
    shutil.rmtree(root, ignore_errors=True)

    t0 = time.time()
    corpus = spark.read.parquet(corpus_path)
    full_build(spark, corpus, root, cfg, snapshot_id=1)
    timings["index_build"] = time.time() - t0

    idx = SearchIndex(spark, root)
    t0 = time.time()
    for q in BENCH_QUERIES:
        idx.search(q, k=20).collect()
    timings["bm25_topk_x8"] = time.time() - t0

    t0 = time.time()
    idx.search(BENCH_QUERIES[0], k=20, lang="py").collect()
    timings["bm25_filtered"] = time.time() - t0

    t0 = time.time()
    (
        corpus.select(
            token_count("content").alias("n"),
            quality_score("content").alias("q"),
        )
        .agg(F.sum("n"), F.avg("q"))
        .collect()
    )
    timings["textstats_scan"] = time.time() - t0

    t0 = time.time()
    # deterministic ~20k-doc sample WITHOUT limit(): a global limit would
    # collapse the pipeline to one task; a hash-mod filter keeps the scan
    # fully parallel (measured: limit() made this stage 16x slower)
    frac = max(1, n_files // 20_000)
    sample = corpus.select(
        F.xxhash64("repo", "path", "commit").alias("did"), "content"
    ).filter(F.pmod(F.col("did"), F.lit(frac)) == 0)
    sig = minhash_signature(sample, "content", "did", k=32)
    minhash_lsh_candidates(sig, "did", k=32, bands=8).filter(
        F.col("est_jaccard") >= 0.8
    ).count()
    timings["minhash_dedup_20k"] = time.time() - t0

    spark.stop()
    return timings


def main() -> None:
    n_files = corpus_files()
    scaling = "--scaling" in sys.argv
    workdir = tempfile.mkdtemp(prefix="m2es_bench_")
    try:
        result: dict = {"sf": SF_DIR, "n_files": n_files, "cpus": CPUS}
        queries: dict[str, float] = {}
        if scaling:
            low = max(1, CPUS // 4)
            t_low = run_suite(low, n_files, workdir)
            t_high = run_suite(CPUS, n_files, workdir)
            thr_low = n_files / t_low["index_build"]
            thr_high = n_files / t_high["index_build"]
            eff = (t_low["index_build"] / t_high["index_build"]) / (CPUS / low)
            queries = {f"c{low}_{k}": round(v, 3) for k, v in t_low.items()}
            queries.update(
                {f"c{CPUS}_{k}": round(v, 3) for k, v in t_high.items()}
            )
            result.update(
                {
                    "metric": "index_build_files_per_sec",
                    "value": round(thr_high, 2),
                    "unit": "files/sec",
                    "queries": queries,
                    "scaling": {
                        "cores_low": low,
                        "cores_high": CPUS,
                        "files_per_sec_low": round(thr_low, 2),
                        "files_per_sec_high": round(thr_high, 2),
                        "efficiency": round(eff, 3),
                    },
                }
            )
            _write_bench_md(result)
        else:
            t = run_suite(CPUS, n_files, workdir)
            queries = {k: round(v, 3) for k, v in t.items()}
            result.update(
                {
                    "metric": "index_build_files_per_sec",
                    "value": round(n_files / t["index_build"], 2),
                    "unit": "files/sec",
                    "queries": queries,
                }
            )
        print(json.dumps(result))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def _write_bench_md(result: dict) -> None:
    s = result["scaling"]
    md = f"""# BENCH — measured numbers

Corpus: {result['n_files']} synthesized source files (deterministic,
seed=42), same input parquet for both runs.  Machine: local mode,
single JVM ({s['cores_low']} vs {s['cores_high']} executor threads — the
sandbox form of the north rule's N-vs-4N cluster-size criterion).

| cores | index build files/sec | build sec | 8-query BM25 sec |
| --- | --- | --- | --- |
| {s['cores_low']} | {s['files_per_sec_low']} | {result['queries'][f"c{s['cores_low']}_index_build"]} | {result['queries'][f"c{s['cores_low']}_bm25_topk_x8"]} |
| {s['cores_high']} | {s['files_per_sec_high']} | {result['queries'][f"c{s['cores_high']}_index_build"]} | {result['queries'][f"c{s['cores_high']}_bm25_topk_x8"]} |

**Scaling efficiency (build): {s['efficiency']}**  (target >= 0.8;
efficiency = (T_low / T_high) / (cores_high / cores_low))

Raw: `{json.dumps(result)}`
"""
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
