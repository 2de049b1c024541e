"""Interleaved A/B of the query path between two repo checkouts.

VERDICT r2 "What's wrong" #3: bm25_topk_x8 regressed 9.37 -> 11.21 s in
the driver bench while the search plan barely changed; the box's CPU
ceiling swung 0.30-0.81 in the same window, so the delta is plausibly VM
noise — but unproven.  This script proves it one way or the other with
the established methodology: same corpus parquet, each variant builds
its own index once (its own on-disk format), then query-timing
subprocesses alternate A/B/A/B (min-of-N per variant, one JVM each,
warmup inside), with a pure-CPU busy-loop calibration before and after.

Usage:
  git worktree add /tmp/r1wt <r1-commit>
  python scripts/ab_search.py --variant-a /tmp/r1wt --variant-b /root/repo \
      [--files 100000] [--reps 3]

Prints one JSON line: per-variant min timings + ceiling numbers.
"""

from __future__ import annotations

import json
import multiprocessing
import os
import shutil
import subprocess
import sys
import tempfile
import time

QUERIES = [
    "import getUserName",
    "parse token query merge",
    "import return class def",
    "hashNode treeClose",
    "load save batch sync checkpoint",
    "import import return",
    "scan byte path",
    "zzqqxx unknown import",
]


def _worker(variant_dir: str, workdir: str, n_files: int, phase: str) -> None:
    """Runs inside a subprocess with the variant's repo on sys.path."""
    sys.path.insert(0, variant_dir)
    os.chdir(variant_dir)
    from pyspark.sql import functions as F

    from mysql2es_spark.functions.textstats import quality_score, token_count
    from mysql2es_spark.operators.index import IndexConfig
    from mysql2es_spark.plans.build import SearchIndex, full_build
    from mysql2es_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.sched_setaffinity(0, set(range(cores)))
    spark = get_spark(app_name=f"ab_{phase}", cores=cores)
    corpus = spark.read.parquet(os.path.join(workdir, "corpus"))
    cfg = IndexConfig(
        n_buckets=32, block_size=128,
        salt_threshold=max(2000, n_files // 4), n_salts=8,
        id_partitions=64, chunk_span=max(1024, n_files // 64),
    )
    tag = os.path.basename(variant_dir.rstrip("/"))
    root = os.path.join(workdir, f"idx_{tag}")

    if phase == "build":
        t0 = time.time()
        if not os.path.exists(os.path.join(root, "CURRENT")):
            full_build(spark, corpus, root, cfg, snapshot_id=1)
        print("WORKER_RESULT " + json.dumps(
            {"build_sec": round(time.time() - t0, 2)}))
        spark.stop()
        return

    idx = SearchIndex(spark, root)
    # warmup: python workers + parquet footers + codegen
    idx.search(QUERIES[0], k=20).collect()
    corpus.limit(100).select(token_count("content")).collect()

    t: dict[str, float] = {}
    t0 = time.time()
    for q in QUERIES:
        idx.search(q, k=20).collect()
    t["bm25_topk_x8"] = time.time() - t0
    t0 = time.time()
    idx.search(QUERIES[0], k=20, lang="py").collect()
    t["bm25_filtered"] = time.time() - t0
    t0 = time.time()
    (
        corpus.select(
            token_count("content").alias("n"),
            quality_score("content").alias("q"),
        ).agg(F.sum("n"), F.avg("q")).collect()
    )
    t["textstats_scan"] = time.time() - t0
    print("WORKER_RESULT " + json.dumps(t))
    spark.stop()


def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 3:
        x += 1
    return x


def _ceiling(cores: int) -> float:
    lo = max(1, cores // 4)
    totals = {}
    for n in (lo, cores):
        with multiprocessing.Pool(n) as p:
            totals[n] = sum(p.map(_burn, range(n)))
    return (totals[cores] / totals[lo]) / (cores / lo)


def _spawn(variant: str, workdir: str, n_files: int, phase: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker",
         variant, workdir, str(n_files), phase],
        capture_output=True, text=True, env=os.environ,
    )
    for line in out.stdout.splitlines():
        if line.startswith("WORKER_RESULT "):
            return json.loads(line[14:])
    raise RuntimeError(
        f"worker failed for {variant} {phase}:\n{out.stdout[-2000:]}\n"
        f"{out.stderr[-2000:]}"
    )


def main() -> None:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        _worker(sys.argv[i + 1], sys.argv[i + 2], int(sys.argv[i + 3]),
                sys.argv[i + 4])
        return

    def arg(name: str, default: str) -> str:
        return sys.argv[sys.argv.index(name) + 1] if name in sys.argv else default

    va = arg("--variant-a", "/tmp/r1wt")
    vb = arg("--variant-b", "/root/repo")
    n_files = int(arg("--files", "100000"))
    reps = int(arg("--reps", "3"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    if shm and "SPARK_LOCAL_DIRS" not in os.environ:
        os.makedirs(os.path.join(shm, "spark_local"), exist_ok=True)
        os.environ["SPARK_LOCAL_DIRS"] = os.path.join(shm, "spark_local")
    workdir = tempfile.mkdtemp(prefix="ab_search_", dir=shm)
    try:
        # shared corpus, generated with variant B's generator (both rounds
        # generate identical corpora by seed, but one writer removes doubt)
        sys.path.insert(0, vb)
        from mysql2es_spark.session import get_spark
        from mysql2es_spark.sources.corpus import generate_corpus

        spark = get_spark(app_name="ab_gen", cores=cores)
        generate_corpus(spark, n_files, partitions=max(cores * 2, 64)) \
            .write.mode("overwrite").parquet(os.path.join(workdir, "corpus"))
        spark.stop()

        c0 = _ceiling(cores)
        for v in (va, vb):
            _spawn(v, workdir, n_files, "build")
        runs: dict[str, list[dict]] = {va: [], vb: []}
        for _ in range(reps):
            for v in (va, vb):
                runs[v].append(_spawn(v, workdir, n_files, "query"))
        c1 = _ceiling(cores)

        def best(v: str) -> dict:
            return {k: round(min(r[k] for r in runs[v]), 3)
                    for k in runs[v][0]}

        result = {
            "variant_a": va, "variant_b": vb, "n_files": n_files,
            "reps": reps, "cores": cores,
            "a_min": best(va), "b_min": best(vb),
            "a_all": runs[va], "b_all": runs[vb],
            "ceiling_before": round(c0, 3), "ceiling_after": round(c1, 3),
        }
        print(json.dumps(result))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
