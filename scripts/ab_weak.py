"""Interleaved A/B/C of the two `weak` bench rows (VERDICT r4 #1).

`textstats_scan` (1.95 -> 5.35 s) and `minhash_dedup_20k`
(48.8 -> 100.7 s) regressed >2x in the r4 driver bench while `git diff`
shows neither code path changed in r4.  Per the r2 precedent, a >2x
round-over-round delta gets an interleaved min-of-N A/B, not a shrug.

Variants are repo worktrees (r3 tip / r4 tip / current HEAD) sharing
one corpus parquet; each rep spawns one pinned subprocess per variant,
alternating A/B/C so VM weather hits all variants equally; pure-CPU
ceiling calibration before and after bounds the box's own swing.
Neither query touches the on-disk index, so no build phase is needed.

Usage:
  git worktree add /tmp/r3wt 36afaeb && git worktree add /tmp/r4wt b32572b
  python scripts/ab_weak.py --variants /tmp/r3wt,/tmp/r4wt,/root/repo \
      [--files 100000] [--reps 3]
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


def _worker(variant_dir: str, workdir: str, n_files: int) -> None:
    sys.path.insert(0, variant_dir)
    os.chdir(variant_dir)
    from pyspark.sql import functions as F

    from mysql2es_spark.functions.textstats import quality_score, token_count
    from mysql2es_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signature,
    )
    from mysql2es_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.sched_setaffinity(0, set(range(cores)))
    spark = get_spark(app_name="ab_weak", cores=cores)
    corpus = spark.read.parquet(os.path.join(workdir, "corpus"))

    # warmup: python workers + parquet footers + Arrow codegen
    corpus.limit(1000).select(token_count("content")).collect()
    corpus.selectExpr("sum(length(content))").collect()

    t: dict[str, float] = {}
    t0 = time.time()
    (
        corpus.select(
            token_count("content").alias("n"),
            quality_score("content").alias("q"),
        )
        .agg(F.sum("n"), F.avg("q"))
        .collect()
    )
    t["textstats_scan"] = time.time() - t0

    t0 = time.time()
    frac = max(1, n_files // 20_000)
    sample = corpus.select(
        F.xxhash64("repo", "path", "commit").alias("did"), "content"
    ).filter(F.pmod(F.col("did"), F.lit(frac)) == 0)
    sig = minhash_signature(sample, "content", "did", k=32)
    minhash_lsh_candidates(sig, "did", k=32, bands=8).filter(
        F.col("est_jaccard") >= 0.8
    ).count()
    t["minhash_dedup_20k"] = time.time() - t0
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


def _spawn(variant: str, workdir: str, n_files: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker",
         variant, workdir, str(n_files)],
        capture_output=True, text=True, env=os.environ,
    )
    for line in out.stdout.splitlines():
        if line.startswith("WORKER_RESULT "):
            return json.loads(line[14:])
    raise RuntimeError(
        f"worker failed for {variant}:\n{out.stdout[-2000:]}\n"
        f"{out.stderr[-2000:]}"
    )


def main() -> None:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        _worker(sys.argv[i + 1], sys.argv[i + 2], int(sys.argv[i + 3]))
        return

    def arg(name: str, default: str) -> str:
        return sys.argv[sys.argv.index(name) + 1] if name in sys.argv else default

    variants = arg("--variants", "/tmp/r3wt,/tmp/r4wt,/root/repo").split(",")
    n_files = int(arg("--files", "100000"))
    reps = int(arg("--reps", "3"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    if shm and "SPARK_LOCAL_DIRS" not in os.environ:
        os.makedirs(os.path.join(shm, "spark_local"), exist_ok=True)
        os.environ["SPARK_LOCAL_DIRS"] = os.path.join(shm, "spark_local")
    workdir = tempfile.mkdtemp(prefix="ab_weak_", dir=shm)
    try:
        sys.path.insert(0, variants[-1])
        from mysql2es_spark.session import get_spark
        from mysql2es_spark.sources.corpus import generate_corpus

        spark = get_spark(app_name="ab_gen", cores=cores)
        generate_corpus(spark, n_files, partitions=max(cores * 2, 64)) \
            .write.mode("overwrite").parquet(os.path.join(workdir, "corpus"))
        spark.stop()

        c0 = _ceiling(cores)
        runs: dict[str, list[dict]] = {v: [] for v in variants}
        for _ in range(reps):
            for v in variants:
                runs[v].append(_spawn(v, workdir, n_files))
        c1 = _ceiling(cores)

        result = {
            "variants": variants, "n_files": n_files, "reps": reps,
            "cores": cores,
            "min": {v: {k: round(min(r[k] for r in runs[v]), 3)
                        for k in runs[v][0]} for v in variants},
            "all": runs,
            "ceiling_before": round(c0, 3), "ceiling_after": round(c1, 3),
        }
        print(json.dumps(result))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
