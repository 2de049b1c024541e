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
  python bench.py --scaling    N/4 vs N cores (the sandbox form of the
                               north rule's N-vs-4N cluster criterion):
                               each level runs PINNED (sched_setaffinity
                               before the JVM starts) in its own
                               subprocess, interleaved low/high twice
                               (this VM has noisy neighbors — min of 2
                               per level), plus a pure-CPU calibration
                               of the box's own scaling ceiling.
                               Prints the JSON line and appends it to
                               BENCH_scaling_runs.jsonl (BENCH.md is
                               curated by hand across windows).
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _fast_scratch() -> str | None:
    """Memory-backed scratch for shuffle/persist when available — the
    sandbox stand-in for cluster-local NVMe (this VM's single vdisk does
    ~220 MB/s, which would serialize shuffle-heavy stages)."""
    try:
        st = os.statvfs("/dev/shm")
        if st.f_bavail * st.f_frsize > 20 << 30:
            return "/dev/shm"
    except OSError:
        pass
    return None


_SHM = _fast_scratch()
if _SHM and "SPARK_LOCAL_DIRS" not in os.environ:
    os.makedirs(os.path.join(_SHM, "spark_local"), exist_ok=True)
    os.environ["SPARK_LOCAL_DIRS"] = os.path.join(_SHM, "spark_local")

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


def _cfg(n_files: int, cores: int):
    from mysql2es_spark.operators.index import IndexConfig

    return IndexConfig(
        n_buckets=32,
        block_size=128,
        salt_threshold=max(2000, n_files // 4),
        n_salts=8,
        id_partitions=64,
        chunk_span=max(1024, n_files // 64),
    )


def ensure_corpus(workdir: str, n_files: int, cores: int) -> str:
    from mysql2es_spark.session import get_spark
    from mysql2es_spark.sources.corpus import generate_corpus

    corpus_path = os.path.join(workdir, "corpus")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        spark = get_spark(app_name="bench_gen", cores=cores)
        generate_corpus(spark, n_files, partitions=max(cores * 2, 64)).write.mode(
            "overwrite"
        ).parquet(corpus_path)
        spark.stop()
    return corpus_path


def run_suite(cores: int, n_files: int, workdir: str,
              queries: bool = True) -> dict:
    """Build the index from pre-materialized corpus parquet (+ optionally
    query it).  Assumes affinity is already set by the caller."""
    from pyspark.sql import functions as F

    from mysql2es_spark.functions.analyze import tokenize_to_tf
    from mysql2es_spark.functions.textstats import quality_score, token_count
    from mysql2es_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signature,
    )
    from mysql2es_spark.plans.build import SearchIndex, full_build
    from mysql2es_spark.session import get_spark

    spark = get_spark(app_name=f"bench_c{cores}", cores=cores)
    timings: dict[str, float] = {}
    corpus_path = os.path.join(workdir, "corpus")
    corpus = spark.read.parquet(corpus_path)

    # warmup: python workers + page cache + codegen, outside the timings
    tokenize_to_tf(
        corpus.limit(1000).selectExpr("0L as doc_id", "content")
    ).count()
    corpus.selectExpr("sum(length(content))").collect()

    cfg = _cfg(n_files, cores)
    root = os.path.join(workdir, f"idx_c{cores}")

    # build twice, report the min: the first build inside a fresh JVM
    # pays JIT/codegen warmup that a long-running cluster job would not
    best = None
    for _ in range(2):
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.time()
        full_build(spark, corpus, root, cfg, snapshot_id=1)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    timings["index_build"] = best

    if queries:
        idx = SearchIndex(spark, root)
        t0 = time.time()
        for q in BENCH_QUERIES:
            idx.search(q, k=20).collect()
        timings["bm25_topk_x8"] = time.time() - t0

        t0 = time.time()
        idx.search(BENCH_QUERIES[0], k=20, lang="py").collect()
        timings["bm25_filtered"] = time.time() - t0

        # round-5 query surface: phrase (two-phase candidate+verify),
        # prefix (dictionary expansion), facets (terms agg on match set)
        from mysql2es_spark.functions.analyze import tokenize_code

        first_ts = corpus.orderBy("repo", "path").select(
            tokenize_code("content").alias("ts")
        ).first()["ts"]
        phrase = " ".join(first_ts[:2])
        t0 = time.time()
        idx.search_phrase(phrase, corpus, k=20).collect()
        timings["phrase_topk"] = time.time() - t0

        # r6 token-store A/B on a ~20k-file slice: the chunk-pruned
        # phrase phase 2 vs the full source join (VERDICT r5 #2) — the
        # headline index stays store-less so index_build remains
        # comparable round-over-round
        import dataclasses

        frac_ts = max(1, n_files // 20_000)
        sl = corpus.filter(
            F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(frac_ts)) == 0
        )
        tcfg = dataclasses.replace(_cfg(max(n_files // frac_ts, 1), cores),
                                   token_store=True)
        troot = os.path.join(workdir, f"tokidx_c{cores}")
        shutil.rmtree(troot, ignore_errors=True)
        t0 = time.time()
        full_build(spark, sl, troot, tcfg, snapshot_id=1)
        timings["tokstore_build_20k"] = time.time() - t0
        sl_ts = sl.orderBy("repo", "path").select(
            tokenize_code("content").alias("ts")
        ).first()["ts"]
        sl_phrase = " ".join(sl_ts[:2])
        tidx = SearchIndex(spark, troot, tcfg)
        t0 = time.time()
        tidx.search_phrase(sl_phrase, k=20).collect()
        timings["phrase_store_20k"] = time.time() - t0
        tidx_src = SearchIndex(spark, troot, tcfg)
        tidx_src._token_dir_cache = {"content": None}
        t0 = time.time()
        tidx_src.search_phrase(sl_phrase, sl, k=20).collect()
        timings["phrase_source_20k"] = time.time() - t0

        t0 = time.time()
        idx.search_prefix("pa", k=20).collect()
        timings["prefix_topk"] = time.time() - t0

        # r6 surface: bool (conjunctive + exclusion through pruned id
        # sets) and fuzzy (dictionary edit-distance expansion)
        t0 = time.time()
        idx.search_bool(
            must="import return", should="parse token",
            must_not="zzqqxx", k=20,
        ).collect()
        timings["bool_topk"] = time.time() - t0

        t0 = time.time()
        idx.search_fuzzy("imprt", fuzziness=1, k=20).collect()
        timings["fuzzy_topk"] = time.time() - t0

        t0 = time.time()
        idx.facets(BENCH_QUERIES[0], by=["lang", "repo"], top_n=10).collect()
        timings["facets_agg"] = time.time() - t0

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
        frac = max(1, n_files // 20_000)
        sample = corpus.select(
            F.xxhash64("repo", "path", "commit").alias("did"), "content"
        ).filter(F.pmod(F.col("did"), F.lit(frac)) == 0)
        sig = minhash_signature(sample, "content", "did", k=32)
        minhash_lsh_candidates(sig, "did", k=32, bands=8).filter(
            F.col("est_jaccard") >= 0.8
        ).count()
        timings["minhash_dedup_20k"] = time.time() - t0

        timings.update(_ann_recall(spark))

    spark.stop()
    return timings


def _ann_recall(spark, n_queries: int = 12) -> dict:
    """Recall@10 of the ANN operators through the MATERIALIZED layout
    (partitioned by lsh_bucket/ivf_cell; queries read only probed
    partitions — VERDICT r3 #1), vs numpy brute force on the driver's
    sf embeddings table, plus the IVF nprobe sweep (VERDICT r3 #7).

    These embeddings are near-random (top-10 cosines ~0.37), the worst
    case for ANY sublinear ANN — recall tracks the scanned fraction
    (reported alongside); on clustered real embeddings the same
    defaults prune far harder at high recall (tests/test_ann_index.py
    pins >= 0.9)."""
    import numpy as np
    from pyspark.sql import functions as F

    from mysql2es_spark.operators.ann_index import AnnIndex, build_ann_index

    path = os.path.join(SF_DIR, "embeddings.parquet")
    if not os.path.exists(path):
        return {}
    emb = spark.read.parquet(path).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    pdf = emb.toPandas()
    V = np.stack(pdf["emb"].to_numpy())
    ids = pdf["vec_id"].to_numpy()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    t0 = time.time()
    root = tempfile.mkdtemp(prefix="bench_ann_", dir=_SHM)
    try:
        build_ann_index(spark, emb, "emb", "vec_id", root)
        t_build = time.time() - t0
        idx = AnnIndex(spark, root)
        total_parts = len(idx.partition_paths())
        qids = ids[:: max(1, len(ids) // n_queries)][:n_queries]
        nprobes = (2, 4, 8)
        r_lsh, f_lsh = [], []
        r_cross, f_cross = [], []
        r_ivf = {np_: [] for np_ in nprobes}
        f_ivf = {np_: [] for np_ in nprobes}
        for qid in qids:
            qi = int(np.where(ids == qid)[0][0])
            sims = Vn @ Vn[qi]
            sims[qi] = -2
            true10 = set(ids[np.argsort(-sims)[:10]].tolist())
            q = [float(x) for x in V[qi]]
            got = [int(r["vec_id"])
                   for r in idx.lsh_topk(q, k=11).collect()
                   if int(r["vec_id"]) != int(qid)][:10]
            r_lsh.append(len(true10 & set(got)) / 10)
            f_lsh.append(
                len(idx.partition_paths(buckets=idx.lsh_probes(q)))
                / total_parts
            )
            # best-first leaf probing under an explicit scan budget
            # (the r5 recommended indexed path)
            got = [int(r["vec_id"])
                   for r in idx.cross_topk(q, k=11).collect()
                   if int(r["vec_id"]) != int(qid)][:10]
            r_cross.append(len(true10 & set(got)) / 10)
            f_cross.append(
                len(idx.cross_probe_paths(q)) / total_parts
            )
            for np_ in nprobes:
                got = [int(r["vec_id"])
                       for r in idx.ivf_topk(q, k=11, nprobe=np_).collect()
                       if int(r["vec_id"]) != int(qid)][:10]
                r_ivf[np_].append(len(true10 & set(got)) / 10)
                f_ivf[np_].append(
                    len(idx.partition_paths(cells=idx.ivf_probes(q, np_)))
                    / total_parts
                )
        out = {
            "ann_build": t_build,
            "ann_lsh_recall10": round(float(np.mean(r_lsh)), 3),
            "ann_cross_recall10": round(float(np.mean(r_cross)), 3),
            "ann_cross_scanfrac": round(float(np.mean(f_cross)), 3),
            "ann_lsh_scanfrac": round(float(np.mean(f_lsh)), 3),
            "ann_ivf_recall10": round(float(np.mean(r_ivf[4])), 3),
            "ann_ivf_scanfrac": round(float(np.mean(f_ivf[4])), 3),
        }
        for np_ in nprobes:
            out[f"ann_ivf_recall10_np{np_}"] = round(
                float(np.mean(r_ivf[np_])), 3
            )
            out[f"ann_ivf_scanfrac_np{np_}"] = round(
                float(np.mean(f_ivf[np_])), 3
            )
        out["ann_eval"] = time.time() - t0
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _burn(_arg):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 3:
        x += 1
    return x


def _calibrate_cpu(low: int, high: int) -> float:
    """Pure-CPU scaling ceiling of this box: total work done by `high`
    pinned busy loops vs `low`, normalized by the core ratio."""
    totals = {}
    for n in (low, high):
        with multiprocessing.Pool(n) as p:
            totals[n] = sum(p.map(_burn, range(n)))
    return (totals[high] / totals[low]) / (high / low)


def _stream(_arg):
    """Memory-bandwidth burn: sum over a 256 MB array for ~3 s."""
    import numpy as np

    a = np.random.default_rng(0).integers(0, 255, size=1 << 25, dtype=np.uint64)
    t0 = time.time()
    x = 0
    n = 0
    while time.time() - t0 < 3:
        x += int(a.sum())
        n += 1
    return n


def _calibrate_membw(low: int, high: int) -> float:
    """Memory-BANDWIDTH scaling ceiling: N processes each streaming a
    256 MB array.  A single VM shares one bandwidth domain across all
    cores; on bad days this collapses to ~0.25 (= no extra bandwidth at
    4x cores) while the pure-CPU busy-loop ceiling stays ~0.8 — the
    tokenize/shuffle stages track THIS ceiling, not the CPU one.  A real
    N-vs-4N executor cluster scales bandwidth with executors."""
    totals = {}
    for n in (low, high):
        with multiprocessing.Pool(n) as p:
            totals[n] = sum(p.map(_stream, range(n)))
    return (totals[high] / totals[low]) / (high / low)


def main() -> None:
    n_files = corpus_files()
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        cores, workdir = int(sys.argv[i + 1]), sys.argv[i + 2]
        os.sched_setaffinity(0, set(range(cores)))
        t = run_suite(cores, n_files, workdir, queries="--noqueries" not in sys.argv)
        print("WORKER_RESULT " + json.dumps(t))
        return

    scaling = "--scaling" in sys.argv
    workdir = tempfile.mkdtemp(prefix="m2es_bench_", dir=_SHM)
    try:
        result: dict = {"sf": SF_DIR, "n_files": n_files, "cpus": CPUS}
        if scaling:
            low = max(1, CPUS // 4)
            ensure_corpus(workdir, n_files, CPUS)
            runs: dict[int, list[dict]] = {low: [], CPUS: []}
            # interleave low/high twice: this VM's noisy neighbors make
            # single measurements unreliable; take the min per level
            for rep in range(2):
                for c in (low, CPUS):
                    out = subprocess.run(
                        [sys.executable, os.path.abspath(__file__),
                         "--worker", str(c), workdir]
                        + (["--noqueries"] if rep > 0 else []),
                        capture_output=True, text=True, env=os.environ,
                    )
                    for line in out.stdout.splitlines():
                        if line.startswith("WORKER_RESULT "):
                            runs[c].append(json.loads(line[14:]))
            t_low = {k: min(r[k] for r in runs[low] if k in r)
                     for k in runs[low][0]}
            t_high = {k: min(r[k] for r in runs[CPUS] if k in r)
                      for k in runs[CPUS][0]}
            thr_low = n_files / t_low["index_build"]
            thr_high = n_files / t_high["index_build"]
            eff = (t_low["index_build"] / t_high["index_build"]) / (CPUS / low)
            ceiling = _calibrate_cpu(low, CPUS)
            membw = _calibrate_membw(low, CPUS)
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
                        "cpu_ceiling": round(ceiling, 3),
                        "membw_ceiling": round(membw, 3),
                        "efficiency_vs_ceiling": round(eff / ceiling, 3)
                        if ceiling else None,
                        "efficiency_vs_membw": round(eff / membw, 3)
                        if membw else None,
                    },
                }
            )
            _append_scaling_log(result)
        else:
            os.sched_setaffinity(0, set(range(CPUS)))
            ensure_corpus(workdir, n_files, CPUS)
            t = run_suite(CPUS, n_files, workdir)
            result.update(
                {
                    "metric": "index_build_files_per_sec",
                    "value": round(n_files / t["index_build"], 2),
                    "unit": "files/sec",
                    "queries": {k: round(v, 3) for k, v in t.items()},
                }
            )
        print(json.dumps(result))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def _append_scaling_log(result: dict) -> None:
    """One JSON line per scaling window — BENCH.md itself is curated by
    hand so multi-window history and ceilings survive re-runs."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_scaling_runs.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
