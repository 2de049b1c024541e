"""Stage-isolated measurements for the optimization round (guide §1).

NOT part of the driver contract — ``bench.py`` is frozen and stays the
measured artifact.  This harness exists to answer "where does the time
go" per operator: each stage is timed in isolation with the noop sink
(guide §1.4) and labeled via ``setJobDescription`` (§1.5), and plans
can be dumped with ``--plans`` into ``plans/r07/``.

Usage:
  python bench_extra.py [--sf DIR] [--files N] [--plans] [stage ...]

Stages (default: all):
  build       index_build end-to-end (as bench.py times it, min of 2)
  build_stages  id-map / tokenize-spill / docstore / postings in isolation
  bm25        the 8 bench queries
  phrase_src  phrase over the store-less index (source-join phase 2)
  tokstore    token-store build + store/source phrase A/B (20k slice)
  minhash     signature vs full candidate pipeline
  textstats   token_count+quality_score scan
  ann         build_ann_index + per-probe query timings
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

_SF_FILES = {"sf0.001": 1_000, "sf0.01": 10_000, "sf0.1": 100_000}
REPO = os.path.dirname(os.path.abspath(__file__))
PLANS_DIR = os.path.join(REPO, "plans", "r07")


def _shm() -> str | None:
    try:
        st = os.statvfs("/dev/shm")
        if st.f_bavail * st.f_frsize > 20 << 30:
            return "/dev/shm"
    except OSError:
        pass
    return None


_SHM = _shm()
if _SHM and "SPARK_LOCAL_DIRS" not in os.environ:
    os.makedirs(os.path.join(_SHM, "spark_local"), exist_ok=True)
    os.environ["SPARK_LOCAL_DIRS"] = os.path.join(_SHM, "spark_local")


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def timed(label, fn, spark=None, timings=None):
    if spark is not None:
        spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label:<40s} {dt:8.3f} s", flush=True)
    if timings is not None:
        timings[label] = round(dt, 3)
    if spark is not None:
        spark.sparkContext.setJobDescription(None)
    return out


def dump_plan(df, name: str, suffix: str) -> None:
    os.makedirs(PLANS_DIR, exist_ok=True)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(PLANS_DIR, f"{name}_{suffix}.txt"), "w") as f:
        f.write(txt)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    plans = "--plans" in sys.argv
    suffix = "after" if "--after" in sys.argv else "before"
    stages = set(args) if args else {
        "build", "bm25", "phrase_src", "tokstore", "minhash",
        "textstats", "ann",
    }

    n_files = int(os.environ.get(
        "SPARK_GRAFT_FILES",
        _SF_FILES.get(os.path.basename(SF_DIR.rstrip("/")), 100_000),
    ))
    os.sched_setaffinity(0, set(range(CPUS)))

    import dataclasses

    from pyspark.sql import functions as F

    from bench import BENCH_QUERIES, _cfg, ensure_corpus
    from mysql2es_spark.functions.analyze import (
        tokenize_code,
        tokenize_to_tf,
        tokenize_to_tf_sha,
    )
    from mysql2es_spark.functions.textstats import quality_score, token_count
    from mysql2es_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signature,
    )
    from mysql2es_spark.operators.index import build_doc_id_map
    from mysql2es_spark.plans.build import SearchIndex, full_build
    from mysql2es_spark.session import get_spark
    from mysql2es_spark.sources.corpus import with_doc_key

    import tempfile

    workdir = tempfile.mkdtemp(prefix="m2es_bx_", dir=_SHM)
    timings: dict[str, float] = {}
    try:
        ensure_corpus(workdir, n_files, CPUS)
        spark = get_spark(app_name="bench_extra", cores=CPUS)
        corpus = spark.read.parquet(os.path.join(workdir, "corpus"))
        # warmup python workers + page cache (mirrors bench.py)
        tokenize_to_tf(
            corpus.limit(1000).selectExpr("0L as doc_id", "content")
        ).count()
        corpus.selectExpr("sum(length(content))").collect()
        cfg = _cfg(n_files, CPUS)
        root = os.path.join(workdir, "idx")

        if "build" in stages or "build_stages" in stages:
            if "build_stages" in stages:
                keyed = with_doc_key(corpus).withColumn(
                    "version", F.lit(1).cast("long")
                )
                timed(
                    "idmap (build_doc_id_map + count)",
                    lambda: build_doc_id_map(
                        keyed.select("doc_key", "version"), 0, cfg,
                        carry=("version",), latest_by="version",
                    )[1],
                    spark, timings,
                )
                ids, _ = build_doc_id_map(
                    keyed.select("doc_key", "version"), 0, cfg,
                    carry=("version",), latest_by="version",
                )
                with_ids = keyed.join(F.broadcast(ids), ["doc_key", "version"])
                tok = tokenize_to_tf_sha(
                    with_ids, key_col="doc_id", key_type="long"
                )
                timed("tokenize_to_tf_sha -> noop", lambda: noop(tok),
                      spark, timings)
                if plans:
                    dump_plan(tok, "index_build_tokenize", suffix)
            best = None
            for i in range(2):
                shutil.rmtree(root, ignore_errors=True)
                t0 = time.time()
                spark.sparkContext.setJobDescription(f"full_build #{i}")
                full_build(spark, corpus, root, cfg, snapshot_id=1)
                dt = time.time() - t0
                print(f"  full_build #{i:<34d} {dt:8.3f} s", flush=True)
                best = dt if best is None else min(best, dt)
            timings["index_build"] = round(best, 3)
        else:
            if not os.path.exists(os.path.join(root, "CURRENT")):
                full_build(spark, corpus, root, cfg, snapshot_id=1)

        idx = SearchIndex(spark, root)

        if "bm25" in stages:
            # first query pays the dictionary-cache load; time it apart
            timed("bm25 first (dict load)",
                  lambda: idx.search(BENCH_QUERIES[0], k=20).collect(),
                  spark, timings)

            def all8():
                for q in BENCH_QUERIES:
                    idx.search(q, k=20).collect()

            timed("bm25_topk_x8", all8, spark, timings)
            timed("bm25_filtered",
                  lambda: idx.search(BENCH_QUERIES[0], k=20,
                                     lang="py").collect(),
                  spark, timings)
            if plans:
                dump_plan(idx.search(BENCH_QUERIES[0], k=20),
                          "bm25_topk", suffix)

        if "phrase_src" in stages:
            first_ts = corpus.orderBy("repo", "path").select(
                tokenize_code("content").alias("ts")
            ).first()["ts"]
            phrase = " ".join(first_ts[:2])
            # a DIFFERENT phrase for warmup so the timed query never
            # hits a lingering persist cache of an identical plan
            warm_phrase = " ".join(first_ts[2:4]) or "import return"
            print(f"  [phrase = {phrase!r} warmup = {warm_phrase!r}]")
            timed("phrase_src (warmup, other phrase)",
                  lambda: idx.search_phrase(
                      warm_phrase, corpus, k=20).collect(),
                  spark, timings)
            timed("phrase_src (timed)",
                  lambda: idx.search_phrase(phrase, corpus, k=20).collect(),
                  spark, timings)
            if plans:
                dump_plan(idx.search_phrase(phrase, corpus, k=20),
                          "phrase_topk", suffix)

        if "tokstore" in stages:
            frac_ts = max(1, n_files // 20_000)
            sl = corpus.filter(
                F.pmod(F.xxhash64("repo", "path", "commit"),
                       F.lit(frac_ts)) == 0
            )
            tcfg = dataclasses.replace(
                _cfg(max(n_files // frac_ts, 1), CPUS), token_store=True
            )
            troot = os.path.join(workdir, "tokidx")
            shutil.rmtree(troot, ignore_errors=True)
            timed("tokstore_build_20k",
                  lambda: full_build(spark, sl, troot, tcfg, snapshot_id=1),
                  spark, timings)
            sl_ts = sl.orderBy("repo", "path").select(
                tokenize_code("content").alias("ts")
            ).first()["ts"]
            sl_phrase = " ".join(sl_ts[:2])
            tidx = SearchIndex(spark, troot, tcfg)
            timed("phrase_store_20k",
                  lambda: tidx.search_phrase(sl_phrase, k=20).collect(),
                  spark, timings)
            if plans:
                dump_plan(tidx.search_phrase(sl_phrase, k=20),
                          "phrase_store", suffix)
            tsrc = SearchIndex(spark, troot, tcfg)
            tsrc._token_dir_cache = {"content": None}
            timed("phrase_source_20k",
                  lambda: tsrc.search_phrase(sl_phrase, sl, k=20).collect(),
                  spark, timings)

        if "minhash" in stages:
            frac = max(1, n_files // 20_000)
            sample = corpus.select(
                F.xxhash64("repo", "path", "commit").alias("did"), "content"
            ).filter(F.pmod(F.col("did"), F.lit(frac)) == 0)
            sig = minhash_signature(sample, "content", "did", k=32)
            timed("minhash_signature -> noop", lambda: noop(sig),
                  spark, timings)
            if plans:
                dump_plan(sig, "minhash_signature", suffix)

            def full():
                s = minhash_signature(sample, "content", "did", k=32)
                return minhash_lsh_candidates(s, "did", k=32, bands=8).filter(
                    F.col("est_jaccard") >= 0.8
                ).count()

            timed("minhash_dedup_20k (full)", full, spark, timings)

        if "textstats" in stages:
            def ts_scan():
                (
                    corpus.select(
                        token_count("content").alias("n"),
                        quality_score("content").alias("q"),
                    )
                    .agg(F.sum("n"), F.avg("q"))
                    .collect()
                )

            timed("textstats_scan", ts_scan, spark, timings)

        if "ann" in stages:
            import numpy as np

            from mysql2es_spark.operators.ann_index import (
                AnnIndex,
                build_ann_index,
            )

            path = os.path.join(SF_DIR, "embeddings.parquet")
            emb = spark.read.parquet(path).select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("emb"),
            )
            aroot = os.path.join(workdir, "ann")
            shutil.rmtree(aroot, ignore_errors=True)
            timed("ann_build",
                  lambda: build_ann_index(spark, emb, "emb", "vec_id", aroot),
                  spark, timings)
            aidx = AnnIndex(spark, aroot)
            pdf = emb.toPandas()
            V = np.stack(pdf["emb"].to_numpy())
            q = [float(x) for x in V[0]]
            timed("ann lsh_topk x12",
                  lambda: [aidx.lsh_topk(q, k=11).collect()
                           for _ in range(12)],
                  spark, timings)
            timed("ann cross_topk x12",
                  lambda: [aidx.cross_topk(q, k=11).collect()
                           for _ in range(12)],
                  spark, timings)
            timed("ann ivf_topk(np4) x12",
                  lambda: [aidx.ivf_topk(q, k=11, nprobe=4).collect()
                           for _ in range(12)],
                  spark, timings)
            if plans:
                dump_plan(aidx.cross_topk(q, k=11), "ann_cross_topk", suffix)

        print(json.dumps({"stage_timings": timings, "sf": SF_DIR,
                          "n_files": n_files, "cpus": CPUS}))
        spark.stop()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
