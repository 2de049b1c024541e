#!/usr/bin/env python
"""spark-submit entry point for the index lifecycle.

Cluster usage (the north_rule ship-shape):

    python scripts/make_pyfiles.py                       # -> dist/mysql2es_spark.zip
    spark-submit --py-files dist/mysql2es_spark.zip \\
        scripts/build_index_job.py sync \\
        --log-root  /mnt/shared/corpus_log \\
        --index-root /mnt/shared/index \\
        --buckets 4096 --id-partitions 4096

Index/log roots are location-transparent: plain paths and file:// use
os-backed IO; hdfs:// / s3a:// roots route manifest/marker/tombstone
bookkeeping through the Hadoop FileSystem API (``mysql2es_spark.sources.fs``).

Subcommands mirror the reference daemon's modes (README-EN.org:46-49,
71-77): ``full`` (bootstrap), ``sync`` (incremental), ``compensate``
(late-data window), ``compact``, ``search`` (+ ``search-phrase``,
``search-prefix``, ``search-wildcard``, ``search-bool``,
``search-fuzzy``, ``mlt``, ``facets`` — the ES query surface the
reference's users get from the delegate), ``daemon`` (cron loop), and
the ``ann-*`` vector-layout lifecycle.

In local mode the same script runs as ``python scripts/build_index_job.py
... --cores 32``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# allow `python scripts/build_index_job.py` straight from a checkout;
# under spark-submit --py-files the package comes from the zip instead
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_repo_root, "mysql2es_spark")):
    sys.path.insert(0, _repo_root)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="build_index_job")
    ap.add_argument("mode", choices=[
        "full", "sync", "compensate", "compact", "search",
        "search-phrase", "search-phrase-prefix", "search-prefix",
        "search-wildcard",
        "search-bool", "search-fuzzy", "mlt", "highlight", "facets",
        "daemon",
        "ann-build", "ann-search", "ann-upsert", "ann-delete",
        "ann-compact",
    ])
    ap.add_argument("--log-root", help="snapshot-log root (corpus source)")
    ap.add_argument("--index-root", required=True)
    ap.add_argument("--cores", type=int, default=None,
                    help="local[N]; omit under spark-submit on a cluster")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--salt-threshold", type=int, default=50_000)
    ap.add_argument("--n-salts", type=int, default=8)
    ap.add_argument("--id-partitions", type=int, default=32)
    ap.add_argument("--chunk-span", type=int, default=8192)
    ap.add_argument("--compensate-second", type=int, default=300)
    ap.add_argument("--begin-interval-second", type=int, default=1200)
    ap.add_argument("--cron", default="0 * * * * *")
    ap.add_argument("--query", help="search mode: query text")
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--lang")
    ap.add_argument("--repo")
    ap.add_argument("--exact", action="store_true")
    ap.add_argument("--field", help="search mode: analyzed text field of "
                                    "a multi-field index")
    ap.add_argument("--where", help="search mode: arbitrary doc-store "
                                    "SQL predicate")
    ap.add_argument("--template-bucket",
                    help="search mode: physically-routed time bucket")
    ap.add_argument("--version-column",
                    help="full/sync: user-declared id-/time-typed version "
                         "column (default: snapshot id)")
    ap.add_argument("--min-tombstone-ratio", type=float, default=None,
                    help="compact: tiered mode — only merge segments at "
                         "or above this tombstone ratio")
    ap.add_argument("--max-segments", type=int, default=None,
                    help="compact: tiered mode — bound the post-compact "
                         "segment count")
    ap.add_argument("--vectors",
                    help="ann-build: parquet of (vec-id-col, vec-col) rows")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--vec-id-col", default="vec_id")
    ap.add_argument("--nbits", type=int, default=6)
    ap.add_argument("--n-centroids", type=int, default=16)
    ap.add_argument("--query-vec",
                    help="ann-search: JSON array of floats")
    ap.add_argument("--ann-mode", choices=["lsh", "ivf", "cross"],
                    default="cross")
    ap.add_argument("--multiprobe", type=int, default=2)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--scan-fraction", type=float, default=0.35,
                    help="ann-search cross mode: leaf-probe budget")
    ap.add_argument("--delete-ids",
                    help="ann-delete: JSON array of vector ids")
    ap.add_argument("--max-ticks", type=int, default=0,
                    help="daemon mode: stop after N ticks (0 = forever)")
    ap.add_argument("--max-expansions", type=int, default=50,
                    help="search-prefix mode: dictionary expansion cap "
                         "(ES prefix-rewrite size)")
    ap.add_argument("--must", help="search-bool: required clause text")
    ap.add_argument("--should", help="search-bool: optional scoring clause")
    ap.add_argument("--must-not", help="search-bool: exclusion clause")
    ap.add_argument("--must-boost", type=float, default=1.0)
    ap.add_argument("--should-boost", type=float, default=1.0)
    ap.add_argument("--msm", type=int, default=0,
                    help="search-bool: minimum_should_match")
    ap.add_argument("--highlight-window", type=int, default=5,
                    help="highlight: tokens either side of the first "
                         "matched term")
    ap.add_argument("--fuzziness", type=int, default=1,
                    help="search-fuzzy: max edit distance (0-2)")
    ap.add_argument("--prefix-length", type=int, default=0,
                    help="search-fuzzy: exact-match leading chars")
    ap.add_argument("--mlt-doc-id", type=int, default=None,
                    help="mlt: seed by indexed doc id (token store or "
                         "--log-root source fetch); else --query is the "
                         "seed text")
    ap.add_argument("--mlt-max-terms", type=int, default=25)
    ap.add_argument("--token-store", action="store_true",
                    help="full/sync: also write the chunk-partitioned "
                         "token store (phrase/MLT-by-id read candidate "
                         "chunks instead of the source corpus)")
    ap.add_argument("--facet-by", default="lang",
                    help="facets mode: comma-separated doc-store columns")
    ap.add_argument("--top-n", type=int, default=None,
                    help="facets mode: per-facet bucket cap (ES agg size)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from mysql2es_spark.operators.index import IndexConfig
    from mysql2es_spark.plans.build import (
        SearchIndex, compact, compensate, full_build, incremental_build,
    )
    from mysql2es_spark.sources.corpus import SnapshotLog

    if args.cores:
        from mysql2es_spark.session import get_spark

        spark = get_spark(app_name=f"m2es_{args.mode}", cores=args.cores)
    else:
        # under spark-submit the session config comes from the cluster
        spark = SparkSession.builder.appName(f"m2es_{args.mode}").getOrCreate()

    cfg = IndexConfig(
        n_buckets=args.buckets,
        block_size=args.block_size,
        salt_threshold=args.salt_threshold,
        n_salts=args.n_salts,
        id_partitions=args.id_partitions,
        chunk_span=args.chunk_span,
        token_store=args.token_store,
    )

    if args.mode == "search":
        idx = SearchIndex(spark, args.index_root, cfg)
        rows = idx.search(
            args.query or "", k=args.k, lang=args.lang, repo=args.repo,
            exact=args.exact, where=args.where, field=args.field,
            template_bucket=args.template_bucket,
        ).collect()
        for r in rows:
            print(json.dumps(
                {"doc_key": r["doc_key"], "score": r["score"],
                 "repo": r["repo"], "path": r["path"], "lang": r["lang"]}
            ))
        return 0

    if args.mode == "search-phrase":
        # token-store indexes verify adjacency from their own pruned
        # chunk reads; store-less indexes need the snapshot-log source
        # (the index is content-free)
        idx = SearchIndex(spark, args.index_root, cfg)
        src = (SnapshotLog(args.log_root).read_all(spark)
               if args.log_root else None)
        rows = idx.search_phrase(
            args.query or "", src, k=args.k, lang=args.lang,
            repo=args.repo, where=args.where, field=args.field,
        ).collect()
        for r in rows:
            print(json.dumps(
                {"doc_key": r["doc_key"], "score": r["score"],
                 "repo": r["repo"], "path": r["path"], "lang": r["lang"]}
            ))
        return 0

    if args.mode == "search-phrase-prefix":
        idx = SearchIndex(spark, args.index_root, cfg)
        src = (SnapshotLog(args.log_root).read_all(spark)
               if args.log_root else None)
        rows = idx.search_phrase_prefix(
            args.query or "", src, k=args.k, lang=args.lang,
            repo=args.repo, where=args.where, field=args.field,
            max_expansions=args.max_expansions,
        ).collect()
        for r in rows:
            print(json.dumps(
                {"doc_key": r["doc_key"], "score": r["score"],
                 "repo": r["repo"], "path": r["path"], "lang": r["lang"]}
            ))
        return 0

    if args.mode == "search-prefix":
        idx = SearchIndex(spark, args.index_root, cfg)
        rows = idx.search_prefix(
            args.query or "", k=args.k, lang=args.lang, repo=args.repo,
            exact=args.exact, where=args.where, field=args.field,
            template_bucket=args.template_bucket,
            max_expansions=args.max_expansions,
        ).collect()
        for r in rows:
            print(json.dumps(
                {"doc_key": r["doc_key"], "score": r["score"],
                 "repo": r["repo"], "path": r["path"], "lang": r["lang"]}
            ))
        return 0

    if args.mode == "search-wildcard":
        idx = SearchIndex(spark, args.index_root, cfg)
        rows = idx.search_wildcard(
            args.query or "", k=args.k, lang=args.lang, repo=args.repo,
            exact=args.exact, where=args.where, field=args.field,
            template_bucket=args.template_bucket,
            max_expansions=args.max_expansions,
        ).collect()
        for r in rows:
            print(json.dumps(
                {"doc_key": r["doc_key"], "score": r["score"],
                 "repo": r["repo"], "path": r["path"], "lang": r["lang"]}
            ))
        return 0

    if args.mode == "search-bool":
        idx = SearchIndex(spark, args.index_root, cfg)
        rows = idx.search_bool(
            must=args.must, should=args.should, must_not=args.must_not,
            must_boost=args.must_boost, should_boost=args.should_boost,
            minimum_should_match=args.msm,
            k=args.k, lang=args.lang, repo=args.repo, exact=args.exact,
            where=args.where, field=args.field,
            template_bucket=args.template_bucket,
        ).collect()
        for r in rows:
            print(json.dumps(
                {"doc_key": r["doc_key"], "score": r["score"],
                 "repo": r["repo"], "path": r["path"], "lang": r["lang"]}
            ))
        return 0

    if args.mode == "search-fuzzy":
        idx = SearchIndex(spark, args.index_root, cfg)
        rows = idx.search_fuzzy(
            args.query or "", fuzziness=args.fuzziness, k=args.k,
            lang=args.lang, repo=args.repo, exact=args.exact,
            where=args.where, field=args.field,
            template_bucket=args.template_bucket,
            max_expansions=args.max_expansions,
            prefix_length=args.prefix_length,
        ).collect()
        for r in rows:
            print(json.dumps(
                {"doc_key": r["doc_key"], "score": r["score"],
                 "repo": r["repo"], "path": r["path"], "lang": r["lang"]}
            ))
        return 0

    if args.mode == "mlt":
        idx = SearchIndex(spark, args.index_root, cfg)
        src = (SnapshotLog(args.log_root).read_all(spark)
               if args.log_root else None)
        rows = idx.more_like_this(
            args.query if args.mlt_doc_id is None else None,
            doc_id=args.mlt_doc_id, source_df=src,
            max_query_terms=args.mlt_max_terms, k=args.k,
            lang=args.lang, repo=args.repo, exact=args.exact,
            where=args.where, field=args.field,
            template_bucket=args.template_bucket,
        ).collect()
        for r in rows:
            print(json.dumps(
                {"doc_key": r["doc_key"], "score": r["score"],
                 "repo": r["repo"], "path": r["path"], "lang": r["lang"]}
            ))
        return 0

    if args.mode == "highlight":
        idx = SearchIndex(spark, args.index_root, cfg)
        src = (SnapshotLog(args.log_root).read_all(spark)
               if args.log_root else None)
        rows = idx.highlight(
            args.query or "", k=args.k, window=args.highlight_window,
            source_df=src, lang=args.lang, repo=args.repo,
            where=args.where, field=args.field,
            template_bucket=args.template_bucket,
        ).collect()
        for r in rows:
            print(json.dumps(
                {"path": r["path"], "score": r["score"],
                 "matched": r["matched"], "snippet": r["snippet"]}
            ))
        return 0

    if args.mode == "facets":
        idx = SearchIndex(spark, args.index_root, cfg)
        rows = idx.facets(
            args.query or "", by=args.facet_by.split(","),
            lang=args.lang, repo=args.repo, where=args.where,
            field=args.field, top_n=args.top_n,
        ).collect()
        for r in rows:
            print(json.dumps(
                {"facet": r["facet"], "value": r["value"], "cnt": r["cnt"]}
            ))
        return 0

    if args.mode == "compact":
        m = compact(spark, args.index_root, cfg,
                    min_tombstone_ratio=args.min_tombstone_ratio,
                    max_segments=args.max_segments)
        print(json.dumps({"version": m.version, "n_docs": m.n_docs_total,
                          "n_segments": len(m.segments)}))
        return 0

    if args.mode == "ann-build":
        from mysql2es_spark.operators.ann_index import build_ann_index

        if not args.vectors:
            ap.error("--vectors required for ann-build")
        from pyspark.sql import functions as F

        vecs = spark.read.parquet(args.vectors).select(
            F.col(args.vec_id_col),
            F.col(args.vec_col).cast("array<double>").alias(args.vec_col),
        )
        meta = build_ann_index(
            spark, vecs, args.vec_col, args.vec_id_col, args.index_root,
            nbits=args.nbits, n_centroids=args.n_centroids,
        )
        print(json.dumps({"dim": meta["dim"], "nbits": meta["nbits"],
                          "n_centroids": meta["n_centroids"]}))
        return 0

    if args.mode == "ann-search":
        from mysql2es_spark.operators.ann_index import AnnIndex

        if not args.query_vec:
            ap.error("--query-vec required for ann-search")
        qv = [float(x) for x in json.loads(args.query_vec)]
        idx = AnnIndex(spark, args.index_root)
        if args.ann_mode == "lsh":
            top = idx.lsh_topk(qv, k=args.k, multiprobe=args.multiprobe)
        elif args.ann_mode == "ivf":
            top = idx.ivf_topk(qv, k=args.k, nprobe=args.nprobe)
        else:
            top = idx.cross_topk(qv, k=args.k,
                                 scan_fraction=args.scan_fraction)
        for r in top.collect():
            print(json.dumps({"id": r[0], "cosine": r["cosine"]}))
        return 0

    if args.mode == "ann-upsert":
        from mysql2es_spark.operators.ann_index import upsert_ann_index

        if not args.vectors:
            ap.error("--vectors required for ann-upsert")
        from pyspark.sql import functions as F

        vecs = spark.read.parquet(args.vectors).select(
            F.col(args.vec_id_col),
            F.col(args.vec_col).cast("array<double>").alias(args.vec_col),
        )
        meta = upsert_ann_index(spark, vecs, args.index_root)
        print(json.dumps({"gen": meta.get("gen")}))
        return 0

    if args.mode == "ann-delete":
        from mysql2es_spark.operators.ann_index import delete_from_ann_index

        if not args.delete_ids:
            ap.error("--delete-ids required for ann-delete")
        meta = delete_from_ann_index(
            spark, args.index_root,
            [int(i) for i in json.loads(args.delete_ids)],
        )
        print(json.dumps({"deleted_at_gen": meta.get("gen", 1)}))
        return 0

    if args.mode == "ann-compact":
        from mysql2es_spark.operators.ann_index import compact_ann_index

        meta = compact_ann_index(spark, args.index_root)
        print(json.dumps({"data_dir": meta["data_dir"]}))
        return 0

    if not args.log_root:
        ap.error(f"--log-root required for mode {args.mode}")
    log = SnapshotLog(args.log_root)

    if args.mode == "full":
        m = full_build(
            spark, log.read_all(spark), args.index_root, cfg,
            snapshot_id=log.current_snapshot_id(),
            version_column=args.version_column,
        )
    elif args.mode == "sync":
        m = incremental_build(spark, log, args.index_root, cfg,
                              version_column=args.version_column)
    elif args.mode == "compensate":
        m = compensate(
            spark, log, args.index_root, cfg,
            compensate_second=args.compensate_second,
            begin_interval_second=args.begin_interval_second,
        )
    else:  # daemon
        from mysql2es_spark.streaming.stream import SyncDaemon

        d = SyncDaemon(
            spark, log, args.index_root, cfg, cron=args.cron,
            compensate_second=args.compensate_second,
            begin_interval_second=args.begin_interval_second,
        )
        ticks = 0
        while args.max_ticks == 0 or ticks < args.max_ticks:
            d.tick(int(time.time()))
            ticks += 1
            time.sleep(1)
        m = SearchIndex(spark, args.index_root).manifest
    print(json.dumps({
        "version": m.version, "n_docs": m.n_docs_total,
        "last_snapshot_id": m.last_snapshot_id,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
