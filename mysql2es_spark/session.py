"""SparkSession factory with scale-appropriate defaults.

Local mode is a stand-in for a multi-executor cluster; every knob here is
chosen to behave identically on a 1000-executor cluster:

- AQE on (runtime coalesce + skew-join splitting),
- Arrow on (all Python stages are pandas/Arrow UDFs),
- shuffle partitions sized to cores locally; on a real cluster this is
  set to 2-3x total executor cores via ``spark-submit --conf``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "mysql2es_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a session.

    ``cores`` controls ``local[N]`` — the sandbox form of the cluster-size
    axis: the scaling bench runs the same job at ``local[8]`` and
    ``local[32]``.
    """
    n = cores or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch sizing (guide §4.2: lower it for wide rows): the
        # engine's Python stages carry whole documents (~10 KB rows),
        # so the 10k-row default makes ~100 MB batches — poor pipeline
        # overlap and high peak worker memory.  2048 (~20 MB batches)
        # measured the content-analysis stage 3.4-4.8 s -> 1.5-2.9 s
        # at 100k docs / 32 threads; override per deployment via
        # SPARK_GRAFT_ARROW_BATCH for narrow-row workloads.
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "2048"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # sandbox corpora are ~100s of MB; the 128 MB default packs them
        # into 2-4 input splits and caps scan parallelism below the core
        # count — 16 MB keeps scans wide here, and a real cluster run
        # overrides it back up via spark-submit --conf
        .config("spark.sql.files.maxPartitionBytes", "16m")
        # multi-path leaf reads (SearchIndex.postings / token_chunks,
        # AnnIndex probes) pass hundreds of pruned partition dirs per
        # query; above the default threshold (32 paths) Spark launches a
        # distributed LISTING JOB per read — pure scheduling overhead
        # when the driver's filesystem metadata calls are cheap (local
        # disk, HDFS NN).  Keep listing driver-side up to 64k paths;
        # object-store deployments where driver-side listing is the
        # bottleneck override via SPARK_GRAFT_LIST_PAR_THRESHOLD or
        # spark-submit --conf
        .config(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            os.environ.get("SPARK_GRAFT_LIST_PAR_THRESHOLD", "65536"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
