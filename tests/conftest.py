import time

import pytest

from mysql2es_spark.operators.index import IndexConfig
from mysql2es_spark.plans.build import incremental_build
from mysql2es_spark.session import get_spark
from mysql2es_spark.sources.corpus import SnapshotLog, generate_corpus

# Small config that exercises every structural path at toy scale:
# salting (threshold 200 < df of hot keywords), chunking, bucketing.
TEST_CFG = IndexConfig(
    n_buckets=8, block_size=64, salt_threshold=200, n_salts=4,
    chunk_span=256, id_partitions=8,
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mysql2es_spark_tests", cores=8)
    yield s


@pytest.fixture(scope="session")
def fixture_index(spark, tmp_path_factory):
    """The FIXTURES.md §1 snapshot log: s1 = 800 docs, s2 = +150,
    s3 = +50 of which 10 update s1 logical files; incrementally indexed."""
    base = tmp_path_factory.mktemp("engine")
    log_root, idx_root = str(base / "log"), str(base / "index")
    log = SnapshotLog(log_root)
    now = int(time.time())
    log.append(generate_corpus(spark, 800, snap_ordinal=0), commit_ts=now - 300)
    incremental_build(spark, log, idx_root, TEST_CFG)
    log.append(
        generate_corpus(spark, 150, snap_ordinal=1, id_start=800),
        commit_ts=now - 200,
    )
    incremental_build(spark, log, idx_root, TEST_CFG)
    upd = generate_corpus(spark, 10, snap_ordinal=2, id_start=0)
    new = generate_corpus(spark, 40, snap_ordinal=2, id_start=950)
    log.append(upd.unionByName(new), commit_ts=now - 100)
    incremental_build(spark, log, idx_root, TEST_CFG)
    return {"log": log, "root": idx_root, "cfg": TEST_CFG}
