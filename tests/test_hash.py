"""Pin the pure-Python XXH64 to Spark's xxhash64 — the query-side
partition pruning depends on this parity."""

import random
import string

from pyspark.sql import functions as F

from mysql2es_spark.functions.hash import spark_xxhash64, term_bucket_py
from mysql2es_spark.operators.index import term_bucket


def test_xxh64_matches_spark(spark):
    random.seed(1)
    strs = (
        ["", "a", "import", "getUserName", "x" * 7, "y" * 8, "z" * 31,
         "w" * 32, "v" * 33, "q" * 100, "héllo wörld ünïcode ™", "日本語テキスト"]
        + ["".join(random.choices(string.printable, k=random.randint(0, 200)))
           for _ in range(100)]
    )
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    jvm = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    assert jvm == [spark_xxhash64(s) for s in strs]


def test_bucket_parity(spark):
    terms = ["import", "return", "def", "getUserName", "", "ünïcode"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    jvm = [r[0] for r in df.select(term_bucket(F.col("term"), 32)).collect()]
    assert jvm == [term_bucket_py(t, 32) for t in terms]
