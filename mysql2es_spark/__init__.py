"""mysql2es_spark — a PySpark-native inverted-index build + BM25 top-k
query engine with the query/data-processing capabilities of
liuanxin/mysql2es (reference at /root/reference, README-EN.org).

The reference is a MySQL -> Elasticsearch incremental synchronizer that
*delegates* tokenization, inverted indexing, BM25 scoring and top-k to
Elasticsearch (README-EN.org:238-241, 186-187).  This package implements
those natively on Spark DataFrames:

- ``functions.analyze``   code-aware tokenizer (normalizer parity with the
                          reference's trim+lowercase, README-EN.org:190-196)
- ``operators.index``     tf/df aggregation, hot-term salting, delta+varint
                          posting encoding, term-bucketed segments
- ``operators.search``    exact score-all BM25 and block-max WAND top-k
- ``operators.project``   the reference's projection surface (rename map,
                          camelCase, ignore-column, id synthesis,
                          template bucketing; README-EN.org:111-136)
- ``operators.assemble``  relation-mapping / nested-mapping document
                          assembly (README-EN.org:145-159)
- ``operators.upsert``    version-guarded idempotent upsert
                          (README-EN.org:78-79)
- ``sources.corpus``      Iceberg-style snapshot-log corpus source +
                          incremental reads (README-EN.org:46-49 sync loop)
- ``sources.checkpoint``  per-partition lineage + resumable checkpoints
                          (README-EN.org:48-49, 65-66)
- ``plans.build``         full/incremental/compensation build orchestration
                          (README-EN.org:71-77)
- ``operators.dedup`` / ``operators.similarity`` / ``functions.textstats``
                          training-data pipeline operators (dedup, ANN,
                          text quality) beyond the reference surface.

Everything is DataFrame-first; Python touches data only through
vectorized pandas/Arrow UDFs (no per-row Python UDFs anywhere).
"""

__version__ = "0.1.0"
