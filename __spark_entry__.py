"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: build a real inverted index over the
sf0.001 documents table (as the source-code corpus shape) and run a
block-max BM25 search through the full engine.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 plus the training-data pipeline operators.  Oracle
parity rules used throughout:

- both sides tokenize with the SQL-expressible simple tokenizer
  (lower + split on non-alphanumerics) so DuckDB can replicate,
- float aggregations either use exact decimal sums or a *sequential
  fold in a deterministic order* on both sides, then round(6),
- timestamps never cross raw (epoch seconds instead) — tz-safe.

Non-SQL-expressible ops (index build, minhash/simhash — xxhash64 has no
DuckDB twin, LSH ANN, media featurization) have queries() entries
without oracles -> driver records rows-only checks.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql2es_spark.functions.analyze import tokenize_simple
from mysql2es_spark.functions import textstats as TS
from mysql2es_spark.operators import dedup as DD
from mysql2es_spark.operators import multimodal as MM
from mysql2es_spark.operators import similarity as SIM
from mysql2es_spark.operators.assemble import nested_mapping, relation_mapping
from mysql2es_spark.operators.project import (
    camel_case_columns,
    ignore_columns,
    increment_filter,
    multi_format_timestamp,
    rename_columns,
    soft_delete_filter,
    synthesize_id,
    template_bucket,
)
from mysql2es_spark.operators.upsert import latest_by_version

SF_DEFAULT = "/root/testdata/sf0.001"

#: per-sf materialized ANN layout roots (built once per process)
_ANN_ROOTS: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Build an inverted index over the sf0.001 documents corpus and run
    a block-max BM25 top-20 — the full engine end to end."""
    from mysql2es_spark.operators.index import IndexConfig
    from mysql2es_spark.plans.build import SearchIndex, full_build

    docs = _t(spark, SF_DEFAULT, "documents")
    corpus = docs.select(
        F.concat(F.lit("src/"), F.col("source")).alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.sha2(F.col("text"), 256).substr(1, 12).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    root = tempfile.mkdtemp(prefix="m2es_entry_")
    cfg = IndexConfig(n_buckets=8, block_size=64, salt_threshold=300,
                      n_salts=4, chunk_span=512, id_partitions=8)
    full_build(spark, corpus, root, cfg, snapshot_id=1)
    return SearchIndex(spark, root).search("fast hash join query", k=20)


# ---------------------------------------------------------------------------
# shared fulltext scoring (simple tokenizer — SQL twin below)
# ---------------------------------------------------------------------------

_QUERY_TERMS = ["fast", "hash", "join"]
K1, B = 1.2, 0.75


def _doc_tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", "lang", "source", tokenize_simple("text").alias("ts")
    ).withColumn("dl", F.size("ts").cast("long"))


def _bm25_simple_topk(
    spark: SparkSession, sf_dir: str, terms: list[str], k: int,
    lang: str | None = None, where: str | None = None,
) -> DataFrame:
    """Exact BM25 top-k over `documents` with the simple tokenizer;
    stats (N, avgdl, df) over the FULL corpus, filter applied to
    candidates only (the engine's filtered-search semantics).  ``where``
    is an arbitrary SQL predicate over document fields — the engine's
    generalized doc-store filter.  Arithmetic mirrors the SQL oracle
    token for token."""
    docs = _t(spark, sf_dir, "documents")
    toks = _doc_tokens(docs)
    stats = toks.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    srow = stats.head()  # bind once: two head() calls = two identical agg jobs
    n_docs, avgdl = srow["n_docs"], srow["avgdl"]
    tf = (
        toks.select("doc_id", "dl", "lang", "source",
                    F.explode("ts").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "dl", "lang", "source", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.count("*").alias("df"))
    j = tf.join(F.broadcast(dfs), "term")
    if lang is not None:
        j = j.filter(F.col("lang") == lang)
    if where is not None:
        j = j.filter(F.expr(where))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tfn = (F.col("tf") * (F.lit(1.2) + F.lit(1.0))) / (
        F.col("tf")
        + F.lit(1.2)
        * (F.lit(1.0) - F.lit(0.75) + F.lit(0.75) * F.col("dl") / F.lit(float(avgdl)))
    )
    per_doc = (
        j.select("doc_id", "term", (idf * tfn).alias("p"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("term", "p"))).alias("ps"))
        .select(
            "doc_id",
            F.round(
                F.aggregate(F.col("ps"), F.lit(0.0), lambda a, x: a + x["p"]), 6
            ).alias("score"),
        )
    )
    return per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


_SQL_TOKS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
)


def _bm25_sql(terms: list[str], k: int, lang: str | None = None,
              where: str | None = None,
              expand_prefix: str | None = None,
              expand_where: str | None = None,
              expand_order: str | None = None,
              max_expansions: int = 50) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    lang_pred = f"AND lang = '{lang}'" if lang else ""
    if where:
        lang_pred += f" AND ({where})"
    if expand_prefix is not None:
        # ES prefix/wildcard rewrite: distinct matching terms, sorted,
        # first max_expansions — must mirror the Spark twin exactly.
        # A '%' anywhere in expand_prefix means the caller passed a
        # full LIKE pattern (wildcard query); otherwise prefix match.
        like = (expand_prefix if "%" in expand_prefix
                else f"{expand_prefix}%")
        exp_cte = f"""_exp AS (
  SELECT DISTINCT t AS term
  FROM (SELECT unnest(ts) AS t FROM toks)
  WHERE t LIKE '{like}' ORDER BY term LIMIT {max_expansions}
), """
        term_filter = "t IN (SELECT term FROM _exp)"
    elif expand_where is not None:
        # generalized expansion (fuzzy): arbitrary predicate + rank
        # order over the distinct token set — 't' is the term variable
        exp_cte = f"""_exp AS (
  SELECT t AS term
  FROM (SELECT DISTINCT t FROM (SELECT unnest(ts) AS t FROM toks))
  WHERE {expand_where}
  ORDER BY {expand_order or 't'} LIMIT {max_expansions}
), """
        term_filter = "t IN (SELECT term FROM _exp)"
    else:
        exp_cte = ""
        term_filter = f"t IN ({tlist})"
    return f"""
WITH toks AS (
  SELECT doc_id, lang, source, {_SQL_TOKS} AS ts FROM documents
), {exp_cte}dl AS (
  SELECT doc_id, lang, source, len(ts)::bigint AS dl FROM toks
), stats AS (
  SELECT count(*)::bigint AS n_docs, sum(dl)::double / count(*) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, t AS term, count(*)::bigint AS tf
  FROM (SELECT doc_id, unnest(ts) AS t FROM toks)
  WHERE {term_filter}
  GROUP BY doc_id, t
), dfs AS (
  SELECT term, count(*)::bigint AS df FROM tf GROUP BY term
), partial AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
         (tf.tf * (1.2 + 1.0)) /
         (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS p
  FROM tf
  JOIN dfs d USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  WHERE true {lang_pred}
), scores AS (
  SELECT doc_id, round(sum(p ORDER BY term), 6) AS score
  FROM partial GROUP BY doc_id
)
SELECT doc_id, score FROM scores ORDER BY score DESC, doc_id LIMIT {k}
"""


_BOOL_MUST = ["fast", "hash"]
_BOOL_SHOULD = ["join"]
_BOOL_NOT = ["table"]
_SHOULD_BOOST = 0.5


def _bool_simple_topk(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """ES bool-query twin over `documents` (engine analogue:
    SearchIndex.search_bool): docs must contain EVERY must term and
    NONE of the must_not terms; score = sum over must+should terms of
    clause_boost * idf * tfnorm.  df/N/avgdl over the FULL corpus (the
    engine's dictionary semantics); fold/round identical to
    _bm25_simple_topk so the DuckDB twin hashes equal."""
    docs = _t(spark, sf_dir, "documents")
    toks = _doc_tokens(docs)
    srow = toks.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    ).head()
    n_docs, avgdl = srow["n_docs"], srow["avgdl"]
    scoring = sorted(set(_BOOL_MUST) | set(_BOOL_SHOULD))
    tf = (
        toks.select("doc_id", "dl", F.explode("ts").alias("term"))
        .filter(F.col("term").isin(scoring + _BOOL_NOT))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = (
        tf.filter(F.col("term").isin(scoring))
        .groupBy("term").agg(F.count("*").alias("df"))
    )
    cand = (
        tf.filter(F.col("term").isin(_BOOL_MUST))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("_nt"))
        .filter(F.col("_nt") == len(set(_BOOL_MUST)))
        .select("doc_id")
    )
    nots = (
        tf.filter(F.col("term").isin(_BOOL_NOT)).select("doc_id").distinct()
    )
    j = (
        tf.filter(F.col("term").isin(scoring))
        .join(F.broadcast(dfs), "term")
        .join(cand, "doc_id", "left_semi")
        .join(nots, "doc_id", "left_anti")
    )
    w = (
        F.when(F.col("term").isin(_BOOL_MUST), F.lit(1.0)).otherwise(F.lit(0.0))
        + F.when(F.col("term").isin(_BOOL_SHOULD),
                 F.lit(_SHOULD_BOOST)).otherwise(F.lit(0.0))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tfn = (F.col("tf") * (F.lit(1.2) + F.lit(1.0))) / (
        F.col("tf")
        + F.lit(1.2)
        * (F.lit(1.0) - F.lit(0.75) + F.lit(0.75) * F.col("dl") / F.lit(float(avgdl)))
    )
    per_doc = (
        j.select("doc_id", "term", (w * idf * tfn).alias("p"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("term", "p"))).alias("ps"))
        .select(
            "doc_id",
            F.round(
                F.aggregate(F.col("ps"), F.lit(0.0), lambda a, x: a + x["p"]), 6
            ).alias("score"),
        )
    )
    return per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _bool_sql(k: int) -> str:
    must = ", ".join(f"'{t}'" for t in _BOOL_MUST)
    should = ", ".join(f"'{t}'" for t in _BOOL_SHOULD)
    mnot = ", ".join(f"'{t}'" for t in _BOOL_NOT)
    scoring = ", ".join(
        f"'{t}'" for t in sorted(set(_BOOL_MUST) | set(_BOOL_SHOULD))
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS ts FROM documents
), dl AS (
  SELECT doc_id, len(ts)::bigint AS dl FROM toks
), stats AS (
  SELECT count(*)::bigint AS n_docs, sum(dl)::double / count(*) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, t AS term, count(*)::bigint AS tf
  FROM (SELECT doc_id, unnest(ts) AS t FROM toks)
  WHERE t IN ({scoring})
  GROUP BY doc_id, t
), dfs AS (
  SELECT term, count(*)::bigint AS df FROM tf GROUP BY term
), cand AS (
  SELECT doc_id FROM tf WHERE term IN ({must})
  GROUP BY doc_id HAVING count(DISTINCT term) = {len(set(_BOOL_MUST))}
), nots AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(ts) AS t FROM toks)
  WHERE t IN ({mnot})
), partial AS (
  SELECT tf.doc_id, tf.term,
         (CASE WHEN tf.term IN ({must}) THEN 1.0 ELSE 0.0 END
          + CASE WHEN tf.term IN ({should}) THEN {_SHOULD_BOOST} ELSE 0.0 END)
         * ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
         * (tf.tf * (1.2 + 1.0))
         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS p
  FROM tf
  JOIN dfs d USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  WHERE tf.doc_id IN (SELECT doc_id FROM cand)
    AND tf.doc_id NOT IN (SELECT doc_id FROM nots)
), scores AS (
  SELECT doc_id, round(sum(p ORDER BY term), 6) AS score
  FROM partial GROUP BY doc_id
)
SELECT doc_id, score FROM scores ORDER BY score DESC, doc_id LIMIT {k}
"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- reference operator surface (SURVEY §2) -------------------------
    def incr_scan(spark, sf):
        ev = _t(spark, sf, "events")
        return (
            increment_filter(ev, "event_id", 500)
            .orderBy("event_id")
            .limit(1000)
            .select("event_id", "event_type", "value")
        )
    q["incr_scan"] = incr_scan

    def shard_union(spark, sf):
        ev = _t(spark, sf, "events")
        s0 = ev.filter(F.col("event_id") % 2 == 0).withColumn("shard", F.lit("t0"))
        s1 = ev.filter(F.col("event_id") % 2 == 1).withColumn("shard", F.lit("t1"))
        u = s0.unionByName(s1)
        return synthesize_id(
            u, ["event_id"], prefix="ev", pattern_capture=F.col("shard"),
            out="sync_id",
        ).select("sync_id", "event_id", "event_type")
    q["shard_union"] = shard_union

    def custom_sql_join(spark, sf):
        o = _t(spark, sf, "orders")
        c = _t(spark, sf, "customer")
        return (
            increment_filter(o, "o_orderkey", 100)
            .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left")
            .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
        )
    q["custom_sql_join"] = custom_sql_join

    def rename_camel_ignore(spark, sf):
        c = _t(spark, sf, "customer")
        c = ignore_columns(c, ["c_acctbal", "c_nationkey"])
        c = rename_columns(
            c, {"c_custkey": "cust_key", "c_name": "full_name",
                "c_mktsegment": "mkt_segment"}
        )
        return camel_case_columns(c)
    q["rename_camel_ignore"] = rename_camel_ignore

    def id_synthesis(spark, sf):
        o = _t(spark, sf, "orders")
        return synthesize_id(
            o, ["o_orderkey", "o_custkey"], prefix="ord", suffix="v1",
            out="sync_id",
        ).select("sync_id", "o_orderkey")
    q["id_synthesis"] = id_synthesis

    def template_bucket_q(spark, sf):
        o = _t(spark, sf, "orders")
        return (
            template_bucket(o, "o_orderdate", "yyyy_MM", out="ym")
            .groupBy("ym")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double").alias("revenue"),
            )
        )
    q["template_bucket"] = template_bucket_q

    def template_routed_scan(spark, sf):
        # physical template routing (README-EN.org:261-297): write rows
        # partitioned by the derived monthly bucket, read back through a
        # bucket filter — the scan prunes to one physical partition
        # (PartitionFilters in the plan; engine analogue: per-month
        # segments pruned by SearchIndex._segments)
        o = _t(spark, sf, "orders")
        routed = template_bucket(o, "o_orderdate", "yyyy_MM", out="ym")
        root = tempfile.mkdtemp(prefix="m2es_route_")
        routed.select("o_orderkey", "o_totalprice", "ym").write.mode(
            "overwrite"
        ).partitionBy("ym").parquet(root)
        back = spark.read.parquet(root).filter(F.col("ym") == "1995_03")
        return back.select(
            "o_orderkey", "o_totalprice", F.col("ym").cast("string").alias("ym")
        )
    q["template_routed_scan"] = template_routed_scan

    def derived_scalars(spark, sf):
        ev = _t(spark, sf, "events")
        return ev.select(
            "event_id",
            F.coalesce(F.col("value"), F.lit(0.0)).alias("value_or_zero"),
            F.unix_timestamp("ts").alias("epoch_s"),
        )
    q["derived_scalars"] = derived_scalars

    def multi_format_dates(spark, sf):
        o = _t(spark, sf, "orders")
        s = (
            F.when(F.col("o_orderkey") % 3 == 0,
                   F.date_format("o_orderdate", "yyyy-MM-dd"))
            .when(F.col("o_orderkey") % 3 == 1,
                  F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
            .otherwise((F.unix_timestamp("o_orderdate") * 1000).cast("string"))
        )
        parsed = multi_format_timestamp(s)
        return o.select(
            "o_orderkey", F.unix_timestamp(parsed).alias("parsed_epoch")
        )
    q["multi_format_dates"] = multi_format_dates

    def json_props(spark, sf):
        ev = _t(spark, sf, "events")
        return ev.select(
            "event_id", F.get_json_object("props", "$.k").alias("k_val")
        )
    q["json_props"] = json_props

    def nested_assembly(spark, sf):
        o = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_partkey"
        )
        n = nested_mapping(
            o.select("o_orderkey"), li, "o_orderkey", "l_orderkey", "item"
        )
        return n.select(
            "o_orderkey",
            F.coalesce(F.size("item"), F.lit(0)).alias("n_items"),
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.col("item"),
                        lambda x: F.concat_ws(
                            ":", x["l_linenumber"].cast("string"),
                            x["l_partkey"].cast("string"),
                        ),
                    ),
                    ",",
                ),
                F.lit(""),
            ).alias("items_sig"),
        )
    q["nested_assembly"] = nested_assembly

    def relation_flat(spark, sf):
        li = _t(spark, sf, "lineitem")
        p = _t(spark, sf, "part").select("p_partkey", "p_brand", "p_type")
        out = relation_mapping(li, p, "l_partkey", "p_partkey", broadcast=True)
        return out.select(
            "l_orderkey", "l_linenumber", "l_partkey", "p_brand", "p_type"
        )
    q["relation_flat"] = relation_flat

    def upsert_latest(spark, sf):
        ev = _t(spark, sf, "events")
        return latest_by_version(
            ev, ["user_id", "event_type"], ["ts", "event_id"]
        ).select("user_id", "event_type", F.col("event_id").alias("latest_event"))
    q["upsert_latest"] = upsert_latest

    def checkpoint_max(spark, sf):
        ev = _t(spark, sf, "events")
        return ev.groupBy("event_type").agg(
            F.max("event_id").alias("last_increment"),
            F.count("*").alias("n_rows"),
        )
    q["checkpoint_max"] = checkpoint_max

    def soft_delete(spark, sf):
        ev = _t(spark, sf, "events").withColumn(
            "deleted", F.when(F.col("event_type") == "error", 1).otherwise(0)
        )
        return soft_delete_filter(ev).groupBy("user_id").agg(
            F.count("*").alias("n_live")
        )
    q["soft_delete"] = soft_delete

    def compensation_window(spark, sf):
        ev = _t(spark, sf, "events")
        wm = ev.agg(F.max("ts").alias("wm")).head()["wm"]
        lo = wm - __import__("datetime").timedelta(seconds=300)
        return ev.filter(F.col("ts") >= F.lit(lo)).select("event_id", "user_id")
    q["compensation_window"] = compensation_window

    def set_ops(spark, sf):
        # intersect + except in one tagged frame (merged from the two
        # r1-r5 entries to stay inside the driver's 50-entry cap while
        # phrase_prefix_search takes an oracle slot)
        ev = _t(spark, sf, "events")
        a = ev.filter(F.col("value") > 100).select("user_id")
        b = ev.filter(F.col("event_type") == "click").select("user_id")
        inter = a.intersect(b).select(
            F.lit("intersect").alias("op"), "user_id"
        )
        c = ev.select("user_id").distinct()
        d = ev.filter(F.col("event_type") == "error").select("user_id")
        exc = c.exceptAll(d.distinct()).select(
            F.lit("except").alias("op"), "user_id"
        )
        return inter.unionByName(exc)
    q["set_ops"] = set_ops

    def pricing_summary(spark, sf):
        # TPC-H Q1 shape: multi-aggregate groupBy with decimal-exact sums
        li = _t(spark, sf, "lineitem")
        dec = lambda c: F.col(c).cast("decimal(18,2)")
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
                F.sum(dec("l_extendedprice")).cast("double").alias("sum_base"),
                F.sum(
                    (dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - dec("l_discount")))
                    .cast("decimal(28,6)")
                ).cast("double").alias("sum_disc_price"),
                F.count("*").alias("count_order"),
            )
        )
    q["pricing_summary"] = pricing_summary

    def pivot_status(spark, sf):
        # pivot via conditional aggregation (SQL-parity form)
        o = _t(spark, sf, "orders")
        return o.groupBy("o_orderpriority").agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_f"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_o"),
            F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_p"),
        )
    q["pivot_status"] = pivot_status

    # ---- fulltext operators over documents ------------------------------
    def tf_agg(spark, sf):
        toks = _doc_tokens(_t(spark, sf, "documents"))
        return (
            toks.select("doc_id", F.explode("ts").alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
        )
    q["tf_agg"] = tf_agg

    def df_stats(spark, sf):
        toks = _doc_tokens(_t(spark, sf, "documents"))
        return (
            toks.select("doc_id", F.explode("ts").alias("term"))
            .distinct()
            .groupBy("term")
            .agg(F.count("*").alias("df"))
        )
    q["df_stats"] = df_stats

    def corpus_stats(spark, sf):
        toks = _doc_tokens(_t(spark, sf, "documents"))
        return toks.agg(
            F.count("*").alias("n_docs"),
            F.round(F.sum("dl").cast("double") / F.count("*"), 6).alias("avgdl"),
        )
    q["corpus_stats"] = corpus_stats

    def topk_exact(spark, sf):
        return _bm25_simple_topk(spark, sf, _QUERY_TERMS, 20)
    q["topk_exact"] = topk_exact

    def search_filtered(spark, sf):
        return _bm25_simple_topk(spark, sf, _QUERY_TERMS, 20, lang="en")
    q["search_filtered"] = search_filtered

    def search_filtered_where(spark, sf):
        # generalized doc-store predicate (non-lang column, range + set):
        # the engine's SearchIndex.search(where=...) semantics
        return _bm25_simple_topk(
            spark, sf, _QUERY_TERMS, 20,
            where="source IN ('src3', 'src7', 'src11') AND doc_id % 2 = 0",
        )
    q["search_filtered_where"] = search_filtered_where

    def phrase_search(spark, sf):
        # match_phrase over a position-free corpus: exact consecutive
        # occurrences (overlap-aware, codegen higher-order functions —
        # operators.search.phrase_topk), scored as BM25 of the phrase
        # as one pseudo-term (tf = occurrences, df = phrase df)
        from mysql2es_spark.operators.search import phrase_topk

        toks = _t(spark, sf, "documents").select(
            "doc_id", tokenize_simple("text").alias("ts")
        )
        return phrase_topk(toks, "ts", "doc_id", ["table", "hash"], k=20)
    q["phrase_search"] = phrase_search

    def phrase_prefix_search(spark, sf):
        # ES match_phrase_prefix (the autocomplete query; engine:
        # SearchIndex.search_phrase_prefix): 'table' immediately
        # followed by any 'ha...'-prefixed term, scored as BM25 of the
        # phrase-prefix pseudo-term — operators.search.phrase_prefix_topk
        from mysql2es_spark.operators.search import phrase_prefix_topk

        toks = _t(spark, sf, "documents").select(
            "doc_id", tokenize_simple("text").alias("ts")
        )
        return phrase_prefix_topk(
            toks, "ts", "doc_id", ["table"], "ha", k=20
        )
    q["phrase_prefix_search"] = phrase_prefix_search

    def facet_counts_q(spark, sf):
        # ES terms-aggregation analogue: bucket counts of lang and
        # source over the match set (OR over the query terms) —
        # operators.search.facet_counts
        from mysql2es_spark.operators.search import facet_counts

        d = _t(spark, sf, "documents")
        m = d.select(
            "doc_id", "lang", "source", tokenize_simple("text").alias("ts")
        ).filter(
            F.arrays_overlap(
                "ts", F.array(*[F.lit(t) for t in _QUERY_TERMS])
            )
        )
        return facet_counts(m, ["lang", "source"])
    q["facet_counts"] = facet_counts_q

    def prefix_search(spark, sf):
        # ES prefix query, scoring_boolean rewrite: expand 'ta' against
        # the corpus's distinct tokens (sorted, capped 50 — the engine
        # side expands against the term DICTIONARY,
        # SearchIndex.expand_prefix) and score the expansion as an OR
        # query through the same exact BM25 as topk_exact
        toks = _doc_tokens(_t(spark, sf, "documents"))
        exp = (
            toks.select(F.explode("ts").alias("term"))
            .filter(F.col("term").startswith("ta"))
            .distinct().orderBy("term").limit(50).collect()
        )
        return _bm25_simple_topk(spark, sf, [r["term"] for r in exp], 20)
    q["prefix_search"] = prefix_search

    def wildcard_search(spark, sf):
        # ES wildcard query '*ow*' (scoring_boolean rewrite): glob
        # expansion over distinct corpus tokens — the engine side
        # expands against the dictionary (SearchIndex.expand_wildcard)
        toks = _doc_tokens(_t(spark, sf, "documents"))
        exp = (
            toks.select(F.explode("ts").alias("term"))
            .filter(F.col("term").like("%ow%"))
            .distinct().orderBy("term").limit(50).collect()
        )
        return _bm25_simple_topk(spark, sf, [r["term"] for r in exp], 20)
    q["wildcard_search"] = wildcard_search

    def more_like_this(spark, sf):
        # ES more_like_this: seed = doc 0's text; terms ranked by
        # tf-idf interestingness (idf * seed-tf, ties by term), top 10
        # run as a unit-weight OR query, seed excluded from results —
        # the engine side is SearchIndex.more_like_this
        toks = _doc_tokens(_t(spark, sf, "documents"))
        n_docs = toks.count()
        seed_tf = (
            toks.filter(F.col("doc_id") == 0)
            .select(F.explode("ts").alias("term"))
            .groupBy("term").agg(F.count("*").alias("stf"))
        )
        dfs = (
            toks.select("doc_id", F.explode("ts").alias("term"))
            .distinct().groupBy("term").agg(F.count("*").alias("df"))
        )
        interest = (
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ) * F.col("stf")
        )
        sel = (
            seed_tf.join(dfs, "term")
            .select("term", interest.alias("i"))
            .orderBy(F.desc("i"), F.asc("term")).limit(10).collect()
        )
        return _bm25_simple_topk(
            spark, sf, [r["term"] for r in sel], 20, where="doc_id <> 0"
        )
    q["more_like_this"] = more_like_this

    def bool_search(spark, sf):
        # ES bool query (engine: SearchIndex.search_bool, VERDICT r5
        # #3): must=[fast, hash] conjunctive + scored, should=[join]
        # score-only at boost 0.5, must_not=[table] excluded
        return _bool_simple_topk(spark, sf, 20)
    q["bool_search"] = bool_search

    def fuzzy_search(spark, sf):
        # ES fuzzy query (engine: SearchIndex.search_fuzzy, VERDICT r5
        # #4): levenshtein-<=1 expansion of 'tast' over the distinct
        # token set, ranked (distance, term), capped 50, scored as a
        # unit-weight OR — the engine expands against the term
        # dictionary with the same ranking
        toks = _doc_tokens(_t(spark, sf, "documents"))
        exp = (
            toks.select(F.explode("ts").alias("term")).distinct()
            .withColumn("d", F.levenshtein(F.col("term"), F.lit("tast")))
            .filter(F.col("d") <= 1)
            .orderBy("d", "term").limit(50).collect()
        )
        return _bm25_simple_topk(spark, sf, [r["term"] for r in exp], 20)
    q["fuzzy_search"] = fuzzy_search

    # ---- training-data pipeline ops --------------------------------------
    def token_count(spark, sf):
        d = _t(spark, sf, "documents")
        return d.select(
            "doc_id",
            TS.token_count("text").alias("n_tokens"),
            TS.bpe_ish_token_count("text").alias("bpe_tokens"),
        )
    q["token_count"] = token_count

    def quality_score(spark, sf):
        d = _t(spark, sf, "documents")
        f = TS.quality_features("text")
        return d.select(
            "doc_id",
            f["n_tokens"].alias("n_tokens"),
            F.round(f["mean_tok_len"], 6).alias("mean_tok_len"),
            F.round(f["stopword_ratio"], 6).alias("stopword_ratio"),
            F.round(TS.quality_score("text"), 6).alias("quality"),
        )
    q["quality_score"] = quality_score

    def lang_id(spark, sf):
        d = _t(spark, sf, "documents")
        return d.select("doc_id", TS.lang_id("text").alias("lang_guess"))
    q["lang_id"] = lang_id

    def doc_fingerprint(spark, sf):
        d = _t(spark, sf, "documents")
        return d.select("doc_id", TS.fingerprint("text").alias("fp"))
    q["doc_fingerprint"] = doc_fingerprint

    def dedup_exact(spark, sf):
        d = _t(spark, sf, "documents")
        return DD.exact_dedup(d, "text", "doc_id")
    q["dedup_exact"] = dedup_exact

    def ngram_jaccard(spark, sf):
        d = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
        pairs = DD.ngram_jaccard_pairs(d, "text", "doc_id", shingle_n=3,
                                       threshold=0.2)
        return pairs.select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    q["ngram_jaccard"] = ngram_jaccard

    def dedup_clusters(spark, sf):
        # connected components over verified near-dup pairs (the step
        # after pair generation in every dedup pipeline): hash-to-min
        # label propagation, oracle-checked against a DuckDB recursive
        # CTE computing the same transitive closure
        d = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
        pairs = DD.ngram_jaccard_pairs(d, "text", "doc_id", shingle_n=3,
                                       threshold=0.2).select("a", "b")
        comp = DD.connected_components(pairs)
        return comp.select(
            F.col("id").cast("long").alias("doc_id"),
            F.col("component").cast("long").alias("component"),
        )
    q["dedup_clusters"] = dedup_clusters

    def dedup_canonical(spark, sf):
        # the final dedup filter: keep ONE doc per near-dup component
        # (min id) + every unpaired doc
        d = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
        pairs = DD.ngram_jaccard_pairs(d, "text", "doc_id", shingle_n=3,
                                       threshold=0.2).select("a", "b")
        kept = DD.dedup_canonical(d.select("doc_id", "n_chars"), pairs,
                                  "doc_id")
        return kept.select("doc_id", "n_chars")
    q["dedup_canonical"] = dedup_canonical

    def embedding_cosine_topk(spark, sf):
        e = _t(spark, sf, "embeddings")
        qvec = [
            float(x)
            for x in e.filter(F.col("vec_id") == 0).head()["embedding"]
        ]
        cand = e.filter(F.col("vec_id") > 0).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        top = SIM.brute_force_cosine_topk(cand, "emb", "vec_id", qvec, k=10)
        return top.select("vec_id", F.round("cosine", 6).alias("cosine"))
    q["embedding_cosine_topk"] = embedding_cosine_topk

    def hybrid_rrf(spark, sf):
        # hybrid lexical+vector retrieval: exact BM25 top-50 and exact
        # cosine top-50 fused by reciprocal rank (operators.search.
        # rrf_fuse, Cormack et al. 2009).  Ranks are assigned on
        # round-6 scores with an id tiebreak so Spark and the DuckDB
        # oracle fuse identical lists; the embeddings table shares the
        # documents table's id space (vec_id == doc_id).
        from mysql2es_spark.operators.search import rrf_fuse

        bm = _bm25_simple_topk(spark, sf, _QUERY_TERMS, 50)
        e = _t(spark, sf, "embeddings")
        qvec = [
            float(x)
            for x in e.filter(F.col("vec_id") == 0).head()["embedding"]
        ]
        cand = e.filter(F.col("vec_id") > 0).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        # round-6 BEFORE the top-50 cut (same as the oracle): a
        # boundary tie on rounded scores must resolve by id on both
        # sides, not by the unrounded value on one of them
        cos = (
            cand.select(
                F.col("vec_id").alias("doc_id"),
                F.round(
                    SIM.cosine(F.col("emb"), SIM._lit_vec(qvec)), 6
                ).alias("cosine"),
            )
            .orderBy(F.desc("cosine"), F.asc("doc_id"))
            .limit(50)
        )
        return rrf_fuse(bm, cos, "doc_id", "score", "cosine", k=20)
    q["hybrid_rrf"] = hybrid_rrf

    # ---- rows-only checks (no SQL twin: xxhash64 / index build / media) --
    # VERDICT r5 #1: the driver records only the FIRST 50 registered
    # entries, so every oracle-checked query registers above this line
    # (46 of them) and the rows-only surface is consolidated into FOUR
    # composite lifecycles, each individually pinned by pytest and each
    # stage oracle-checked by its table-level twin where one exists.
    def sketch_dedup(spark, sf):
        # the sketch family in one tall frame: MinHash-LSH candidate
        # pairs (est_jaccard >= 0.5), SimHash banded-Hamming pairs, and
        # hyperplane-LSH embedding near-dup pairs — xxhash64 sketches
        # have no DuckDB twin; pair-level verification is oracle-checked
        # via ngram_jaccard / dedup_clusters / embedding_cosine_topk
        d = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
        sig = DD.minhash_signature(d, "text", "doc_id", k=64)
        mh = (
            DD.minhash_lsh_candidates(sig, "doc_id", k=64, bands=16)
            .filter(F.col("est_jaccard") >= 0.5)
            .select(
                F.lit("minhash").alias("kind"),
                F.col("a").cast("long").alias("a"),
                F.col("b").cast("long").alias("b"),
                F.round("est_jaccard", 6).alias("score"),
            )
        )
        sh = DD.simhash_candidates(d, "text", "doc_id", max_hamming=3).select(
            F.lit("simhash").alias("kind"),
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            F.col("hamming").cast("double").alias("score"),
        )
        e = _t(spark, sf, "embeddings")
        cand = e.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        nd = SIM.embedding_near_dup_pairs(
            cand, "emb", "vec_id", threshold=0.9
        ).select(
            F.lit("embedding").alias("kind"),
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            F.round("cosine", 6).alias("score"),
        )
        return mh.unionByName(sh).unionByName(nd).orderBy(
            "kind", "a", "b"
        )
    q["sketch_dedup"] = sketch_dedup

    def _ann_index_root(spark, sf):
        # build the materialized ANN layout once per (session, sf):
        # partitioned by lsh_bucket/ivf_cell, queries read only probed
        # partitions (the 100-TB path; VERDICT r3 #1)
        from mysql2es_spark.operators.ann_index import build_ann_index

        cached = _ANN_ROOTS.get(sf)
        if cached and os.path.exists(os.path.join(cached, "ann_meta.json")):
            return cached
        e = _t(spark, sf, "embeddings")
        cand = e.filter(F.col("vec_id") > 0).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        root = tempfile.mkdtemp(prefix="m2es_annidx_")
        build_ann_index(spark, cand, "emb", "vec_id", root)
        _ANN_ROOTS[sf] = root
        return root

    def _qvec(spark, sf):
        e = _t(spark, sf, "embeddings")
        return [
            float(x)
            for x in e.filter(F.col("vec_id") == 0).head()["embedding"]
        ]

    def ann_lifecycle(spark, sf):
        # the full ANN surface in one composite (VERDICT r5 #1
        # consolidation): all three probe paths over the shared cached
        # layout — flip-count LSH, IVF nprobe, and best-first budgeted
        # cross probing (measured recall 0.825 @ 0.35 scan, BENCH.md) —
        # then the tombstone -> compact lifecycle on its own small
        # layout (deleted vectors never surface pre/post rewrite).
        # Rows-only: hyperplane/centroid layouts have no SQL twin;
        # exactness of the underlying scores is oracle-checked by
        # embedding_cosine_topk.
        from mysql2es_spark.operators.ann_index import (
            AnnIndex, build_ann_index, compact_ann_index,
            delete_from_ann_index,
        )

        qv = _qvec(spark, sf)
        idx = AnnIndex(spark, _ann_index_root(spark, sf))
        outs = []
        for kind, top in [
            ("lsh", idx.lsh_topk(qv, k=10)),
            ("ivf", idx.ivf_topk(qv, k=10, nprobe=4)),
            ("cross", idx.cross_topk(qv, k=10)),
        ]:
            outs.append(
                top.select(
                    F.lit(kind).alias("kind"),
                    F.col("vec_id").cast("long").alias("vec_id"),
                    F.round("cosine", 6).alias("cosine"),
                )
            )
        # tombstone -> compact on a private layout (the shared cached
        # root stays pristine for reruns)
        e = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 2000)
        cand = e.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        root = tempfile.mkdtemp(prefix="m2es_anndel_")
        build_ann_index(spark, cand, "emb", "vec_id", root, n_centroids=8)
        small = AnnIndex(spark, root)
        before = {int(r["vec_id"])
                  for r in small.cross_topk(qv, k=10).collect()}
        dead = sorted(before)[:5]
        delete_from_ann_index(spark, root, dead)
        small.refresh()
        mid = {int(r["vec_id"])
               for r in small.cross_topk(qv, k=10).collect()}
        assert not (mid & set(dead)), "tombstoned vectors surfaced"
        compact_ann_index(spark, root)
        small.refresh()
        top = small.cross_topk(qv, k=10)
        assert not ({int(r["vec_id"]) for r in top.collect()} & set(dead))
        outs.append(
            top.select(
                F.lit("post_compact").alias("kind"),
                F.col("vec_id").cast("long").alias("vec_id"),
                F.round("cosine", 6).alias("cosine"),
            )
        )
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out.orderBy("kind", F.desc("cosine"), "vec_id")
    q["ann_lifecycle"] = ann_lifecycle

    def version_upsert(spark, sf):
        # REAL-ENGINE oracle-checked upsert under a USER version column
        # (README-EN.org:122-123 version-column/version-check): base
        # corpus at mtime=1000, one delta carrying updates (mtime=2000,
        # doc_id%5) AND stale replays (mtime=500, doc_id%7) in the same
        # batch.  Stale rows must be dead on arrival, updates must win
        # even though the snapshot ordering alone wouldn't decide it.
        # The live doc set + per-doc dl ("simple" analyzer — SQL twin
        # tokenizes identically) is fully expressible in DuckDB.
        from mysql2es_spark.operators.index import IndexConfig
        from mysql2es_spark.plans.build import SearchIndex, apply_delta, full_build

        docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 1500)

        def as_corpus(d, mtime, suffix=""):
            return d.select(
                F.concat(F.lit("src/"), F.col("source")).alias("repo"),
                F.concat(F.lit("doc/"), F.col("doc_id").cast("string"),
                         F.lit(".txt")).alias("path"),
                F.sha2(F.concat(F.col("text"), F.lit(suffix)), 256)
                .substr(1, 12).alias("commit"),
                F.col("lang"),
                F.concat(F.col("text"), F.lit(suffix)).alias("content"),
                F.lit(mtime).cast("long").alias("mtime"),
            )

        cfg = IndexConfig(n_buckets=8, block_size=64, salt_threshold=2000,
                          n_salts=4, chunk_span=1024, id_partitions=8)
        root = tempfile.mkdtemp(prefix="m2es_vc_")
        full_build(spark, as_corpus(docs, 1000), root, cfg, snapshot_id=1,
                   text_fields={"content": "simple"},
                   version_column="mtime")
        upd = as_corpus(docs.filter(F.col("doc_id") % 5 == 0), 2000, " v2")
        stale = as_corpus(docs.filter(F.col("doc_id") % 7 == 0), 500,
                          " stale")
        apply_delta(
            spark,
            upd.unionByName(stale)
            .withColumn("snapshot_id", F.lit(2).cast("long")),
            root, cfg, target_snap=2,
        )
        idx = SearchIndex(spark, root, cfg)
        live = idx.docstore()
        tomb = idx.tombstones()
        if tomb is not None:
            live = live.join(tomb, "doc_id", "left_anti")
        return live.select(
            F.regexp_extract("path", r"doc/(\d+)\.txt", 1)
            .cast("long").alias("doc_id"),
            F.col("version"),
            F.col("dl"),
        )
    q["version_upsert"] = version_upsert

    def index_lifecycle(spark, sf):
        # the REAL ENGINE end to end in one composite (VERDICT r5 #1
        # consolidation of bm25_blockmax + compaction_lifecycle +
        # query_surface_lifecycle): full build WITH the chunk-
        # partitioned token store -> delta updating 300 docs
        # (tombstones) -> TIERED partial compact (physically drops the
        # dead) -> the whole query surface over the compacted index:
        # block-max BM25 (the salted varint posting path), match_phrase
        # through the TOKEN-STORE pruned phase 2 (r6: no source scan),
        # prefix, fuzzy, bool, and facets.  Rows-only: the index build
        # is not SQL-expressible; each query semantic is oracle-checked
        # by its table-level twin (topk_exact, phrase_search,
        # prefix_search, fuzzy_search, bool_search, facet_counts).
        from mysql2es_spark.operators.index import IndexConfig
        from mysql2es_spark.plans.build import (
            SearchIndex, apply_delta, compact, full_build,
        )

        docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 2000)

        def as_corpus(d, suffix=""):
            return d.select(
                F.concat(F.lit("src/"), F.col("source")).alias("repo"),
                F.concat(F.lit("doc/"), F.col("doc_id").cast("string"),
                         F.lit(".txt")).alias("path"),
                F.sha2(F.concat(F.col("text"), F.lit(suffix)), 256)
                .substr(1, 12).alias("commit"),
                F.col("lang"),
                F.concat(F.col("text"), F.lit(suffix)).alias("content"),
            )

        cfg = IndexConfig(n_buckets=8, block_size=64, salt_threshold=500,
                          n_salts=4, chunk_span=512, id_partitions=8,
                          token_store=True)
        root = tempfile.mkdtemp(prefix="m2es_lifecycle_")
        full_build(spark, as_corpus(docs), root, cfg, snapshot_id=1)
        # update 300 docs (new commit, higher snapshot): tombstones
        upd = as_corpus(docs.filter(F.col("doc_id") < 300), " updated v2")
        apply_delta(
            spark, upd.withColumn("snapshot_id", F.lit(2).cast("long")),
            root, cfg, target_snap=2,
        )
        m = compact(spark, root, cfg, min_tombstone_ratio=0.05,
                    max_segments=1)
        assert sum(s.n_tombstones for s in m.segments) == 0
        idx = SearchIndex(spark, root, cfg)

        def tall(df, kind, key_col, val_col):
            return df.select(
                F.lit(kind).alias("kind"),
                F.col(key_col).cast("string").alias("key"),
                F.round(F.col(val_col).cast("double"), 6).alias("v"),
            )

        bm = tall(
            idx.search("fast hash join updated", k=20), "bm25",
            "path", "score",
        )
        ph = tall(
            idx.search_phrase("table hash", k=10),  # token-store phase 2
            "phrase", "path", "score",
        )
        pp = tall(
            idx.search_phrase_prefix("table ha", k=10),
            "phrase_prefix", "path", "score",
        )
        pf = tall(
            idx.search_prefix("ta", k=10, exact=True), "prefix",
            "path", "score",
        )
        fz = tall(
            idx.search_fuzzy("tabel", fuzziness=1, k=10, exact=True),
            "fuzzy", "path", "score",
        )
        bq = tall(
            idx.search_bool(must="fast hash", should="join",
                            must_not="table", should_boost=0.5, k=10,
                            exact=True),
            "bool", "path", "score",
        )
        fc = idx.facets("fast hash join", by=["lang"]).select(
            F.lit("facet").alias("kind"),
            F.col("value").alias("key"),
            F.col("cnt").cast("double").alias("v"),
        )
        hl = idx.highlight("fast hash", k=5, window=3).select(
            F.lit("highlight").alias("kind"),
            F.concat_ws("|", "path", "snippet").alias("key"),
            F.round(F.col("score").cast("double"), 6).alias("v"),
        )
        out = bm
        for part in (ph, pp, pf, fz, bq, fc, hl):
            out = out.unionByName(part)
        return out.orderBy("kind", F.desc("v"), "key")
    q["index_lifecycle"] = index_lifecycle

    def llm_pipeline(spark, sf):
        # the COMPLETE training-data pipeline end-to-end (VERDICT r4
        # next-round #7): exact dedup -> MinHash LSH near-dup pairs ->
        # connected components -> canonical filter -> index build over
        # the survivors -> BM25 search.  Rows-only: the index build has
        # no SQL twin; every stage is individually oracle-checked by
        # its own driver entry (dedup_exact, dedup_clusters,
        # dedup_canonical, topk_exact).
        from mysql2es_spark.operators.dedup import (
            dedup_canonical, exact_dedup, minhash_lsh_candidates,
            minhash_signature,
        )
        from mysql2es_spark.operators.index import IndexConfig
        from mysql2es_spark.plans.build import SearchIndex, full_build

        docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 2000)

        # 1. exact dedup: lowest-id representative per content hash
        reps = exact_dedup(docs, "text", "doc_id").select("doc_id")
        survivors = docs.join(reps, "doc_id", "left_semi")

        # 2-4. near-dup: signatures -> banded candidates (est_jaccard
        # verified) -> components -> one canonical doc per cluster
        sig = minhash_signature(survivors, "text", "doc_id", k=32)
        pairs = minhash_lsh_candidates(sig, "doc_id", k=32, bands=8) \
            .filter(F.col("est_jaccard") >= 0.8)
        clean = dedup_canonical(survivors, pairs, "doc_id")

        # 5. index the deduplicated corpus + search it
        cfg = IndexConfig(n_buckets=8, block_size=64, salt_threshold=500,
                          n_salts=4, chunk_span=512, id_partitions=8)
        root = tempfile.mkdtemp(prefix="m2es_llmpipe_")
        corpus = clean.select(
            F.concat(F.lit("src/"), F.col("source")).alias("repo"),
            F.concat(F.lit("doc/"), F.col("doc_id").cast("string"),
                     F.lit(".txt")).alias("path"),
            F.sha2(F.col("text"), 256).substr(1, 12).alias("commit"),
            F.col("lang"),
            F.col("text").alias("content"),
        )
        full_build(spark, corpus, root, cfg, snapshot_id=1)
        hits = SearchIndex(spark, root, cfg).search(
            "model training data quality", k=20, exact=True
        )
        search_rows = (
            hits.select(
                F.regexp_extract("path", r"doc/(\d+)\.txt", 1)
                .cast("long").alias("doc_id"),
                F.round("score", 6).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(20)
            .select(
                F.lit("search").alias("kind"),
                F.col("doc_id").cast("string").alias("key"),
                F.col("score").cast("double").alias("v"),
            )
        )
        # 6. featurization stages over the survivors (r5 standalone
        # entries rolling_fingerprint / media_features, folded here):
        # winnowing fingerprints for the downstream near-dup ledger and
        # the multimodal feature plan (fake decoder — the honest stub)
        rfp_rows = (
            clean.orderBy("doc_id").limit(50)
            .select(
                F.lit("rfp").alias("kind"),
                F.col("doc_id").cast("string").alias("key"),
                TS.rolling_fingerprint("text").cast("double").alias("v"),
            )
        )
        media = MM.synth_media(spark, n=16)
        feats = MM.extract_features(media, use_fake_decoder=True)
        media_rows = (
            feats.select(
                "media_id", F.posexplode("features").alias("pos", "val")
            )
            .select(
                F.lit("media").alias("kind"),
                F.concat_ws(
                    ":", F.col("media_id").cast("string"),
                    F.col("pos").cast("string"),
                ).alias("key"),
                F.round(F.col("val").cast("double"), 6).alias("v"),
            )
        )
        return (
            search_rows.unionByName(rfp_rows).unionByName(media_rows)
            .orderBy("kind", "key", "v")
        )
    q["llm_pipeline"] = llm_pipeline

    def multifield_search(spark, sf):
        # REAL-ENGINE per-field search (README-EN.org:188-241), oracle-
        # checked: a two-text-field index (content + derived summary,
        # both "simple" so DuckDB tokenizes identically) is built by the
        # actual engine, then searched on the summary field with the
        # exact scorer; the oracle recomputes field-scoped BM25 from the
        # same derived expression.  Output keys map the engine's doc
        # store back to documents.doc_id via the synthesized path.
        import tempfile

        from mysql2es_spark.operators.index import IndexConfig
        from mysql2es_spark.plans.build import SearchIndex, full_build

        docs = _t(spark, sf, "documents")
        corpus = docs.select(
            F.concat(F.lit("src/"), F.col("source")).alias("repo"),
            F.concat(F.lit("doc/"), F.col("doc_id").cast("string"),
                     F.lit(".txt")).alias("path"),
            F.sha2(F.col("text"), 256).substr(1, 12).alias("commit"),
            F.col("lang"),
            F.col("text").alias("content"),
            F.concat_ws(" ", F.col("source"), F.col("lang"),
                        F.substring(F.col("text"), 1, 120)).alias("summary"),
        )
        root = tempfile.mkdtemp(prefix="m2es_mf_")
        cfg = IndexConfig(n_buckets=16, block_size=128, salt_threshold=2000,
                          n_salts=8, chunk_span=2048, id_partitions=16)
        full_build(spark, corpus, root, cfg, snapshot_id=1,
                   text_fields={"content": "simple", "summary": "simple"})
        # engine ties break on internal doc_id; the oracle ties on
        # documents.doc_id — take a margin, then re-rank on the shared
        # (raw score, original doc_id) order before cutting to 20
        hits = SearchIndex(spark, root).search(
            " ".join(_QUERY_TERMS), k=40, field="summary", exact=True
        )
        return (
            hits.select(
                F.regexp_extract("path", r"doc/(\d+)\.txt", 1)
                .cast("long").alias("doc_id"),
                F.col("score"),
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(20)
            .select("doc_id", F.round("score", 6).alias("score"))
        )
    q["multifield_search"] = multifield_search

    def frame_sample(spark, sf):
        # the multimodal frame-sampling plan (sequence+explode fan-out),
        # oracle-checked: durations derived deterministically from the
        # documents table so DuckDB can generate the same frame grid
        d = _t(spark, sf, "documents")
        vids = d.filter(F.pmod(F.col("doc_id"), F.lit(7)) == 0).select(
            F.col("doc_id").alias("media_id"),
            F.lit("video").alias("kind"),
            (F.pmod(F.col("n_chars"), F.lit(5000)) + F.lit(1000))
            .cast("int").alias("duration_ms"),
        )
        return MM.frame_sample_plan(vids, every_ms=500).select(
            "media_id", F.col("frame_ts_ms").cast("long").alias("frame_ts_ms")
        )
    q["frame_sample"] = frame_sample

    # ---- registration order (VERDICT r5 #1) -------------------------------
    # The driver records CORRECTNESS rows for the FIRST 50 registered
    # entries only.  Register every oracle-checked query first, then the
    # four rows-only composite lifecycles; assert the contract so a
    # future entry can't silently push an oracle query off the hard
    # signal again.
    rows_only = ["index_lifecycle", "ann_lifecycle", "sketch_dedup",
                 "llm_pipeline"]
    oracle_first = [n for n in q if n not in rows_only]
    ordered = {n: q[n] for n in oracle_first + rows_only}
    missing = set(oracle_first) - set(oracle_sql())
    assert not missing, f"queries without oracles before rows-only: {missing}"
    assert len(ordered) <= 50, f"{len(ordered)} entries exceed the driver cap"
    return ordered


def _entry_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2es_spark.operators.index import IndexConfig
    from mysql2es_spark.plans.build import SearchIndex, full_build

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.select(
        F.concat(F.lit("src/"), F.col("source")).alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.sha2(F.col("text"), 256).substr(1, 12).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    root = tempfile.mkdtemp(prefix="m2es_q_")
    cfg = IndexConfig(n_buckets=16, block_size=128, salt_threshold=2000,
                      n_salts=8, chunk_span=2048, id_partitions=16)
    full_build(spark, corpus, root, cfg, snapshot_id=1)
    return SearchIndex(spark, root).search("fast hash join query", k=20)


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["incr_scan"] = """
        SELECT event_id, event_type, value FROM events
        WHERE event_id > 500 ORDER BY event_id LIMIT 1000
    """

    sql["shard_union"] = """
        SELECT concat_ws('-', 'ev', shard, event_id) AS sync_id,
               event_id, event_type
        FROM (
          SELECT event_id, event_type, 't0' AS shard FROM events WHERE event_id % 2 = 0
          UNION ALL
          SELECT event_id, event_type, 't1' AS shard FROM events WHERE event_id % 2 = 1
        )
    """

    sql["custom_sql_join"] = """
        SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderkey > 100
    """

    sql["rename_camel_ignore"] = """
        SELECT c_custkey AS "custKey", c_name AS "fullName",
               c_mktsegment AS "mktSegment"
        FROM customer
    """

    sql["id_synthesis"] = """
        SELECT concat_ws('-', 'ord', o_orderkey, o_custkey, 'v1') AS sync_id,
               o_orderkey
        FROM orders
    """

    sql["template_bucket"] = """
        SELECT strftime(o_orderdate, '%Y_%m') AS ym,
               count(*)::bigint AS n_orders,
               (sum(o_totalprice::DECIMAL(18,2)))::double AS revenue
        FROM orders GROUP BY 1
    """

    sql["template_routed_scan"] = """
        SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y_%m') AS ym
        FROM orders WHERE strftime(o_orderdate, '%Y_%m') = '1995_03'
    """

    sql["derived_scalars"] = """
        SELECT event_id,
               coalesce(value, 0.0) AS value_or_zero,
               floor(epoch(ts))::bigint AS epoch_s
        FROM events
    """

    sql["multi_format_dates"] = """
        WITH s AS (
          SELECT o_orderkey,
                 CASE
                   WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
                   WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
                   ELSE (floor(epoch(o_orderdate))::bigint * 1000)::varchar
                 END AS ds
          FROM orders
        )
        SELECT o_orderkey,
               floor(epoch(
                 coalesce(
                   try_strptime(ds, '%Y-%m-%d %H:%M:%S.%g'),
                   try_strptime(ds, '%Y-%m-%d %H:%M:%S'),
                   try_strptime(ds, '%Y-%m-%d'),
                   CASE WHEN regexp_matches(ds, '^[0-9]{10,13}$') THEN
                     make_timestamp(CASE WHEN length(ds) <= 10
                                         THEN ds::bigint * 1000000
                                         ELSE ds::bigint * 1000 END)
                   END
                 )
               ))::bigint AS parsed_epoch
        FROM s
    """

    sql["json_props"] = """
        SELECT event_id, json_extract_string(props, '$.k') AS k_val FROM events
    """

    sql["nested_assembly"] = """
        SELECT o.o_orderkey,
               coalesce(li.n_items, 0)::int AS n_items,
               coalesce(li.items_sig, '') AS items_sig
        FROM orders o
        LEFT JOIN (
          SELECT l_orderkey,
                 count(*)::int AS n_items,
                 string_agg(l_linenumber || ':' || l_partkey, ','
                            ORDER BY l_linenumber, l_partkey) AS items_sig
          FROM lineitem GROUP BY l_orderkey
        ) li ON li.l_orderkey = o.o_orderkey
    """

    sql["relation_flat"] = """
        SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, p.p_brand, p.p_type
        FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    """

    sql["upsert_latest"] = """
        SELECT user_id, event_type, event_id AS latest_event
        FROM (
          SELECT user_id, event_type, event_id,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        ) WHERE rn = 1
    """

    sql["checkpoint_max"] = """
        SELECT event_type, max(event_id) AS last_increment,
               count(*)::bigint AS n_rows
        FROM events GROUP BY event_type
    """

    sql["soft_delete"] = """
        SELECT user_id, count(*)::bigint AS n_live
        FROM events WHERE coalesce(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END, 0) = 0
        GROUP BY user_id
    """

    sql["compensation_window"] = """
        SELECT event_id, user_id FROM events
        WHERE ts >= (SELECT max(ts) - INTERVAL 300 SECOND FROM events)
    """

    sql["set_ops"] = """
        SELECT 'intersect' AS op, user_id FROM (
          SELECT user_id FROM events WHERE value > 100
          INTERSECT
          SELECT user_id FROM events WHERE event_type = 'click'
        )
        UNION ALL
        SELECT 'except' AS op, user_id FROM (
          SELECT DISTINCT user_id FROM events
          EXCEPT
          SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
        )
    """

    sql["pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               (sum(l_quantity::DECIMAL(18,2)))::double AS sum_qty,
               (sum(l_extendedprice::DECIMAL(18,2)))::double AS sum_base,
               (sum((l_extendedprice::DECIMAL(18,2)
                     * (1::DECIMAL(3,2) - l_discount::DECIMAL(18,2)))::DECIMAL(28,6)))::double
                 AS sum_disc_price,
               count(*)::bigint AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """

    sql["pivot_status"] = """
        SELECT o_orderpriority,
               sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::bigint AS n_f,
               sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::bigint AS n_o,
               sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::bigint AS n_p
        FROM orders GROUP BY o_orderpriority
    """

    sql["tf_agg"] = f"""
        SELECT doc_id, t AS term, count(*)::bigint AS tf
        FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS t FROM documents)
        GROUP BY doc_id, t
    """

    sql["df_stats"] = f"""
        SELECT term, count(*)::bigint AS df
        FROM (
          SELECT DISTINCT doc_id, t AS term
          FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS t FROM documents)
        ) GROUP BY term
    """

    sql["corpus_stats"] = f"""
        SELECT count(*)::bigint AS n_docs,
               round(sum(dl)::double / count(*), 6) AS avgdl
        FROM (SELECT len({_SQL_TOKS})::bigint AS dl FROM documents)
    """

    sql["topk_exact"] = _bm25_sql(_QUERY_TERMS, 20)
    sql["search_filtered"] = _bm25_sql(_QUERY_TERMS, 20, lang="en")
    sql["search_filtered_where"] = _bm25_sql(
        _QUERY_TERMS, 20,
        where="source IN ('src3', 'src7', 'src11') AND doc_id % 2 = 0",
    )

    sql["phrase_search"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS ts
  FROM documents
), t2 AS (
  SELECT doc_id, len(ts) AS dl,
         CASE WHEN len(ts) >= 2 THEN
           len(list_filter(range(1, len(ts)),
                           i -> ts[i] = 'table' AND ts[i+1] = 'hash'))
         ELSE 0 END AS ptf
  FROM toks
), stats AS (SELECT count(*) AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM t2),
dfp AS (SELECT count(*) AS df FROM t2 WHERE ptf > 0)
SELECT doc_id,
       round(ln(1.0 + (stats.n - dfp.df + 0.5) / (dfp.df + 0.5))
             * (ptf * (1.2 + 1.0))
             / (ptf + 1.2 * (1.0 - 0.75 + 0.75 * dl / stats.avgdl)),
             6) AS score
FROM t2, stats, dfp WHERE ptf > 0
ORDER BY score DESC, doc_id LIMIT 20
"""

    sql["phrase_prefix_search"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS ts
  FROM documents
), t2 AS (
  SELECT doc_id, len(ts) AS dl,
         CASE WHEN len(ts) >= 2 THEN
           len(list_filter(range(1, len(ts)),
                           i -> ts[i] = 'table'
                                AND starts_with(ts[i+1], 'ha')))
         ELSE 0 END AS ptf
  FROM toks
), stats AS (SELECT count(*) AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM t2),
dfp AS (SELECT count(*) AS df FROM t2 WHERE ptf > 0)
SELECT doc_id,
       round(ln(1.0 + (stats.n - dfp.df + 0.5) / (dfp.df + 0.5))
             * (ptf * (1.2 + 1.0))
             / (ptf + 1.2 * (1.0 - 0.75 + 0.75 * dl / stats.avgdl)),
             6) AS score
FROM t2, stats, dfp WHERE ptf > 0
ORDER BY score DESC, doc_id LIMIT 20
"""

    _ql = ", ".join(f"'{t}'" for t in _QUERY_TERMS)
    sql["facet_counts"] = f"""
WITH m AS (
  SELECT doc_id, lang, source
  FROM documents
  WHERE len(list_filter(
          list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                      t -> t <> ''),
          t -> t IN ({_ql}))) > 0
)
SELECT 'lang' AS facet, lang AS value, count(*) AS cnt FROM m GROUP BY lang
UNION ALL
SELECT 'source' AS facet, source AS value, count(*) AS cnt FROM m GROUP BY source
ORDER BY facet, cnt DESC, value
"""

    sql["prefix_search"] = _bm25_sql([], 20, expand_prefix="ta")
    sql["wildcard_search"] = _bm25_sql([], 20, expand_prefix="%ow%")
    sql["bool_search"] = _bool_sql(20)
    sql["fuzzy_search"] = _bm25_sql(
        [], 20,
        expand_where="levenshtein(t, 'tast') <= 1",
        expand_order="levenshtein(t, 'tast'), t",
    )

    _mlt_base = _bm25_sql([], 20, where="doc_id <> 0")
    sql["more_like_this"] = _mlt_base.replace(
        "t IN ()",
        "t IN (SELECT term FROM _mlt_sel)",
    ).replace(
        "), dl AS (",
        """), _seed AS (
  SELECT unnest(ts) AS t FROM toks WHERE doc_id = 0
), _seed_tf AS (
  SELECT t AS term, count(*)::bigint AS stf FROM _seed GROUP BY t
), _alldf AS (
  SELECT t AS term, count(*)::bigint AS df
  FROM (SELECT DISTINCT doc_id, unnest(ts) AS t FROM toks) GROUP BY t
), _n AS (SELECT count(*)::bigint AS n_docs FROM toks),
_mlt_sel AS (
  SELECT st.term
  FROM _seed_tf st JOIN _alldf d USING (term) CROSS JOIN _n
  ORDER BY ln(1.0 + (_n.n_docs - d.df + 0.5) / (d.df + 0.5)) * st.stf DESC,
           st.term LIMIT 10
), dl AS (""",
    )

    sql["token_count"] = f"""
        SELECT doc_id,
               len({_SQL_TOKS})::int AS n_tokens,
               (coalesce(list_sum(list_transform({_SQL_TOKS},
                    w -> ceil(length(w) / 4.0)::int)), 0)
                + length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
               )::bigint AS bpe_tokens
        FROM documents
    """

    _stop_en = "['the','and','of','to','is','that','with','for','a','an','in','on','it','as','are','was','be','by','at','or']"
    sql["quality_score"] = f"""
        WITH f AS (
          SELECT doc_id,
                 length(text) AS n_chars,
                 {_SQL_TOKS} AS ts,
                 text
          FROM documents
        ), g AS (
          SELECT doc_id, n_chars,
                 len(ts)::int AS n_tokens,
                 CASE WHEN len(ts) > 0 THEN n_chars / len(ts) ELSE 0.0 END AS mean_tok_len,
                 length(regexp_replace(ts_text, '[^.,;:!?''"()\\[\\]{{}}]', '', 'g'))
                   / greatest(n_chars, 1) AS punct_ratio,
                 length(regexp_replace(ts_text, '[^0-9]', '', 'g'))
                   / greatest(n_chars, 1) AS digit_ratio,
                 CASE WHEN len(ts) > 0 THEN
                   len(list_filter(ts, t -> list_contains({_stop_en}, t))) / len(ts)
                 ELSE 0.0 END AS stopword_ratio
          FROM (SELECT doc_id, n_chars, ts, text AS ts_text FROM f)
        )
        SELECT doc_id, n_tokens,
               round(mean_tok_len, 6) AS mean_tok_len,
               round(stopword_ratio, 6) AS stopword_ratio,
               round(
                 0.3 * (CASE WHEN n_tokens >= 10 AND n_tokens <= 5000 THEN 1.0 ELSE 0.3 END)
               + 0.2 * (CASE WHEN mean_tok_len >= 2.0 AND mean_tok_len <= 12.0 THEN 1.0 ELSE 0.4 END)
               + 0.2 * (1.0 - least(punct_ratio * 2.0, 1.0))
               + 0.15 * (1.0 - least(digit_ratio * 2.0, 1.0))
               + 0.15 * least(stopword_ratio * 4.0, 1.0), 6) AS quality
        FROM g
    """

    _m = {
        "en": "['the','and','of','to','is','that','with','for']",
        "de": "['der','die','und','das','ist','nicht','ein','mit']",
        "fr": "['le','la','les','des','est','une','dans','pour']",
        "es": "['el','los','las','una','por','para','como','pero']",
    }
    ratios = ", ".join(
        f"CASE WHEN len(ts) > 0 THEN len(list_filter(ts, t -> list_contains({v}, t))) / len(ts) ELSE 0.0 END AS s_{k}"
        for k, v in _m.items()
    )
    sql["lang_id"] = f"""
        WITH t AS (SELECT doc_id, {_SQL_TOKS} AS ts FROM documents),
        s AS (SELECT doc_id, {ratios} FROM t),
        b AS (SELECT *, greatest(s_en, s_de, s_fr, s_es) AS best FROM s)
        SELECT doc_id,
               CASE WHEN best > 0 AND s_en = best THEN 'en'
                    WHEN best > 0 AND s_de = best THEN 'de'
                    WHEN best > 0 AND s_fr = best THEN 'fr'
                    WHEN best > 0 AND s_es = best THEN 'es'
                    ELSE 'und' END AS lang_guess
        FROM b
    """

    sql["doc_fingerprint"] = r"""
        SELECT doc_id,
               sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        FROM documents
    """

    sql["dedup_exact"] = r"""
        SELECT sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash,
               min(doc_id) AS doc_id,
               count(*)::bigint AS dup_count
        FROM documents GROUP BY 1
    """

    sql["ngram_jaccard"] = f"""
        WITH toks AS (
          SELECT doc_id, {_SQL_TOKS} AS ts FROM documents WHERE doc_id < 300
        ), sh AS (
          SELECT doc_id, unnest(
            list_distinct(
              CASE WHEN len(ts) >= 3 THEN
                list_transform(generate_series(1, len(ts) - 2),
                               i -> array_to_string(list_slice(ts, i, i + 2), ' '))
              ELSE [array_to_string(ts, ' ')] END
            )
          ) AS sh
          FROM toks
        ), sizes AS (
          SELECT doc_id, count(*)::bigint AS n_sh FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT l.doc_id AS a, r.doc_id AS b, count(*)::bigint AS inter
          FROM sh l JOIN sh r ON l.sh = r.sh AND l.doc_id < r.doc_id
          GROUP BY 1, 2
        )
        SELECT a, b,
               round(inter / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = a
        JOIN sizes sb ON sb.doc_id = b
        WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.2
    """


    _cc_ctes = f"""toks AS (
          SELECT doc_id, {_SQL_TOKS} AS ts FROM documents WHERE doc_id < 300
        ), sh AS (
          SELECT doc_id, unnest(
            list_distinct(
              CASE WHEN len(ts) >= 3 THEN
                list_transform(generate_series(1, len(ts) - 2),
                               i -> array_to_string(list_slice(ts, i, i + 2), ' '))
              ELSE [array_to_string(ts, ' ')] END
            )
          ) AS sh
          FROM toks
        ), sizes AS (
          SELECT doc_id, count(*)::bigint AS n_sh FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT l.doc_id AS a, r.doc_id AS b, count(*)::bigint AS inter
          FROM sh l JOIN sh r ON l.sh = r.sh AND l.doc_id < r.doc_id
          GROUP BY 1, 2
        ), pairs AS (
          SELECT a, b FROM inter
          JOIN sizes sa ON sa.doc_id = a
          JOIN sizes sb ON sb.doc_id = b
          WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.2
        ), edges AS (
          SELECT a AS src, b AS dst FROM pairs
          UNION
          SELECT b AS src, a AS dst FROM pairs
        ), reach(id, r) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst
        ), comp AS (
          SELECT id, min(r) AS component FROM reach GROUP BY id
        )"""

    sql["dedup_canonical"] = f"""
        WITH RECURSIVE {_cc_ctes}
        SELECT doc_id, n_chars FROM documents
        WHERE doc_id < 300
          AND doc_id NOT IN (SELECT id FROM comp WHERE id != component)
    """

    sql["dedup_clusters"] = f"""
        WITH RECURSIVE {_cc_ctes}
        SELECT id AS doc_id, component FROM comp
    """

    sql["embedding_cosine_topk"] = """
        WITH q AS (
          SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
        ), scored AS (
          SELECT e.vec_id,
                 list_reduce(list_transform(list_zip(e.embedding::DOUBLE[], q.qv),
                                            x -> x[1] * x[2]),
                             (acc, v) -> acc + v)
                 / (sqrt(list_reduce(list_transform(e.embedding::DOUBLE[], v -> v * v),
                                     (acc, v) -> acc + v))
                    * sqrt(list_reduce(list_transform(q.qv, v -> v * v),
                                       (acc, v) -> acc + v))) AS cosine
          FROM embeddings e CROSS JOIN q
          WHERE e.vec_id > 0
        )
        SELECT vec_id, round(cosine, 6) AS cosine
        FROM scored ORDER BY cosine DESC, vec_id LIMIT 10
    """

    _bm50 = _bm25_sql(_QUERY_TERMS, 50).strip()
    sql["hybrid_rrf"] = f"""
WITH bm AS (
  {_bm50}
), qv AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
), cos_scored AS (
  SELECT e.vec_id AS doc_id,
         round(list_reduce(list_transform(list_zip(e.embedding::DOUBLE[], qv.qv),
                                          x -> x[1] * x[2]),
                           (acc, v) -> acc + v)
               / (sqrt(list_reduce(list_transform(e.embedding::DOUBLE[], v -> v * v),
                                   (acc, v) -> acc + v))
                  * sqrt(list_reduce(list_transform(qv.qv, v -> v * v),
                                     (acc, v) -> acc + v))), 6) AS cosine
  FROM embeddings e CROSS JOIN qv
  WHERE e.vec_id > 0
), cos50 AS (
  SELECT doc_id, cosine FROM cos_scored
  ORDER BY cosine DESC, doc_id LIMIT 50
), ra AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM bm
), rb AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY cosine DESC, doc_id) AS r FROM cos50
), fused AS (
  SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
         round(coalesce(1.0 / (60 + ra.r), 0.0)
               + coalesce(1.0 / (60 + rb.r), 0.0), 6) AS rrf
  FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
)
SELECT doc_id, rrf FROM fused ORDER BY rrf DESC, doc_id LIMIT 20
"""

    _mf_toks = (
        "list_filter(string_split_regex(lower(concat_ws(' ', source, lang, "
        "substring(text, 1, 120))), '[^a-z0-9]+'), t -> t <> '')"
    )
    _mf_tlist = ", ".join(f"'{t}'" for t in _QUERY_TERMS)
    sql["multifield_search"] = f"""
WITH toks AS (
  SELECT doc_id, {_mf_toks} AS ts FROM documents
), dl AS (
  SELECT doc_id, len(ts)::bigint AS dl FROM toks
), stats AS (
  SELECT count(*)::bigint AS n_docs, sum(dl)::double / count(*) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, t AS term, count(*)::bigint AS tf
  FROM (SELECT doc_id, unnest(ts) AS t FROM toks)
  WHERE t IN ({_mf_tlist})
  GROUP BY doc_id, t
), dfs AS (
  SELECT term, count(*)::bigint AS df FROM tf GROUP BY term
), partial AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
         (tf.tf * (1.2 + 1.0)) /
         (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS p
  FROM tf
  JOIN dfs d USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
), scores AS (
  SELECT doc_id, sum(p ORDER BY term) AS rs
  FROM partial GROUP BY doc_id
)
SELECT doc_id, round(rs, 6) AS score
FROM scores ORDER BY rs DESC, doc_id LIMIT 20
"""

    sql["version_upsert"] = f"""
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN 2000 ELSE 1000 END::BIGINT
                 AS version,
               len(list_filter(string_split_regex(
                     lower(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
                                ELSE text END),
                     '[^a-z0-9]+'), t -> t <> ''))::BIGINT AS dl
        FROM documents WHERE doc_id < 1500
    """

    sql["frame_sample"] = """
        SELECT media_id,
               unnest(generate_series(0, duration_ms, 500))::BIGINT
                 AS frame_ts_ms
        FROM (
          SELECT doc_id AS media_id, (n_chars % 5000 + 1000) AS duration_ms
          FROM documents WHERE doc_id % 7 = 0
        )
    """

    return sql
