"""Inverted-index build: tokenize -> tf/df -> salted posting encode.

This is the native replacement for everything the reference delegates to
Elasticsearch (README-EN.org:238-241 analyzed text fields,
README-EN.org:186-187 shard partitioning, README-EN.org:120-121 routing):

- documents are assigned deterministic dense ``doc_id``s without a global
  sort (partition-offset rebase — SURVEY.md §7 hard part 3),
- term frequencies/document frequencies are plain hash aggregations
  (partial + final, whole-stage codegen),
- postings are hash-partitioned by ``bucket = pmod(xxhash64(term), B)``
  (the shard-routing analogue) and encoded in ``applyInPandas`` into
  delta+varint blocks with per-block (max_tf, min_dl) metadata for
  block-max scoring,
- hot terms (df above a threshold — e.g. 'import', 'return' in code)
  are salted by *doc_id range*, so each (term, salt) group encodes an
  independent, disjoint doc_id interval and the salted sub-lists are
  re-merged for free: blocks are rows, and the term's full posting list
  is just its block rows ordered by first_doc (SURVEY.md §4.2).

Shuffle inventory for a full build (the plan that must survive 100 TB):
  1. repartition(P, doc_key)         -- doc_id assignment, P fixed by config
  2. groupBy(term, doc_id)           -- tf aggregation (partial agg first)
  3. groupBy(term, salt)             -- posting encode groups
Everything else is narrow.  ``content`` is dropped immediately after
tokenization so no shuffle ever carries raw file bodies (SURVEY.md §4.1).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.analyze import tokenize_code
from ..functions.codec import encode_tfs, encode_varints


@dataclass(frozen=True)
class IndexConfig:
    n_buckets: int = 32          # term routing partitions (ES number_of_shards analogue)
    block_size: int = 128        # docs per posting block
    salt_threshold: int = 50_000 # df above which a term is salted
    n_salts: int = 8             # doc_id-range slices for hot terms
    id_partitions: int = 32      # fixed partition count for doc_id assignment
                                 # (fixed => ids independent of cluster size)
    chunk_span: int = 8192       # doc_id range per scoring chunk; blocks are
                                 # cut at chunk boundaries so every doc's
                                 # postings for ALL terms land in one chunk
                                 # => chunks score independently in parallel
    broadcast_id_threshold: int = 1_000_000
                                 # doc count under which the (doc_key ->
                                 # doc_id) map broadcasts into the tf join
                                 # (typical incremental deltas), so the tf
                                 # table never shuffles for id assignment;
                                 # above it (initial 10^12-file builds) the
                                 # join falls back to a hash shuffle of the
                                 # compact tf rows
    validate_replays: bool = False
                                 # debug guard (ADVICE r3): the engine
                                 # assumes a replayed (doc_key, version)
                                 # is byte-identical to the original —
                                 # with this on, a build fails (before
                                 # publishing) if any key carries two
                                 # distinct content hashes, instead of
                                 # picking an arbitrary winner
    dict_cache_max_terms: int = 2_000_000
                                 # term count under which SearchIndex
                                 # caches the whole dictionary driver-side
                                 # (zero-job df lookup); above it — the
                                 # 10^12-file regime — queries fall back
                                 # to bucket-pruned Spark dictionary reads
    token_store: bool = False
                                 # opt-in per-segment chunk-partitioned
                                 # (doc_id, tokens) store so phrase
                                 # verification / MLT-by-id read only the
                                 # candidate chunks instead of the source
                                 # corpus (VERDICT r5 #2).  Costs ~one
                                 # tokenized copy of each text field on
                                 # disk and one extra analysis pass at
                                 # build time; worth it for phrase-heavy
                                 # indexes, skip it otherwise (queries
                                 # fall back to the source-join path)


_MID_MASK = (1 << 33) - 1


def build_doc_id_map(
    df: DataFrame, base: int, cfg: IndexConfig,
    carry: tuple[str, ...] = (),
    latest_by: str | None = None,
    tiebreak: str | None = None,
) -> tuple[DataFrame, int]:
    """(doc_key, doc_id) map with dense deterministic ids.

    ``df`` must be DISTINCT on doc_key — one id is minted per row, so a
    duplicate key here would mint two ids for one document — UNLESS
    ``latest_by`` names a column: then duplicate keys are collapsed to
    the row with the max ``latest_by`` value (winner-per-key upsert
    dedupe, README-EN.org:78-79) *inside the same shuffle* that orders
    ids — the window's required distribution/sort matches the
    repartition+sort already here, so dedupe costs no extra Exchange.
    ``carry`` names narrow extra columns (e.g. the winning ``version``)
    to ride along through the shuffle+sort into the output map.
    ``tiebreak`` (ADVICE r3) adds a deterministic secondary order for
    rows sharing (doc_key, latest_by) — e.g. ``commit`` — so the winner
    whose content lands in the docstore is the same winner whose
    postings get indexed, even when a replay violates the
    same-key-same-version-implies-identical-bytes assumption.

    Only narrow key columns flow through the shuffle+sort (column pruning
    keeps content out of it entirely).  Hash-repartition into a *fixed*
    number of partitions (independent of cluster size), sort within each
    partition, tag rows with ``monotonically_increasing_id`` — Spark
    documents its layout as (partition id << 33) | in-partition ordinal,
    and the ordinal follows the post-sort iteration order (the expression
    is non-deterministic, so Catalyst never reorders it across the sort).
    A light counting job recovers per-partition counts; a broadcast
    offset map rebases ordinals to dense global ids.  Deterministic
    across parallelism levels (fixed partition count + per-partition
    sort, SURVEY.md §7 hard part 3)."""
    sel = df.select("doc_key", *carry).repartition(
        cfg.id_partitions, "doc_key"
    )
    if latest_by is not None:
        # same-key rows are co-partitioned by the repartition above, so
        # the window needs no new Exchange; its sort (doc_key, latest_by
        # desc) leaves survivors ordered by doc_key — exactly the order
        # the id assignment wants
        order = [F.desc(latest_by)]
        if tiebreak is not None:
            order.append(F.desc(tiebreak))
        w = Window.partitionBy("doc_key").orderBy(*order)
        sel = (
            sel.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        sel = sel.sortWithinPartitions("doc_key")
    parted = sel.withColumn("_mid", F.monotonically_increasing_id())
    counts = {
        int(r["_pid"]): int(r["cnt"])
        for r in parted.groupBy(
            F.shiftright("_mid", 33).alias("_pid")
        ).agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )
    ids = (
        parted.withColumn("_pid", F.shiftright("_mid", 33).cast("int"))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(
            "doc_id",
            F.lit(base).cast("long")
            + F.col("_off")
            + F.col("_mid").bitwiseAND(F.lit(_MID_MASK)),
        )
        .select("doc_key", *carry, "doc_id")
    )
    return ids, acc


def assign_doc_ids(
    df: DataFrame, base: int, cfg: IndexConfig
) -> tuple[DataFrame, int]:
    """Attach deterministic dense doc_ids.

    The id map is built on a column-pruned (doc_key-only) plan — the
    shuffle+sort that orders ids never carries content.  The map joins
    back by doc_key; Catalyst auto-broadcasts small maps (tests, small
    deltas) and sort-merge-joins large ones.  (An explicit broadcast of
    large maps measured *slower* than the co-partitioned join at 32
    threads — A/B'd in-session: 97s vs 42.6s for a 400k-doc build.)"""
    ids, acc = build_doc_id_map(df, base, cfg)
    return df.join(ids, "doc_key"), acc


def tokenize_stage(df: DataFrame) -> DataFrame:
    """Arrow-batched code tokenization; drops ``content`` immediately so
    downstream shuffles never carry raw file bodies."""
    return (
        df.withColumn("tokens", tokenize_code(F.col("content")))
        .withColumn("dl", F.size("tokens").cast("long"))
        .drop("content")
    )


def build_tf(tokens_df: DataFrame) -> DataFrame:
    """(term, doc_id, tf, dl) — partial+final hash agg (A3 in SURVEY §2.4)."""
    return (
        tokens_df.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").alias("tf"))
    )


def build_df_stats(tf_df: DataFrame) -> DataFrame:
    """(term, df) document frequencies (A4)."""
    return tf_df.groupBy("term").agg(F.count("*").alias("df"))


def term_bucket(col, n_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


POSTING_SCHEMA = (
    "term string, bucket int, chunk long, n int, first_doc long, "
    "last_doc long, max_tf int, min_dl int, docs binary, tfs binary, dls binary"
)

_POSTING_COLS = [
    "term", "bucket", "chunk", "n", "first_doc", "last_doc",
    "max_tf", "min_dl", "docs", "tfs", "dls",
]


def _encode_group(pdf: pd.DataFrame, block_size: int, chunk_span: int) -> pd.DataFrame:
    """Encode one (term, salt) group's postings into block rows.

    Stores doc gaps + tfs + dls as varints per block (dls ride along so
    scoring never joins the doc store in the hot path).  Blocks are cut at
    ``chunk_span`` doc_id boundaries: every block lies entirely within one
    chunk, so a document's postings for *all* terms land in the same chunk
    and chunks can be scored independently in parallel (per-chunk top-k,
    then a global merge, is exact).
    """
    term = pdf["term"].iloc[0]
    bucket = int(pdf["bucket"].iloc[0])
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.uint64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.uint64)
    dls = pdf["dl"].to_numpy()[order].astype(np.uint64)
    if doc_ids.size > 1:
        # defense-in-depth: a doc_key replayed twice inside one batch
        # would duplicate its tf rows; posting lists must be strictly
        # increasing, so keep the first occurrence per doc (dupes are
        # byte-identical rows — same key implies same commit/content)
        dup = doc_ids[1:] == doc_ids[:-1]
        if dup.any():
            keep = np.concatenate(([True], ~dup))
            doc_ids, tfs, dls = doc_ids[keep], tfs[keep], dls[keep]
    chunks = (doc_ids // np.uint64(chunk_span)).astype(np.int64)
    # block boundaries: every `block_size` docs AND every chunk change
    # (vectorized: find chunk runs, then stride block_size within each run)
    n_docs = len(doc_ids)
    run_starts = np.concatenate(([0], np.nonzero(chunks[1:] != chunks[:-1])[0] + 1))
    run_ends = np.concatenate((run_starts[1:], [n_docs]))
    cuts = np.concatenate(
        [np.arange(s, e, block_size) for s, e in zip(run_starts, run_ends)]
        + [np.array([n_docs])]
    )
    rows = []
    for s, e in zip(cuts[:-1], cuts[1:]):
        d, t, l = doc_ids[s:e], tfs[s:e], dls[s:e]
        gaps = np.empty_like(d)
        gaps[0] = d[0]
        np.subtract(d[1:], d[:-1], out=gaps[1:])
        rows.append(
            (
                term, bucket, int(chunks[s]), int(e - s), int(d[0]), int(d[-1]),
                int(t.max()), int(l.min()),
                encode_varints(gaps), encode_tfs(t), encode_varints(l),
            )
        )
    return pd.DataFrame(rows, columns=_POSTING_COLS)


def encode_postings(
    tf_df: DataFrame, cfg: IndexConfig, max_doc_id: int, min_doc_id: int = 0
) -> DataFrame:
    """tf table -> posting block rows.

    Salting (SURVEY §4.2): terms with df > threshold get
    ``salt = (doc_id - min) // span`` — *range-based*, so each salt's
    doc_id interval is disjoint and the merged posting list is simply the
    union of block rows (concat preserves sort by construction).  AQE's
    skew handling cannot split ``applyInPandas`` groups, hence the
    explicit salt.
    """
    dfs = build_df_stats(tf_df)
    hot = dfs.filter(F.col("df") > cfg.salt_threshold).select("term")
    span = max(1, (max_doc_id - min_doc_id + 1 + cfg.n_salts - 1) // cfg.n_salts)
    with_salt = (
        tf_df.join(F.broadcast(hot.withColumn("_hot", F.lit(1))), "term", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("_hot").isNotNull(),
                ((F.col("doc_id") - F.lit(min_doc_id)) / F.lit(span)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .withColumn("bucket", term_bucket(F.col("term"), cfg.n_buckets))
        .drop("_hot")
    )

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        return _encode_group(pdf, cfg.block_size, cfg.chunk_span)

    return with_salt.groupBy("term", "salt").applyInPandas(encode, POSTING_SCHEMA)


def finalize_blocks(blocks: DataFrame) -> DataFrame:
    """Re-number block_idx per term across salted groups.

    Salted groups each numbered their blocks from 0; global block order
    within a term is by first_doc (ranges disjoint).  block_idx is only
    informational — readers order by first_doc — so we just keep rows as
    they are; this hook exists for future per-term stats.
    """
    return blocks


def write_postings(blocks: DataFrame, path: str) -> None:
    """Segment layout: parquet partitioned by bucket (partition pruning for
    query terms == ES routing, README-EN.org:120-121), rows sorted by
    (term, first_doc) so parquet row-group min/max stats prune terms."""
    (
        blocks.repartition("bucket")
        .sortWithinPartitions("term", "first_doc")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
