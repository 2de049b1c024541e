"""Query side: exact score-all BM25 and block-max top-k (WAND family).

The reference delegates query execution to Elasticsearch: per-shard
top-k + gather over the alias (README-EN.org:186-187, 252-258).  Ours:

- partition pruning: only the term-buckets of the query's terms are read
  (parquet ``bucket=`` partitions — the routing analogue of
  README-EN.org:120-121), and parquet row-group min/max stats on ``term``
  prune within a bucket,
- per-chunk scoring: posting blocks are chunk-aligned at build time, so
  each doc_id-range chunk holds *all* of a document's postings for every
  query term; chunks score independently in parallel inside
  ``applyInPandas`` (numpy), then a global (score desc, doc_id asc)
  merge takes the final k — the per-shard-topk + gather pattern,
- block-max pruning: per-block (max_tf, min_dl) gives a monotone score
  upper bound; terms are processed score-at-a-time in descending
  upper-bound order with MaxScore admission control (once remaining
  terms' upper bounds cannot lift a brand-new doc past the running
  k-th lower bound λ, new docs stop being admitted and only blocks
  intersecting the candidate set are decoded).

Rank identity with the exact scorer (BASELINE.json north_rule) holds
bit-for-bit because both paths share one formula module
(``functions.bm25``), score in float64, and sum each document's per-term
contributions sequentially in ascending-term order.
"""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import bm25
from ..functions.analyze import tokenize_code_py
from ..functions.bm25 import CorpusStats
from ..functions.codec import decode_varints


def analyze_query(text: str, analyzer: str = "code") -> list[tuple[str, int]]:
    """Query analysis with the same analyzer as the indexed field
    (lock-step with the index-side Arrow stage; per-field analyzers per
    README-EN.org:188-241); repeated terms become query-term weights
    (qtf).  Returns [(term, qtf)] sorted ascending by term."""
    from ..functions.analyze import analyzer_py

    counts = collections.Counter(analyzer_py(analyzer)(text))
    return sorted(counts.items())


# ---------------------------------------------------------------------------
# Exact score-all scorer (the oracle; also the O3 operator in SURVEY §2.6)
# ---------------------------------------------------------------------------

def exact_topk(
    spark: SparkSession,
    tf_df: DataFrame,
    stats: CorpusStats,
    term_dfs: dict[str, int],
    query_terms: list[tuple[str, int]],
    k: int,
    allowed: DataFrame | None = None,
    denied: DataFrame | None = None,
) -> DataFrame:
    """DataFrame-native exact BM25 top-k over a (term, doc_id, tf, dl) table.

    Deterministic float64: per-document contributions are collected,
    sorted by term, and folded sequentially (``F.aggregate``) — the same
    summation order the block-max scorer uses, so scores are
    bit-identical, not merely close.
    """
    rows = [
        (t, float(q), float(bm25.idf_py(term_dfs[t], stats.n_docs)))
        for t, q in query_terms
        if term_dfs.get(t)
    ]
    if not rows:
        return spark.createDataFrame([], "doc_id long, score double")
    q = spark.createDataFrame(rows, "term string, qtf double, idf double")
    j = tf_df.join(F.broadcast(q), "term")
    if allowed is not None:
        j = j.join(allowed.select("doc_id"), "doc_id", "left_semi")
    if denied is not None:
        j = j.join(denied.select("doc_id"), "doc_id", "left_anti")
    partial = (
        F.col("qtf") * F.col("idf")
        * bm25.tfnorm_col(F.col("tf"), F.col("dl"), stats.avgdl)
    ).alias("p")
    per_doc = (
        j.select("doc_id", "term", partial)
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("term", "p"))).alias("ps"))
        .select(
            "doc_id",
            F.aggregate(
                F.col("ps"), F.lit(0.0), lambda acc, x: acc + x["p"]
            ).alias("score"),
        )
    )
    return per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


# ---------------------------------------------------------------------------
# Block-max scorer (numpy, per chunk)
# ---------------------------------------------------------------------------

def _decode_block_rows(sub: pd.DataFrame):
    docs = np.concatenate(
        [np.cumsum(decode_varints(b)) for b in sub["docs"]]
    ).astype(np.uint64)
    tfs = np.concatenate([decode_varints(b) for b in sub["tfs"]])
    dls = np.concatenate([decode_varints(b) for b in sub["dls"]])
    return docs, tfs, dls


def _restrict(docs, *arrays, keep_sorted: np.ndarray, mode: str):
    """Keep (mode='allow') or drop (mode='deny') postings whose doc is in
    ``keep_sorted`` — vectorized membership via searchsorted."""
    if keep_sorted.size == 0:
        mask = np.zeros(docs.shape[0], bool) if mode == "allow" else None
        if mask is None:
            return (docs, *arrays)
        return (docs[mask], *[a[mask] for a in arrays])
    pos = np.searchsorted(keep_sorted, docs)
    pos = np.minimum(pos, keep_sorted.size - 1)
    member = keep_sorted[pos] == docs
    mask = member if mode == "allow" else ~member
    return (docs[mask], *[a[mask] for a in arrays])


def _score_chunk_pdf(
    postings: pd.DataFrame,
    qinfo: list[tuple[str, float, float]],  # (term, qtf, idf) asc by term
    stats: CorpusStats,
    k: int,
    filter_docs: np.ndarray | None,
    filter_mode: str,
) -> pd.DataFrame:
    """Block-max MaxScore over one doc_id chunk.  Exact scores for every
    surviving candidate; pruning only ever skips docs that provably cannot
    enter the top-k (upper bound < current k-th lower bound λ)."""
    by_term = {t: g for t, g in postings.groupby("term")}
    weights = {t: (qtf, idf) for t, qtf, idf in qinfo}

    # per-term max block upper bound, for ordering + admission control
    term_ub = {}
    for t, g in by_term.items():
        qtf, idf = weights[t]
        ubs = qtf * idf * (
            g["max_tf"].to_numpy(np.float64) * (bm25.K1 + 1.0)
            / (
                g["max_tf"].to_numpy(np.float64)
                + bm25.K1
                * (1.0 - bm25.B + bm25.B * g["min_dl"].to_numpy(np.float64) / stats.avgdl)
            )
        )
        term_ub[t] = float(ubs.max())
    order = sorted(term_ub, key=lambda t: (-term_ub[t], t))
    suffix = np.cumsum([term_ub[t] for t in order][::-1])[::-1]

    cand_docs = np.empty(0, dtype=np.uint64)
    cand_partial = np.empty(0, dtype=np.float64)
    contribs: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    for i, t in enumerate(order):
        g = by_term[t]
        qtf, idf = weights[t]
        lam = (
            -np.inf
            if cand_partial.size < k
            else float(np.partition(cand_partial, -k)[-k])
        )
        admit = not np.isfinite(lam) or suffix[i] >= lam
        if not admit:
            if cand_docs.size == 0:
                continue
            # block skip: only decode blocks intersecting the candidate set
            first = g["first_doc"].to_numpy(np.uint64)
            last = g["last_doc"].to_numpy(np.uint64)
            pos = np.searchsorted(cand_docs, first)
            # unclamped membership: a block whose range lies entirely
            # above the last candidate must NOT pass vacuously (a clamped
            # searchsorted made the boundary check always true and the
            # block-max pruning win was lost on that edge)
            in_range = pos < cand_docs.size
            hit = np.zeros(first.shape[0], dtype=bool)
            hit[in_range] = cand_docs[pos[in_range]] <= last[in_range]
            g = g[hit]
            if len(g) == 0:
                continue
        docs, tfs, dls = _decode_block_rows(g)
        if filter_docs is not None:
            docs, tfs, dls = _restrict(
                docs, tfs, dls, keep_sorted=filter_docs, mode=filter_mode
            )
        if not admit:
            docs, tfs, dls = _restrict(
                docs, tfs, dls, keep_sorted=cand_docs, mode="allow"
            )
        if docs.size == 0:
            continue
        scores = qtf * idf * bm25.tfnorm_np(tfs, dls, stats.avgdl)
        contribs[t] = (docs, scores)
        # merge into candidate accumulator
        merged = np.union1d(cand_docs, docs)
        new_partial = np.zeros(merged.shape[0], dtype=np.float64)
        if cand_docs.size:
            new_partial[np.searchsorted(merged, cand_docs)] = cand_partial
        new_partial[np.searchsorted(merged, docs)] += scores
        cand_docs, cand_partial = merged, new_partial
        # shrink: drop candidates that provably cannot reach λ
        if cand_partial.size > 4 * k and i + 1 < len(order):
            lam2 = float(np.partition(cand_partial, -k)[-k])
            keep = cand_partial + suffix[i + 1] >= lam2
            cand_docs, cand_partial = cand_docs[keep], cand_partial[keep]

    if cand_docs.size == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})

    # deterministic final sum: ascending term order, sequential adds
    final = np.zeros(cand_docs.shape[0], dtype=np.float64)
    for t, _, _ in qinfo:
        if t not in contribs:
            continue
        docs, scores = contribs[t]
        pos = np.searchsorted(cand_docs, docs)
        pos = np.minimum(pos, cand_docs.size - 1)
        member = cand_docs[pos] == docs
        np.add.at(final, pos[member], scores[member])
    sel = np.lexsort((cand_docs, -final))[:k]
    return pd.DataFrame(
        {"doc_id": cand_docs[sel].astype(np.int64), "score": final[sel]}
    )


TOPK_SCHEMA = "doc_id long, score double"


def blockmax_topk(
    spark: SparkSession,
    postings: DataFrame,
    stats: CorpusStats,
    term_dfs: dict[str, int],
    query_terms: list[tuple[str, int]],
    k: int,
    chunk_span: int,
    allowed: DataFrame | None = None,
    denied: DataFrame | None = None,
) -> DataFrame:
    """Distributed block-max top-k: per-chunk scoring + global merge.

    ``postings`` must already be filtered to the query's terms/buckets
    (the caller does that so predicate pushdown is visible in the plan).
    ``allowed``/``denied`` are doc_id DataFrames (filtered search /
    tombstones); they are cogrouped by chunk so each scoring task only
    sees its own chunk's filter slice.
    """
    qinfo = [
        (t, float(q), float(bm25.idf_py(term_dfs[t], stats.n_docs)))
        for t, q in query_terms
        if term_dfs.get(t)
    ]
    if not qinfo:
        return spark.createDataFrame([], TOPK_SCHEMA)

    # The scoring exchange carries only posting BLOCK rows — a few KB
    # per chunk — so AQE partition coalescing (sized for shuffled
    # BYTES) folds every chunk into one or two post-shuffle partitions
    # and the numpy scoring, the expensive part, runs SERIALLY in a
    # single Python task (measured 2x on the 8-query bench batch:
    # 7.6-9.0 s coalesced vs 3.7-4.4 s spread).  An explicit
    # repartition by chunk pins the scoring width: user-specified
    # repartitions are exempt from AQE coalescing, and the width
    # follows spark.sql.shuffle.partitions so it scales with the
    # cluster, not a local constant (guide §2.2: parallelize by CPU
    # cost, not bytes).
    try:
        n_score = int(str(spark.conf.get("spark.sql.shuffle.partitions")))
    except (TypeError, ValueError):
        n_score = max(1, spark.sparkContext.defaultParallelism)
    postings = postings.repartition(n_score, "chunk")

    if allowed is not None or denied is not None:
        side = allowed if allowed is not None else denied
        mode = "allow" if allowed is not None else "deny"
        side = side.select(
            F.expr(f"doc_id div {int(chunk_span)}").alias("chunk"), "doc_id"
        ).repartition(n_score, "chunk")

        def score_co(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if len(left) == 0:
                return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                     "score": pd.Series(dtype="float64")})
            fdocs = np.sort(right["doc_id"].to_numpy(np.uint64))
            return _score_chunk_pdf(left, qinfo, stats, k, fdocs, mode)

        scored = (
            postings.groupby("chunk")
            .cogroup(side.groupby("chunk"))
            .applyInPandas(score_co, TOPK_SCHEMA)
        )
    else:

        def score(pdf: pd.DataFrame) -> pd.DataFrame:
            return _score_chunk_pdf(pdf, qinfo, stats, k, None, "allow")

        scored = postings.groupBy("chunk").applyInPandas(score, TOPK_SCHEMA)

    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    score_a: str,
    score_b: str,
    k: int = 20,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked result lists (Cormack et
    al., SIGIR 2009 — the standard score-free way to combine lexical
    and vector retrieval): fused(d) = 1/(c + rank_a(d)) +
    1/(c + rank_b(d)), summed over the lists that contain d.

    Ranks are assigned by (score desc, id asc) — the id tiebreak makes
    fusion deterministic across partitionings and engines.  Inputs are
    top-N lists (bounded by their own k), so the single-partition rank
    window is driver-bounded BY CONSTRUCTION — this operator fuses
    retrieval results, it does not rank a corpus.  At 100 TB the heavy
    lifting (block-max BM25, partition-pruned ANN) happened upstream;
    fusion touches 2N rows."""
    from pyspark.sql import Window

    ra = a.select(
        F.col(id_col),
        F.row_number().over(
            Window.orderBy(F.desc(score_a), F.asc(id_col))
        ).alias("_rank_a"),
    )
    rb = b.select(
        F.col(id_col),
        F.row_number().over(
            Window.orderBy(F.desc(score_b), F.asc(id_col))
        ).alias("_rank_b"),
    )
    fused = (
        ra.join(rb, id_col, "full_outer")
        .select(
            id_col,
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(float(c)) + F.col("_rank_a")),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(float(c)) + F.col("_rank_b")),
                    F.lit(0.0),
                )
            ).alias("_rrf"),
        )
        .select(id_col, F.round("_rrf", 6).alias("rrf"))
    )
    return fused.orderBy(F.desc("rrf"), F.asc(id_col)).limit(k)


# ---------------------------------------------------------------------------
# Phrase search (match_phrase analogue — ES delegates this to positional
# postings; we verify positions on a pruned candidate set instead, so the
# index stays position-free and the verification cost is bounded by the
# rarest term's document frequency, not the corpus)
# ---------------------------------------------------------------------------

def phrase_count(ts, phrase: list[str]):
    """Column: number of occurrences (overlap-aware) of the consecutive
    token sequence ``phrase`` inside array column ``ts``.

    Pure higher-order functions — `sequence` + `filter` + `element_at`
    stay inside whole-stage codegen; no UDF, no shuffle.  Guarded so
    docs shorter than the phrase count 0 (Spark's ``sequence(1, 0)``
    would otherwise generate a DESCENDING range)."""
    import functools
    import operator

    ts = F.col(ts) if isinstance(ts, str) else ts
    m = len(phrase)
    if m == 0:
        return F.lit(0)

    def _match_at(i):
        return functools.reduce(
            operator.and_,
            [
                F.element_at(ts, (i + F.lit(j)).cast("int")) == F.lit(phrase[j])
                for j in range(m)
            ],
        )

    return F.when(
        F.size(ts) >= m,
        F.size(
            F.filter(
                F.sequence(F.lit(1), F.size(ts) - F.lit(m - 1)), _match_at
            )
        ),
    ).otherwise(F.lit(0))


def phrase_count_np(ts, phrase: list[str]):
    """Vectorized twin of ``phrase_count`` — identical integer counts.

    Spark's higher-order functions evaluate INTERPRETED (per-position
    lambda dispatch); verifying a phrase over 100k candidate docs of
    ~500 tokens each is ~10^8 interpreted evals and dominated the
    phrase query (guide §4.2).  This kernel slides numpy equality
    masks over each token array — C-speed comparisons, exact overlap-
    aware counts, same null/short-doc semantics (0).  Marked
    non-deterministic so the ``_ptf > 0`` filter cannot duplicate the
    evaluation (guide §4.4)."""
    p = list(phrase)
    m = len(p)
    ts = F.col(ts) if isinstance(ts, str) else ts
    if m == 0:
        return F.lit(0)

    @F.pandas_udf("int")
    def _cnt(col: pd.Series) -> pd.Series:
        out = np.zeros(len(col), dtype=np.int32)
        for i, arr in enumerate(col):
            if arr is None:
                continue
            n = len(arr)
            if n < m:
                continue
            a = np.asarray(arr, dtype=object)
            mask = a[0:n - m + 1] == p[0]
            for j in range(1, m):
                mask = mask & (a[j:n - m + 1 + j] == p[j])
            out[i] = int(mask.sum())
        return pd.Series(out)

    return _cnt.asNondeterministic()(ts)


def phrase_prefix_count_np(ts, head: list[str], prefix: str):
    """Vectorized twin of ``phrase_prefix_count`` (same §4.2/§4.4
    rationale as ``phrase_count_np``): occurrences of
    ``head + <term starting with prefix>`` as consecutive tokens."""
    h = list(head)
    m = len(h) + 1
    ts = F.col(ts) if isinstance(ts, str) else ts

    @F.pandas_udf("int")
    def _cnt(col: pd.Series) -> pd.Series:
        out = np.zeros(len(col), dtype=np.int32)
        for i, arr in enumerate(col):
            if arr is None:
                continue
            n = len(arr)
            if n < m:
                continue
            a = np.asarray(arr, dtype=object)
            mask = np.fromiter(
                (isinstance(x, str) and x.startswith(prefix)
                 for x in a[m - 1:n]),
                dtype=bool, count=n - m + 1,
            )
            for j, t in enumerate(h):
                mask = mask & (a[j:n - m + 1 + j] == t)
            out[i] = int(mask.sum())
        return pd.Series(out)

    return _cnt.asNondeterministic()(ts)


def phrase_topk(
    toks: DataFrame,
    ts_col: str,
    id_col: str,
    phrase: list[str],
    k: int = 20,
    n_docs: int | None = None,
    avgdl: float | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Exact phrase top-k over a tokenized corpus: docs containing the
    consecutive token sequence, scored as BM25 of the phrase treated as
    one pseudo-term (tf = phrase occurrences, df = docs containing the
    phrase — Lucene's PhraseQuery scoring shape, one shared formula
    module ``functions.bm25``).

    Plan: (1) stats pass unless (n_docs, avgdl) are supplied by the
    caller (SearchIndex passes manifest stats — zero extra jobs);
    (2) conjunctive `array_contains` prefilter short-circuits the
    positional scan for docs missing any phrase term (predicate-only,
    no shuffle); (3) the phrase-df denominator joins back as a
    broadcast 1-row agg, NOT a driver count — one lazy plan end to end.
    Returns (id_col, score) rounded to 6, tie-broken by id."""
    m = len(phrase)
    # id dtype follows the input (ADVICE r5: nothing restricts id_col
    # to long — a string-keyed corpus must get a string-typed empty)
    id_type = toks.schema[id_col].dataType.simpleString()
    empty = toks.sparkSession.createDataFrame(
        [], f"{id_col} {id_type}, score double"
    )
    if m == 0:
        return empty
    base = toks.select(
        F.col(id_col), F.col(ts_col).alias("_ts")
    ).withColumn("_dl", F.size("_ts").cast("long"))
    if n_docs is None or avgdl is None:
        srow = base.agg(
            F.count("*").alias("n"),
            (F.sum("_dl").cast("double") / F.count("*")).alias("a"),
        ).head()
        n_docs, avgdl = int(srow["n"]), float(srow["a"])
    if n_docs == 0:
        return empty
    cand = base
    for t in sorted(set(phrase)):
        cand = cand.filter(F.array_contains("_ts", t))
    cand = (
        cand.withColumn("_ptf", phrase_count_np(F.col("_ts"), phrase))
        .filter(F.col("_ptf") > 0)
        .select(id_col, "_dl", "_ptf")
    )
    # ``cand`` feeds BOTH the phrase-df denominator and the scored rows;
    # without materialization the whole verification pipeline (source
    # scan + analyze + positional filter) executes twice — once under
    # the broadcast agg, once for the rows (guide §7.2 duplicated
    # subtrees; measured 2x the phrase cost on the source-join path).
    # persist() runs it once: the denominator job populates the cache
    # of the tiny verified (id, dl, ptf) triples, the row side reads
    # it.  Callers whose ``toks`` is already a cheap pruned read (the
    # token-store path) pass materialize=False — cache substitution
    # hides the scan from ``inputFiles()``, and the chunk-pruning
    # evidence gate matters more there than the small double read.
    if materialize:
        cand = cand.persist()
    dfp = cand.agg(F.count("*").alias("_dfp"))
    scored = cand.crossJoin(F.broadcast(dfp)).select(
        F.col(id_col),
        F.round(
            bm25.idf_col(F.col("_dfp"), n_docs)
            * bm25.tfnorm_col(F.col("_ptf"), F.col("_dl"), avgdl),
            6,
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def phrase_prefix_count(ts, head: list[str], prefix: str):
    """Column: occurrences of ``head + <any term starting with prefix>``
    as consecutive tokens in array column ``ts`` (ES match_phrase_prefix
    position semantics: the last position matches by prefix).  Same
    codegen-only shape as ``phrase_count`` — higher-order functions, no
    UDF, no shuffle."""
    import functools
    import operator

    ts = F.col(ts) if isinstance(ts, str) else ts
    m = len(head) + 1

    def _match_at(i):
        conds = [
            F.element_at(ts, (i + F.lit(j)).cast("int")) == F.lit(head[j])
            for j in range(len(head))
        ]
        conds.append(
            F.element_at(
                ts, (i + F.lit(m - 1)).cast("int")
            ).startswith(prefix)
        )
        return functools.reduce(operator.and_, conds)

    return F.when(
        F.size(ts) >= m,
        F.size(
            F.filter(
                F.sequence(F.lit(1), F.size(ts) - F.lit(m - 1)), _match_at
            )
        ),
    ).otherwise(F.lit(0))


def phrase_prefix_topk(
    toks: DataFrame,
    ts_col: str,
    id_col: str,
    head: list[str],
    prefix: str,
    k: int = 20,
    n_docs: int | None = None,
    avgdl: float | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Exact match_phrase_prefix top-k over a tokenized corpus: docs
    where ``head`` is immediately followed by any term starting with
    ``prefix``, scored like ``phrase_topk`` (BM25 of the phrase-prefix
    as one pseudo-term: tf = occurrences, df = docs with >= 1)."""
    if prefix == "":
        return phrase_topk(toks, ts_col, id_col, head, k,
                           n_docs=n_docs, avgdl=avgdl,
                           materialize=materialize)
    id_type = toks.schema[id_col].dataType.simpleString()
    empty = toks.sparkSession.createDataFrame(
        [], f"{id_col} {id_type}, score double"
    )
    base = toks.select(
        F.col(id_col), F.col(ts_col).alias("_ts")
    ).withColumn("_dl", F.size("_ts").cast("long"))
    if n_docs is None or avgdl is None:
        srow = base.agg(
            F.count("*").alias("n"),
            (F.sum("_dl").cast("double") / F.count("*")).alias("a"),
        ).head()
        n_docs, avgdl = int(srow["n"]), float(srow["a"])
    if n_docs == 0:
        return empty
    cand = base
    for t in sorted(set(head)):
        cand = cand.filter(F.array_contains("_ts", t))
    cand = cand.filter(
        F.exists("_ts", lambda x: x.startswith(prefix))
    )
    cand = (
        cand.withColumn(
            "_ptf", phrase_prefix_count_np(F.col("_ts"), head, prefix)
        )
        .filter(F.col("_ptf") > 0)
        .select(id_col, "_dl", "_ptf")
    )
    # run the verification pipeline once for both consumers (see
    # phrase_topk — the same duplicated-subtree trade-off)
    if materialize:
        cand = cand.persist()
    dfp = cand.agg(F.count("*").alias("_dfp"))
    scored = cand.crossJoin(F.broadcast(dfp)).select(
        F.col(id_col),
        F.round(
            bm25.idf_col(F.col("_dfp"), n_docs)
            * bm25.tfnorm_col(F.col("_ptf"), F.col("_dl"), avgdl),
            6,
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def facet_counts(
    matches: DataFrame, facet_cols: list[str], top_n: int | None = None
) -> DataFrame:
    """ES terms-aggregation analogue over a match set: per-facet value
    counts, one frame (facet, value, cnt).

    All facets are counted in ONE map-side-combined groupBy over a
    melt (``explode`` of per-facet structs) of the match set.  The
    previous per-facet groupBy + union evaluated the whole match-set
    subtree (pruned posting read + joins) once PER FACET — duplicated
    subtrees, guide §7.2 — while the melt costs one pass and one
    aggregation whose row count is matches x facets of tiny (facet,
    value) pairs.  ``top_n`` bounds each facet's bucket list like ES's
    ``size`` (rank by cnt desc, value asc — deterministic across
    engines); output rows/order are identical to the union version.
    At scale the match set is the output of a pruned posting read, so
    facet cost is O(matches), never O(corpus)."""
    from pyspark.sql import Window

    melted = matches.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("facet"),
                    F.col(c).cast("string").alias("value"),
                )
                for c in facet_cols
            ])
        ).alias("fv")
    ).select("fv.facet", "fv.value")
    out = melted.groupBy("facet", "value").agg(F.count("*").alias("cnt"))
    if top_n is not None:
        out = (
            out.withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy("facet")
                    .orderBy(F.desc("cnt"), F.asc("value"))
                ),
            )
            .filter(F.col("_rk") <= top_n)
            .drop("_rk")
        )
    return out.orderBy("facet", F.desc("cnt"), "value")
