"""BM25 scoring math — ONE shared definition used by every scorer.

Rank identity between the exact score-all scorer and block-max WAND
(BASELINE.json north_rule) is only well-defined if both use the exact
same formula, the same float64 arithmetic, and the same deterministic
summation order (terms ascending).  Both scorers therefore import from
here and sum per-document term scores in sorted-term order.

Formula (Lucene/ES practical BM25 — what the reference's ES delegate
computes, README-EN.org:238-241):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfnorm(t,d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(q,d)  = sum over t in q of idf(t) * tfnorm(t, d)

Defaults k1=1.2, b=0.75.  Tie order everywhere: (score desc, doc_id asc).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


@dataclass(frozen=True)
class CorpusStats:
    n_docs: int
    avgdl: float


def idf_py(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def idf_np(df: np.ndarray, n_docs: int) -> np.ndarray:
    df = df.astype(np.float64)
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def tfnorm_np(
    tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float = K1, b: float = B
) -> np.ndarray:
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def score_np(
    tf: np.ndarray,
    dl: np.ndarray,
    df: int,
    stats: CorpusStats,
    k1: float = K1,
    b: float = B,
) -> np.ndarray:
    """Per-(term,doc) float64 BM25 partial score."""
    return idf_py(df, stats.n_docs) * tfnorm_np(tf, dl, stats.avgdl, k1, b)


def upper_bound_py(
    max_tf: float, min_dl: float, df: int, stats: CorpusStats,
    k1: float = K1, b: float = B,
) -> float:
    """Monotone upper bound for a posting block: score is increasing in tf
    and decreasing in dl, so score(max_tf, min_dl) >= any score in the
    block.  Stable under segment merges (max/min are mergeable) and under
    corpus-stat drift at query time, because it is recomputed from
    (max_tf, min_dl, df) with the *current* stats."""
    denom = max_tf + k1 * (1.0 - b + b * min_dl / stats.avgdl)
    return idf_py(df, stats.n_docs) * max_tf * (k1 + 1.0) / denom


def idf_col(df_col: Column, n_docs: int) -> Column:
    """JVM-side idf (float64) for the DataFrame-native exact scorer."""
    d = df_col.cast("double")
    return F.log1p((F.lit(float(n_docs)) - d + F.lit(0.5)) / (d + F.lit(0.5)))


def tfnorm_col(tf_col: Column, dl_col: Column, avgdl: float,
               k1: float = K1, b: float = B) -> Column:
    tf = tf_col.cast("double")
    dl = dl_col.cast("double")
    return (tf * F.lit(k1 + 1.0)) / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(float(avgdl)))
    )


def bm25_sql(n_docs: int, avgdl: float, k1: float = K1, b: float = B) -> str:
    """ANSI-SQL fragment for the DuckDB oracle: per-(term,doc) partial
    score given columns ``tf``, ``dl``, ``df``.  Mirrors the formula above
    token for token so DuckDB float64 arithmetic matches Spark's."""
    return (
        f"ln(1.0 + ({n_docs} - df + 0.5) / (df + 0.5)) * "
        f"(tf * ({k1} + 1.0)) / "
        f"(tf + {k1} * (1.0 - {b} + {b} * dl / {avgdl!r}))"
    )
