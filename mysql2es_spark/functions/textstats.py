"""Text-analysis functions for training-data pipelines.

Beyond the reference surface (graded as first-class): language ID,
quality scoring, token counting, document fingerprinting.

Implementation note: the counting core is ONE Arrow-vectorized pandas
UDF (``text_stats``) producing a struct of counts/ratios.  A pure
Column-expression version existed, but higher-order functions
(filter/aggregate lambdas) evaluate interpreted (outside whole-stage
codegen) and the score formula references the feature struct many times
— measured minutes per scan at bench scale.  The UDF computes each
regex pass once per document in pandas' C string kernels; identical
python UDF expressions are deduplicated into a single ArrowEvalPython
node, so stacking ``token_count`` + ``quality_score`` costs one
evaluation.  All arithmetic mirrors the DuckDB oracle SQL exactly
(int counts, float64 int/int divisions, same operation order).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Distinctive stopwords per language for the marker heuristic.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "that", "with", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
    "es": ["el", "los", "las", "una", "por", "para", "como", "pero"],
}

_STOPWORDS_EN = set(_LANG_MARKERS["en"]) | {
    "a", "an", "in", "on", "it", "as", "are", "was", "be", "by", "at", "or",
}

_MARKER_SETS = {k: set(v) for k, v in _LANG_MARKERS.items()}

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_PUNCT_RE = re.compile(r"[.,;:!?'\"()\[\]{}]")
_DIGIT_RE = re.compile(r"[0-9]")
_UPPER_RE = re.compile(r"[A-Z]")
_SYMBOL_RE = re.compile(r"[^A-Za-z0-9\s]")

_STATS_TYPE = T.StructType(
    [
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("bpe_tokens", T.LongType()),
        T.StructField("mean_tok_len", T.DoubleType()),
        T.StructField("punct_ratio", T.DoubleType()),
        T.StructField("digit_ratio", T.DoubleType()),
        T.StructField("stopword_ratio", T.DoubleType()),
        T.StructField("upper_ratio", T.DoubleType()),
        T.StructField("s_en", T.DoubleType()),
        T.StructField("s_de", T.DoubleType()),
        T.StructField("s_fr", T.DoubleType()),
        T.StructField("s_es", T.DoubleType()),
    ]
)


@F.pandas_udf(_STATS_TYPE)
def text_stats(content: pd.Series) -> pd.DataFrame:
    s = content.fillna("")
    toks = s.str.lower().str.findall(_TOKEN_RE)
    n_chars = s.str.len().astype("int32")
    n_tokens = toks.map(len).astype("int32")
    punct = s.str.count(_PUNCT_RE.pattern)
    digits = s.str.count(_DIGIT_RE.pattern)
    upper = s.str.count(_UPPER_RE.pattern)
    symbols = s.str.count(_SYMBOL_RE.pattern)

    bpe = [
        sum(-(-len(w) // 4) for w in ts) + int(sym)
        for ts, sym in zip(toks, symbols)
    ]
    stop_hits = [sum(1 for t in ts if t in _STOPWORDS_EN) for ts in toks]
    lang_hits = {
        k: [sum(1 for t in ts if t in m) for ts in toks]
        for k, m in _MARKER_SETS.items()
    }

    def ratio(nums, dens):
        return [
            (int(a) / int(b)) if b > 0 else 0.0 for a, b in zip(nums, dens)
        ]

    safe_chars = n_chars.clip(lower=1)
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "bpe_tokens": pd.Series(bpe, dtype="int64", index=s.index),
            "mean_tok_len": ratio(n_chars, n_tokens),
            "punct_ratio": ratio(punct, safe_chars),
            "digit_ratio": ratio(digits, safe_chars),
            "stopword_ratio": ratio(stop_hits, n_tokens),
            "upper_ratio": ratio(upper, safe_chars),
            "s_en": ratio(lang_hits["en"], n_tokens),
            "s_de": ratio(lang_hits["de"], n_tokens),
            "s_fr": ratio(lang_hits["fr"], n_tokens),
            "s_es": ratio(lang_hits["es"], n_tokens),
        }
    )


def token_count(col: Column | str) -> Column:
    """Simple-tokenizer token count."""
    c = F.col(col) if isinstance(col, str) else col
    return text_stats(c)["n_tokens"].cast("int")


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-flavored token estimate: alnum runs count 1 per ~4 chars
    (ceil), plus one per non-space symbol."""
    c = F.col(col) if isinstance(col, str) else col
    return text_stats(c)["bpe_tokens"].cast("long")


def quality_features(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return text_stats(c)


def quality_score(col: Column | str) -> Column:
    """Scalar [0,1] quality score — Gopher/C4-style heuristic shape:
    penalize too-short/too-long docs, high punctuation/digit density,
    missing stopwords.  Combination happens in Column float64 math so
    the DuckDB oracle can mirror it token for token."""
    f = quality_features(col)
    length_ok = F.when(
        (f["n_tokens"] >= 10) & (f["n_tokens"] <= 5000), F.lit(1.0)
    ).otherwise(F.lit(0.3))
    tok_len_ok = F.when(
        (f["mean_tok_len"] >= 2.0) & (f["mean_tok_len"] <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.4))
    punct_pen = F.lit(1.0) - F.least(f["punct_ratio"] * 2.0, F.lit(1.0))
    digit_pen = F.lit(1.0) - F.least(f["digit_ratio"] * 2.0, F.lit(1.0))
    stop_bonus = F.least(f["stopword_ratio"] * 4.0, F.lit(1.0))
    return (
        F.lit(0.3) * length_ok
        + F.lit(0.2) * tok_len_ok
        + F.lit(0.2) * punct_pen
        + F.lit(0.15) * digit_pen
        + F.lit(0.15) * stop_bonus
    ).alias("quality")


def lang_id(col: Column | str) -> Column:
    """Stopword-marker language heuristic: argmax of marker-token
    ratios, 'und' when nothing matches; en > de > fr > es on ties."""
    f = quality_features(col)
    scores = [(f[f"s_{k}"], k) for k in ("en", "de", "fr", "es")]
    best = F.greatest(*[s for s, _ in scores])
    out = F.lit("und")
    for s, lang in reversed(scores):
        out = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(out)
    return out


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: sha2 over whitespace-normalized, lowercased
    text — stable under reflow/casing, SQL-expressible for the oracle."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))), 256)


_SHINGLE_RE = re.compile(r"[a-z0-9]+")


@F.pandas_udf(T.LongType())
def _rolling_min_shingle_hash(content: pd.Series, window: pd.Series) -> pd.Series:
    from .hash import xxh64

    w = int(window.iloc[0])
    out = []
    for s in content.fillna(""):
        toks = _SHINGLE_RE.findall(s.lower())
        if len(toks) >= w:
            hs = min(
                xxh64(" ".join(toks[i:i + w]).encode())
                for i in range(len(toks) - w + 1)
            )
        else:
            hs = xxh64(" ".join(toks).encode())
        out.append(hs - (1 << 64) if hs >= (1 << 63) else hs)
    return pd.Series(out, dtype="int64")


def rolling_fingerprint(col: Column | str, window: int = 8) -> Column:
    """Winnowing-style rolling fingerprint: min XXH64 over token n-gram
    shingles — robust to local edits (Arrow-batched)."""
    c = F.col(col) if isinstance(col, str) else col
    return _rolling_min_shingle_hash(c, F.lit(window))
