"""Source-code corpus source: deterministic synthesis + snapshot-log reads.

The engine's primary input is an Iceberg table of source-code repositories
with columns (repo, path, commit, lang, content) — BASELINE.json
input_hint.  No Iceberg runtime jar ships in this sandbox, so snapshots
are emulated with an append-only parquet layout plus a JSON snapshot log:

    {root}/data/snap=<sid>/*.parquet      (append-only, like Iceberg data files)
    {root}/snapshots.json                 [{"id","ordinal","commit_ts","rows"}]

``read_incremental(after, up_to)`` is the moral equivalent of Iceberg's
start-snapshot-id incremental read, and is the Spark-native replacement
for the reference's paged `WHERE inc > :last ORDER BY inc LIMIT :n`
sync loop (README-EN.org:46-49, 90-92): the increment column becomes the
snapshot ordinal, and paging becomes partitioned parallel scan.

Synthesis is deterministic per (seed, doc index): every row's RNG is
seeded independently of partitioning, so any parallelism level produces
the same corpus (this also protects the N-vs-4N scaling comparison).
Generation runs inside ``mapInPandas`` (Arrow-batched).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
VOCAB_SIZE = 2000
HOT_KEYWORDS = ["import", "return", "def", "class"]
HOT_POISSON = [5.0, 3.0, 2.0, 1.5]  # expected occurrences per doc
LANGS = ["py", "java", "go", "js", "rs"]
LANG_WEIGHTS = [0.40, 0.20, 0.15, 0.15, 0.10]  # py-skewed (FIXTURES.md §1)
EXT = {"py": "py", "java": "java", "go": "go", "js": "js", "rs": "rs"}

_STEMS = [
    "get", "set", "user", "name", "index", "data", "load", "save", "parse",
    "token", "query", "merge", "split", "count", "hash", "node", "tree",
    "list", "map", "key", "value", "read", "write", "open", "close", "init",
    "config", "path", "file", "line", "char", "byte", "code", "lang", "doc",
    "term", "score", "rank", "sort", "find", "scan", "batch", "page", "sync",
    "time", "stamp", "check", "point", "store", "cache", "pool", "task",
    "job", "run", "exec", "plan", "stage", "shard", "part", "block",
]


def make_vocab(seed: int = SEED, size: int = VOCAB_SIZE) -> list[str]:
    """Deterministic identifier vocabulary mixing snake_case and camelCase."""
    rng = np.random.default_rng(seed)
    vocab: list[str] = []
    seen: set[str] = set()
    while len(vocab) < size:
        k = int(rng.integers(1, 4))
        parts = [_STEMS[int(i)] for i in rng.integers(0, len(_STEMS), k)]
        if rng.random() < 0.5:
            name = "_".join(parts)
        else:
            name = parts[0] + "".join(p.capitalize() for p in parts[1:])
        if name in seen:
            name = f"{name}{len(vocab)}"
        seen.add(name)
        vocab.append(name)
    return vocab


_SEPARATORS = [" ", " ", " ", "\n", "(", ") ", " = ", ".", ", ", ": "]


def _gen_batch(ids: np.ndarray, seed: int, snap_ordinal: int,
               vocab: list[str]) -> pd.DataFrame:
    """Generate one Arrow batch of corpus rows; deterministic per id."""
    rows = []
    varr = np.asarray(vocab, dtype=object)
    for i in ids:
        # identity fields (repo/path/lang) are ordinal-INdependent so a row
        # regenerated at a later snapshot ordinal models an UPDATE of the
        # same logical file (upsert fixture, README-EN.org:78-79);
        # content/commit vary with the ordinal.
        rng_id = np.random.default_rng((seed << 20) + int(i) * 7)
        repo = f"org{int(i) % 7}/repo{int(i) % 53}"
        lang = LANGS[int(rng_id.choice(len(LANGS), p=LANG_WEIGHTS))]
        stem = _STEMS[int(rng_id.integers(0, len(_STEMS)))]
        path = f"src/{stem}/{vocab[int(rng_id.integers(0, len(vocab)))]}_{int(i)}.{EXT[lang]}"
        rng = np.random.default_rng(
            (seed << 20) + int(i) * 7 + 1_000_003 * (snap_ordinal + 1)
        )
        n_tok = int(rng.integers(30, 401))
        idx = (rng.zipf(1.1, size=n_tok) - 1) % len(vocab)
        toks = list(varr[idx])
        for kw, lam in zip(HOT_KEYWORDS, HOT_POISSON):
            for _ in range(int(rng.poisson(lam))):
                toks.insert(int(rng.integers(0, len(toks) + 1)), kw)
        seps = rng.choice(len(_SEPARATORS), size=len(toks))
        content = "".join(t + _SEPARATORS[int(s)] for t, s in zip(toks, seps))
        commit = hashlib.sha1(
            f"{repo}|{path}|{snap_ordinal}|{seed}".encode()
        ).hexdigest()[:12]
        rows.append((repo, path, commit, lang, content))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def generate_corpus(
    spark: SparkSession,
    n_files: int,
    seed: int = SEED,
    snap_ordinal: int = 0,
    id_start: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus generation.

    Runs on executors via ``mapInPandas`` so 100k-file benches (and, at
    cluster scale, arbitrarily large corpora) generate in parallel; the
    per-id RNG seed makes output independent of partitioning.
    """
    vocab = make_vocab(seed)
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            yield _gen_batch(pdf["id"].to_numpy(), seed, snap_ordinal, vocab)

    rng_df = spark.range(id_start, id_start + n_files, numPartitions=parts)
    return rng_df.mapInPandas(gen, schema=CORPUS_SCHEMA)


# ---------------------------------------------------------------------------
# Snapshot log (Iceberg emulation)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Snapshot:
    id: int
    ordinal: int
    commit_ts: int  # epoch seconds of the snapshot commit
    rows: int


class SnapshotLog:
    """Append-only snapshot-managed table.

    The API is deliberately the shape of an Iceberg incremental read so a
    real catalog can replace it: ``append`` == table.append + new
    snapshot; ``read_incremental(after, up_to)`` ==
    ``option('start-snapshot-id', after)``.
    """

    def __init__(self, root: str):
        from .fs import get_fs

        self.root = root
        self._fs = get_fs(root)
        self._fs.makedirs(os.path.join(root, "data"))

    @property
    def _log_path(self) -> str:
        return os.path.join(self.root, "snapshots.json")

    def snapshots(self) -> list[Snapshot]:
        if not self._fs.exists(self._log_path):
            return []
        return [
            Snapshot(**s) for s in json.loads(self._fs.read_text(self._log_path))
        ]

    def current_snapshot_id(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1].id if snaps else None

    def append(self, df: DataFrame, commit_ts: int) -> Snapshot:
        snaps = self.snapshots()
        sid = (snaps[-1].id + 1) if snaps else 1
        ordinal = len(snaps)
        path = os.path.join(self.root, "data", f"snap={sid}")
        # snapshot_id is PERSISTED in the data files so file-stream
        # consumers (streaming ingest) see row versions without the log
        df.withColumn("snapshot_id", F.lit(sid).cast("long")).write.mode(
            "error"
        ).parquet(path)
        rows = df.sparkSession.read.parquet(path).count()
        snap = Snapshot(id=sid, ordinal=ordinal, commit_ts=commit_ts, rows=rows)
        # atomic-ish publish: write sidecar then rename (alias-swap analogue,
        # README-EN.org:252-258)
        self._fs.write_text_atomic(
            self._log_path, json.dumps([s.__dict__ for s in snaps + [snap]])
        )
        return snap

    def _read(self, spark: SparkSession, snaps: list[Snapshot]) -> DataFrame:
        if not snaps:
            return spark.createDataFrame(
                [], CORPUS_SCHEMA + ", snapshot_id long"
            )
        def _one(s: Snapshot) -> DataFrame:
            d = spark.read.parquet(
                os.path.join(self.root, "data", f"snap={s.id}")
            )
            if "snapshot_id" not in d.columns:  # pre-versioned logs
                d = d.withColumn("snapshot_id", F.lit(s.id).cast("long"))
            return d

        dfs = [_one(s) for s in snaps]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def read_all(self, spark: SparkSession, up_to: int | None = None) -> DataFrame:
        snaps = [s for s in self.snapshots() if up_to is None or s.id <= up_to]
        return self._read(spark, snaps)

    def read_incremental(
        self, spark: SparkSession, after: int | None, up_to: int | None = None
    ) -> DataFrame:
        """Rows appended strictly after snapshot ``after`` (the engine's
        increment predicate, README-EN.org:90-92)."""
        snaps = [
            s for s in self.snapshots()
            if (after is None or s.id > after) and (up_to is None or s.id <= up_to)
        ]
        return self._read(spark, snaps)

    def read_commit_window(
        self, spark: SparkSession, min_commit_ts: int
    ) -> DataFrame:
        """Snapshots whose commit time falls in a look-back window — the
        compensation scan (README-EN.org:71-77): long transactions can
        commit rows *behind* the watermark, so re-read from
        ``watermark - compensate_second`` and rely on idempotent upsert."""
        snaps = [s for s in self.snapshots() if s.commit_ts >= min_commit_ts]
        return self._read(spark, snaps)


def make_query_set(seed: int = SEED, n: int = 50) -> list[dict]:
    """The reference query set (FIXTURES.md §2): 15 single-term, 15
    two-term, 10 with one hot keyword, 5 with a nonexistent term, 5 with
    a repeated term; 10 of them carry a lang/repo filter.  Deterministic
    from the seed; used by the rank-identity oracle (north_rule)."""
    vocab = make_vocab(seed)
    rng = np.random.default_rng(seed + 777)
    qs: list[dict] = []

    def pick() -> str:
        return vocab[int(rng.integers(0, len(vocab)))]

    for i in range(n):
        if i < 15:
            terms = [pick()]
        elif i < 30:
            terms = [pick(), pick()]
        elif i < 40:
            terms = [HOT_KEYWORDS[int(rng.integers(0, len(HOT_KEYWORDS)))], pick()]
        elif i < 45:
            terms = [f"zz{int(rng.integers(10**6, 10**7))}qx", pick()]
        else:
            t = pick()
            terms = [t, t]
        q = {"query_id": i, "text": " ".join(terms), "k": 20,
             "filter_lang": None, "filter_repo": None}
        if 5 <= i < 10:
            q["filter_lang"] = LANGS[int(rng.integers(0, len(LANGS)))]
        elif 20 <= i < 25:
            q["filter_repo"] = f"org{int(rng.integers(0, 7))}/repo{int(rng.integers(0, 53))}"
        qs.append(q)
    return qs


def with_doc_key(df: DataFrame) -> DataFrame:
    """Composite doc identity only (README-EN.org:88) — no content hash.

    The cheap half of ``with_doc_columns``: key-level plumbing (anti-join
    against indexed keys, upsert dedupe, id assignment) needs only this,
    and the sha256 is computed once inside the fused tokenize stage
    (``analyze.tokenize_to_tf_sha``) instead of per call site."""
    return df.withColumn(
        "doc_key", F.concat_ws("-", F.col("repo"), F.col("path"), F.col("commit"))
    )


def with_doc_columns(df: DataFrame) -> DataFrame:
    """Materialize doc identity + the correctness invariant:

    - ``doc_key``: composite id, PK columns joined by '-' exactly like the
      reference's /index/type/id synthesis (README-EN.org:88).
    - ``content_sha``: sha256(content) — the per-row invariant the doc
      store must preserve (BASELINE.json input_hint).
    - ``dl``: document length in tokens of the code analyzer (computed
      later, not here — tokenization is the expensive step).
    """
    return df.withColumn(
        "doc_key", F.concat_ws("-", F.col("repo"), F.col("path"), F.col("commit"))
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))
