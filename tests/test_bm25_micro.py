"""5-doc micro corpus with hand-computed BM25 scores (FIXTURES.md §4).

Expected values are derived inline with plain ``math`` (no numpy, no
engine code) straight from the textbook formula, so this test gates the
shared formula module AND the whole tokenize->index->score pipeline.
"""

import math

import pytest

from mysql2es_spark.operators.index import IndexConfig
from mysql2es_spark.plans.build import SearchIndex, full_build

DOCS = [
    "apple banana apple",          # doc 0: dl=3
    "apple",                       # doc 1: dl=1
    "banana cherry",               # doc 2: dl=2
    "cherry cherry cherry apple",  # doc 3: dl=4
    "durian",                      # doc 4: dl=1
]
K1, B = 1.2, 0.75
N, AVGDL = 5, 11 / 5


def hand_score(tf: int, dl: int, df: int) -> float:
    idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
    return idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / AVGDL))


@pytest.fixture(scope="module")
def micro_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("micro") / "idx")
    rows = [
        (f"r{i}", f"p{i}.txt", f"c{i}", "py", c) for i, c in enumerate(DOCS)
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    cfg = IndexConfig(n_buckets=4, block_size=2, salt_threshold=2, n_salts=2,
                      chunk_span=4, id_partitions=2)
    full_build(spark, df, root, cfg, snapshot_id=1)
    idx = SearchIndex(spark, root)
    # map doc_id -> our row ordinal via path
    id2ord = {
        r["doc_id"]: int(r["path"][1])
        for r in idx.docstore().select("doc_id", "path").collect()
    }
    return idx, id2ord


def expected_topk(query_tfs: dict[str, int], k: int = 5):
    """Score all docs by hand; return [(ord, score)] by (score desc, ord asc)."""
    tf_of = []
    for content in DOCS:
        toks = content.split()
        tf_of.append({t: toks.count(t) for t in set(toks)})
    dfs = {}
    for t in {t for d in tf_of for t in d}:
        dfs[t] = sum(1 for d in tf_of if t in d)
    dls = [len(c.split()) for c in DOCS]
    out = []
    for i in range(N):
        s = 0.0
        for t in sorted(query_tfs):  # ascending-term order, like the engine
            if t in tf_of[i]:
                s += query_tfs[t] * hand_score(tf_of[i][t], dls[i], dfs[t])
        if s > 0:
            out.append((i, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.mark.parametrize(
    "query,qtfs",
    [
        ("apple", {"apple": 1}),
        ("apple banana", {"apple": 1, "banana": 1}),
        ("cherry durian", {"cherry": 1, "durian": 1}),
        ("apple apple cherry", {"apple": 2, "cherry": 1}),
        ("missingterm", {}),
    ],
)
def test_micro_scores_both_scorers(micro_index, query, qtfs):
    idx, id2ord = micro_index
    exp = expected_topk(qtfs) if qtfs else []
    for exact in (False, True):
        got = [
            (id2ord[r["doc_id"]], r["score"])
            for r in idx.search(query, k=5, exact=exact).collect()
        ]
        assert len(got) == len(exp), (query, exact, got, exp)
        for (go, gs), (eo, es) in zip(got, exp):
            assert go == eo, (query, exact, got, exp)
            assert gs == pytest.approx(es, abs=1e-12), (query, exact)
