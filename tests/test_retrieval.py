"""BM25 retrieval: closed-form scores, ranking, scale-shape pins."""

import math

import pytest

from featuregenerator_spark.operators.retrieval import B, K1, bm25_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "spark join spark window"),       # tf(spark)=2, dl=4
        (1, "table scan filter sort"),        # no query terms
        (2, "spark merge merge merge batch"), # tf(merge)=3, dl=5
        (3, "window window agg"),             # tf(window)=2, dl=3
        (4, "spark"),                         # tf(spark)=1, dl=1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_py(docs_rows, query, k=10):
    """Pure-python oracle mirroring the operator's quantized contract."""
    toks = {d: t.split(" ") for d, t in docs_rows}
    n = float(len(toks))
    avgdl = sum(len(t) for t in toks.values()) / len(toks)
    q = sorted(set(query))
    df = {
        t: sum(1 for tk in toks.values() if t in tk)
        for t in q
    }
    scores = {}
    for d, tk in toks.items():
        micro = 0
        for t in q:
            tf = tk.count(t)
            if tf == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            part = (tf * (K1 + 1.0)) / (
                tf + K1 * (1.0 - B + B * len(tk) / avgdl)
            )
            micro += int(round(idf * part * 1e6))
        if micro:
            scores[d] = micro
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [
        (d, micro / 1e6, i + 1) for i, (d, micro) in enumerate(ranked)
    ]


def test_bm25_matches_closed_form(spark, docs):
    query = ("spark", "merge", "vector", "window")
    got = sorted(
        (r["doc_id"], r["bm25"], r["rank"])
        for r in bm25_topk(docs, query, k=10).collect()
    )
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    want = sorted(_bm25_py(rows, query))
    assert got == want


def test_bm25_no_hit_docs_absent(spark, docs):
    out = bm25_topk(docs, ("spark",), k=10).collect()
    ids = {r["doc_id"] for r in out}
    assert 1 not in ids and 3 not in ids  # no 'spark' token
    assert ids == {0, 2, 4}


def test_bm25_rank_ordering_deterministic(spark, docs):
    out = bm25_topk(docs, ("spark", "window"), k=10).collect()
    ranks = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # doc 0 hits both terms (tf 2+1); ties, if any, break by doc_id ASC
    assert ranks[0] == 0
    scores = [r["bm25"] for r in sorted(out, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)


def test_bm25_topk_plan_is_take_ordered(spark, docs):
    """Global top-k must be TakeOrderedAndProject (per-partition partial
    top-k), not a single-partition global-window sort; the df table
    joins back as a broadcast (vocabulary-sized), never a sort-merge."""
    plan = bm25_topk(docs, ("spark",), k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
