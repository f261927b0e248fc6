"""BM25 top-k retrieval: hand-verified scores, the exactness of the
salted two-phase prune, and DuckDB twin parity on an in-test corpus."""

import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from vtcomposite_spark.operators import retrieval as R


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _mk_queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, query string")


def _bm25_micro(tf, df, dl, n_docs, avgdl, k1=1.2, b=0.75):
    """Python mirror of ONE term's integer micro contribution (half-up,
    matching Spark/DuckDB round)."""
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    c = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    return int(math.floor(c * 1000000.0 + 0.5))


def test_bm25_hand_case(spark):
    """3-doc corpus, single-term query: scores match the closed form and
    rank by tf with the dl normalization."""
    docs = _mk_docs(spark, [
        (1, "x x y"),        # tf(x)=2, dl=3
        (2, "x y z z"),      # tf(x)=1, dl=4
        (3, "y z"),          # no x
    ])
    out = {r.doc_id: (r.score_micro, r.rank)
           for r in R.bm25_topk(docs, _mk_queries(spark, [(0, "x")]),
                                k=10).collect()}
    avgdl = (3 + 4 + 2) / 3.0
    want1 = _bm25_micro(tf=2, df=2, dl=3, n_docs=3, avgdl=avgdl)
    want2 = _bm25_micro(tf=1, df=2, dl=4, n_docs=3, avgdl=avgdl)
    assert out == {1: (want1, 1), 2: (want2, 2)}
    assert want1 > want2 > 0


def test_bm25_multi_term_sum_and_repeated_query_terms(spark):
    """Two-term query sums per-term micro contributions; a repeated query
    term counts ONCE (documented distinct-terms simplification)."""
    docs = _mk_docs(spark, [(1, "x y"), (2, "x x"), (3, "w w w")])
    qs = _mk_queries(spark, [(0, "x y"), (1, "x x y")])
    rows = R.bm25_topk(docs, qs, k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, {})[r.doc_id] = r.score_micro
    avgdl = 7 / 3.0
    x1 = _bm25_micro(tf=1, df=2, dl=2, n_docs=3, avgdl=avgdl)
    y1 = _bm25_micro(tf=1, df=1, dl=2, n_docs=3, avgdl=avgdl)
    x2 = _bm25_micro(tf=2, df=2, dl=2, n_docs=3, avgdl=avgdl)
    assert by_q[0] == {1: x1 + y1, 2: x2}
    assert by_q[1] == by_q[0]  # "x x y" ≡ "x y"


def test_bm25_salted_prune_is_exact(spark):
    """salt_partitions splits the candidate window, keeps k per salt,
    then re-ranks — the output must be ROW-IDENTICAL to the single
    window (the tie-break is total, so the prune is exact)."""
    docs = _mk_docs(spark, [
        (i, " ".join("abcde"[(i + j) % 5] for j in range(i % 6 + 1)))
        for i in range(60)
    ])
    qs = _mk_queries(spark, [(0, "a b"), (1, "c"), (2, "e d a")])
    base = sorted(map(tuple, R.bm25_topk(docs, qs, k=4).collect()))
    for s in (2, 7):
        salted = sorted(map(tuple, R.bm25_topk(
            docs, qs, k=4, salt_partitions=s).collect()))
        assert salted == base
    assert base  # non-degenerate


def test_bm25_zero_token_docs_and_empty_query(spark):
    """Empty docs count in N/avgdl but never match; an empty query
    yields no rows for that query_id."""
    docs = _mk_docs(spark, [(1, "x y"), (2, "   "), (3, "x")])
    qs = _mk_queries(spark, [(0, "x"), (1, "  ")])
    rows = R.bm25_topk(docs, qs, k=5).collect()
    assert {r.query_id for r in rows} == {0}
    assert {r.doc_id for r in rows} == {1, 3}
    # N=3 and avgdl=(2+0+1)/3 include the empty doc
    avgdl = 3 / 3.0
    want3 = _bm25_micro(tf=1, df=2, dl=1, n_docs=3, avgdl=avgdl)
    got = {r.doc_id: r.score_micro for r in rows}
    assert got[3] == want3


def test_bm25_duckdb_twin_parity(spark):
    """Value-exact parity with bm25_topk_sql on an in-test corpus (the
    sf0.01 gate row covers the derived-query form; this pins the twin on
    arbitrary text including ties and multi-space runs)."""
    rows = [(i, " ".join(
        ["alpha"] * (i % 4) + ["beta"] * ((i * 3) % 5) +
        ["gamma", "delta"][: (i % 3)])) for i in range(40)]
    rows += [(100, "  "), (101, "alpha  beta   alpha")]
    docs = _mk_docs(spark, rows)
    qs = _mk_queries(spark, [(0, "alpha beta"), (1, "gamma")])
    got = sorted(map(tuple, R.bm25_topk(docs, qs, k=7).collect()))

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    sql = R.bm25_topk_sql(
        "SELECT * FROM (VALUES (0, 'alpha beta'), (1, 'gamma')) "
        "AS q(query_id, query)", k=7)
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want and len(got) > 10


def test_build_postings_grain(spark):
    docs = _mk_docs(spark, [(1, "x  x y"), (2, "")])
    got = sorted(map(tuple, R.build_postings(docs).collect()))
    assert got == [("x", 1, 2, 3), ("y", 1, 1, 3)]
