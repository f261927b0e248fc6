"""Ranked keyword retrieval over the documents table: an inverted-index
posting build and BM25 top-k search.

A training-data pipeline needs ranked lexical search in two places the
n-gram operators don't cover: decontamination triage (rank the corpus
docs most similar to a benchmark item before the exact-overlap pass) and
quality-set mining (pull the best lexical matches for a curated seed
query). BM25 is the standard scoring rule for both.

Oracle parity (the full DuckDB gate, like ann_* / text stats):

* tokenization reuses ``functions.text.tokens_col`` and its SQL twin —
  the one split rule every text operator here shares;
* N, df, tf, dl are exact integers; avgdl = sum(dl)/N divides two exact
  integers, so both engines produce the identical double;
* the only libm call is ``ln`` inside the (always-positive) idf; each
  per-term contribution is rounded to an integer MICRO score
  (``round(contrib · 10⁶) AS BIGINT``) BEFORE the per-document sum, so
  the aggregate is order-independent — the same trick the quality-score
  rollups use (CLAUDE.md: float ``avg()``/``sum()`` order is not);
* ranking orders by (score_micro DESC, doc_id ASC) — total and exact.

100-TB shape: postings are one explode + groupBy (shuffle ∝ tokens);
df is a groupBy over terms; the query side is tiny and broadcast; the
score is a map-side expression after the postings⋈query join; top-k is a
per-query window, with an optional salted two-phase prune
(``salt_partitions``) for the query-skew regime where one query matches
a large fraction of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as TX


def build_postings(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Inverted-index rows: (term, doc_id, tf, dl). Zero-token documents
    emit nothing (they can never match a term query); dl rides every
    posting so scoring needs no second join back to the corpus."""
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(TX.tokens_col(F.col(text_col))).alias("term"),
        TX.token_count_col(F.col(text_col)).alias("dl"))
    return (toks.groupBy("_id", "term")
            .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
            .select("term", F.col("_id").alias(id_col), "tf", "dl"))


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text",
              query_id_col: str = "query_id", query_col: str = "query",
              salt_partitions: int = 0) -> DataFrame:
    """BM25 top-k per query → (query_id, doc_id, score_micro, rank).

    score_micro = Σ_t round(idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
    · 10⁶) over the query's DISTINCT terms, with the Robertson-Walker
    positive idf = ln(1 + (N − df + ½)/(df + ½)). Repeated query terms
    count once (documented simplification; per-term weighting would add
    a qtf factor on the broadcast side).

    ``salt_partitions > 1`` turns on the two-phase top-k: a first window
    over (query, crc32(doc)%S) keeps k rows per salt, then the global
    window ranks the ≤ S·k survivors — bounds any single partition by the
    per-salt candidate count when a query matches a large fraction of
    the corpus. The tie-break (score DESC, doc_id ASC) is total, so the
    prune is exact, not approximate.
    """
    post = build_postings(docs, id_col=id_col, text_col=text_col)
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        (F.sum(TX.token_count_col(F.col(text_col))).cast("double")
         / F.count("*")).alias("avgdl"))
    qterms = (queries.select(
        F.col(query_id_col).alias("_qid"),
        F.explode(TX.tokens_col(F.col(query_col))).alias("term"))
        .distinct())
    # matched feeds BOTH the dfreq broadcast build and the scored join,
    # so the postings scan runs twice per action. A localCheckpoint cut
    # was tried in r6 and REVERTED: at bench scale the materialization
    # barrier cost ~10-18% (3 same-window A/Bs) — the duplicated scan is
    # cheaper than blocking the pipeline. At corpus scale, callers
    # should persist `docs` (or the postings) upstream instead.
    matched = post.join(F.broadcast(qterms), "term")
    # df only for query-matched terms: postings are unique per
    # (term, doc), so distinct-ing the matched rows back to that grain
    # counts documents — never a vocabulary-sized table, and the
    # broadcast stays ≤ |query terms| rows
    dfreq = (matched.select("term", id_col).distinct()
             .groupBy("term").agg(F.count("*").alias("df")))
    scored = (matched
              .join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(stats)))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5)))
    denom = (F.col("tf")
             + F.lit(k1) * (F.lit(1.0) - F.lit(b)
                            + F.lit(b) * F.col("dl") / F.col("avgdl")))
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    per_term = scored.select(
        "_qid", F.col(id_col),
        F.round(contrib * F.lit(1000000.0)).cast("long").alias("micro"))
    cand = (per_term.groupBy("_qid", id_col)
            .agg(F.sum("micro").alias("score_micro")))
    order = [F.col("score_micro").desc(), F.col(id_col).asc()]
    if salt_partitions > 1:
        pre = Window.partitionBy(
            "_qid", F.crc32(F.col(id_col).cast("string"))
            % salt_partitions).orderBy(*order)
        cand = (cand.withColumn("_pr", F.row_number().over(pre))
                .filter(F.col("_pr") <= k).drop("_pr"))
    w = Window.partitionBy("_qid").orderBy(*order)
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("_qid").alias(query_id_col), id_col,
                    "score_micro", "rank"))


def bm25_topk_sql(queries_cte: str, k: int = 10, k1: float = 1.2,
                  b: float = 0.75, table: str = "documents",
                  id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin of ``bm25_topk`` (salt prune omitted — it is an exact
    prune, so the single-window form is the semantic reference).

    ``queries_cte``: a SQL fragment yielding (query_id, query) — the
    caller decides whether queries are literals or derived from a table.
    Literals (k1, b, k1+1) are embedded via ``repr`` so both engines
    parse the identical double.
    """
    toks = f"list_filter(string_split({text_col}, ' '), t -> t != '')"
    dl = TX.TOKEN_COUNT_SQL.format(c=text_col)
    return (
        f"WITH q AS ({queries_cte}), "
        f"qt AS (SELECT DISTINCT query_id, term FROM "
        f"(SELECT query_id, unnest(list_filter(string_split(query, ' '), "
        f"t -> t != '')) AS term FROM q)), "
        f"post AS (SELECT {id_col} AS _id, term, count(*) AS tf, "
        f"any_value(dl) AS dl FROM (SELECT {id_col}, unnest({toks}) AS term, "
        f"{dl} AS dl FROM {table}) GROUP BY 1, 2), "
        f"stats AS (SELECT count(*) AS n_docs, "
        f"CAST(sum({dl}) AS DOUBLE) / count(*) AS avgdl FROM {table}), "
        f"dfreq AS (SELECT term, count(*) AS df FROM post GROUP BY 1), "
        f"per_term AS (SELECT qt.query_id, post._id, "
        f"CAST(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) "
        f"* (tf * {k1 + 1.0!r}) / (tf + {k1!r} * (1.0 - {b!r} "
        f"+ {b!r} * dl / avgdl)) * 1000000.0) AS BIGINT) AS micro "
        f"FROM post JOIN qt USING (term) JOIN dfreq USING (term), stats), "
        f"cand AS (SELECT query_id, _id AS {id_col}, sum(micro) AS "
        f"score_micro FROM per_term GROUP BY 1, 2), "
        f"r AS (SELECT query_id, {id_col}, "
        f"CAST(score_micro AS BIGINT) AS score_micro, "
        f"CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        f"score_micro DESC, {id_col} ASC) AS INT) AS rank FROM cand) "
        f"SELECT query_id, {id_col}, score_micro, rank FROM r "
        f"WHERE rank <= {k}"
    )
