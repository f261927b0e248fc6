"""Corpus preparation for training pipelines: fixed-token chunking with
overlap, and deterministic hash sampling.

Both are SQL-replayable (md5 + integer arithmetic only) so the DuckDB
oracle gate verifies them value-exact, and both avoid the O(L²)
higher-order-lambda trap: chunking EXPLODES tokens to rows and assigns
each token to its (≤ chunk/stride) covering chunks, then groups — rows ∝
tokens × small duplication factor, never array-slicing per chunk over a
carried parent array (which duplicates the full token array per chunk
row through the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX


def chunk_documents(docs: DataFrame, chunk_tokens: int = 128,
                    overlap: int = 32, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """One row per chunk: (id, chunk_idx, n_tokens, chunk_text).

    Chunk k covers token positions [k·stride, k·stride + chunk_tokens)
    with stride = chunk_tokens − overlap; chunks exist for every start
    below the document's token count (the final chunk may be short).
    Plan: posexplode tokens → each token explodes to its covering chunk
    indices (a ``sequence`` of at most ⌈chunk/stride⌉ values) → groupBy
    (id, chunk) rebuilding the chunk text from position-sorted tokens.
    Deterministic; zero-token documents produce no chunks.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    w = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(TX.tokens_col(F.col(text_col))).alias("pos", "w"))
    k_min = F.greatest(
        F.ceil((F.col("pos") - F.lit(chunk_tokens - 1)) / F.lit(stride)),
        F.lit(0)).cast("long")
    k_max = F.floor(F.col("pos") / F.lit(stride)).cast("long")
    wk = w.select("_id", "pos", "w",
                  F.explode(F.sequence(k_min, k_max)).alias("chunk_idx"))
    return (wk.groupBy("_id", "chunk_idx")
            .agg(F.count("*").alias("n_tokens"),
                 F.array_sort(F.collect_list(F.struct("pos", "w")))
                 .alias("_ps"))
            .select(F.col("_id").alias(id_col), "chunk_idx", "n_tokens",
                    F.concat_ws(" ", F.transform("_ps", lambda s: s["w"]))
                    .alias("chunk_text")))


def chunk_documents_sql(chunk_tokens: int = 128, overlap: int = 32,
                        table: str = "documents",
                        id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """DuckDB twin of chunk_documents — the slice-per-chunk expression
    form (fine at oracle scale)."""
    stride = chunk_tokens - overlap
    ws = f"list_filter(string_split({text_col}, ' '), t -> t != '')"
    return (
        f"WITH w AS (SELECT {id_col}, {ws} AS ws FROM {table}), "
        "c AS (SELECT *, unnest(generate_series(0, "
        f"CAST(floor((len(ws) - 1) / {stride}) AS BIGINT))) AS chunk_idx "
        "FROM w WHERE len(ws) > 0) "
        f"SELECT {id_col}, chunk_idx, "
        f"len(ws[chunk_idx * {stride} + 1 : "
        f"chunk_idx * {stride} + {chunk_tokens}]) AS n_tokens, "
        f"array_to_string(ws[chunk_idx * {stride} + 1 : "
        f"chunk_idx * {stride} + {chunk_tokens}], ' ') AS chunk_text "
        "FROM c"
    )


def distinctive_terms(docs: DataFrame, group_col: str = "lang",
                      text_col: str = "text", k: int = 5,
                      id_col: str = "doc_id") -> DataFrame:
    """Top-k distinctive terms per group: term frequency within the group
    weighted against corpus-wide document frequency — the tf-idf shape
    with an INTEGER score (tf · 1,000,000 / df, rank-equivalent to
    tf/df weighting) so both engines compute identical values; a float
    ln() would differ in the last ulp between libms and break the
    value-hash oracle. Ties break by (score desc, term asc).

    Plan: one explode → per-(group, term) counts (map-side combine) →
    corpus df from per-(term, doc) distincts → broadcast-friendly join on
    term → per-group row_number window over the small aggregate."""
    from pyspark.sql import Window

    w = docs.select(F.col(group_col).alias("grp"),
                    F.col(id_col).alias("_id"),
                    F.explode(TX.tokens_col(F.col(text_col))).alias("term"))
    tf = w.groupBy("grp", "term").agg(F.count("*").alias("tf"))
    df_ = (w.select("term", "_id").distinct()
           .groupBy("term").agg(F.count("*").alias("df")))
    scored = (tf.join(df_, on="term")
              .withColumn("score",
                          F.floor(F.col("tf") * F.lit(1_000_000)
                                  / F.col("df")).cast("long")))
    rank_w = Window.partitionBy("grp").orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (scored.withColumn("term_rank", F.row_number().over(rank_w))
            .filter(F.col("term_rank") <= k)
            .select(F.col("grp").alias(group_col), "term", "tf", "df",
                    "score", "term_rank"))


def distinctive_terms_sql(group_col: str = "lang", text_col: str = "text",
                          k: int = 5, id_col: str = "doc_id",
                          table: str = "documents") -> str:
    """DuckDB twin of distinctive_terms."""
    ws = f"list_filter(string_split({text_col}, ' '), t -> t != '')"
    return (
        f"WITH w AS (SELECT {group_col} AS grp, {id_col} AS _id, "
        f"unnest({ws}) AS term FROM {table}), "
        "tf AS (SELECT grp, term, count(*) AS tf FROM w GROUP BY 1, 2), "
        "d AS (SELECT term, count(*) AS df FROM "
        "(SELECT DISTINCT term, _id FROM w) GROUP BY 1), "
        "s AS (SELECT grp, term, tf, df, "
        "CAST(floor(tf * 1000000.0 / df) AS BIGINT) AS score, "
        "row_number() OVER (PARTITION BY grp ORDER BY "
        "CAST(floor(tf * 1000000.0 / df) AS BIGINT) DESC, term ASC) AS term_rank "
        "FROM tf JOIN d USING (term)) "
        f"SELECT grp AS {group_col}, term, tf, df, score, term_rank "
        f"FROM s WHERE term_rank <= {k}"
    )


def unigram_surprisal(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      vocab_join: str = "auto") -> DataFrame:
    """Self-perplexity quality signal (the CCNet/Wiki-LM filter shape
    with the corpus itself as the language model): per document, the
    average per-token surprisal −ln(tf_corpus/T) under the corpus's
    unigram distribution → (id, n_tokens, surprisal_micro_sum,
    avg_surprisal_micro). LOW average = common/boilerplate-heavy text;
    HIGH = rare-token/noisy text — both tails are the usual cut
    candidates. Zero-token documents emit nothing.

    Oracle discipline: each token's surprisal rounds to an integer MICRO
    value BEFORE the per-doc sum (order-independent; ln() is the only
    libm call — the ann_*/bm25 rule), and the average is the IEEE double
    division sum/n floored, identical in both engines.

    100-TB shape: one explode (rows ∝ tokens), term counts with map-side
    combine, a term-keyed shuffle join of tokens to counts (pass
    ``vocab_join="broadcast"`` when the vocabulary fits the driver), T
    as a broadcast 1-row aggregate, then a keys-only per-doc groupBy.
    """
    toks = docs.select(F.col(id_col).alias("_id"),
                       F.explode(TX.tokens_col(F.col(text_col))).alias("term"))
    counts = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    if vocab_join == "broadcast":
        counts = F.broadcast(counts)
    per_tok = (toks.join(counts, "term")
               .crossJoin(F.broadcast(total))
               .select("_id", F.round(
                   F.log(F.col("total").cast("double") / F.col("cnt"))
                   * F.lit(1000000.0)).cast("long").alias("micro")))
    return (per_tok.groupBy("_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.sum("micro").alias("surprisal_micro_sum"))
            .select(F.col("_id").alias(id_col), "n_tokens",
                    "surprisal_micro_sum",
                    F.floor(F.col("surprisal_micro_sum")
                            / F.col("n_tokens")).cast("long")
                    .alias("avg_surprisal_micro")))


def unigram_surprisal_sql(table: str = "documents", id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    """DuckDB twin of unigram_surprisal."""
    ws = f"list_filter(string_split({text_col}, ' '), t -> t != '')"
    return (
        f"WITH t AS (SELECT {id_col} AS _id, unnest({ws}) AS term "
        f"FROM {table}), "
        "c AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1), "
        "s AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c), "
        "p AS (SELECT _id, CAST(round(ln(CAST(total AS DOUBLE) / cnt) "
        "* 1000000.0) AS BIGINT) AS micro FROM t JOIN c USING (term), s) "
        f"SELECT _id AS {id_col}, count(*) AS n_tokens, "
        "CAST(sum(micro) AS BIGINT) AS surprisal_micro_sum, "
        "CAST(floor(CAST(sum(micro) AS DOUBLE) / count(*)) AS BIGINT) "
        "AS avg_surprisal_micro FROM p GROUP BY 1"
    )


def _half_up_thresh(fraction: float) -> int:
    """fraction·10,000 rounded HALF-UP — matching Spark/DuckDB ``round``
    (Python's ``round`` is banker's: round(2.5)=2, a silent ~50% kept-set
    difference at tie fractions)."""
    import math
    return int(math.floor(fraction * 10000 + 0.5))


def sample_by_hash(df: DataFrame, fraction: float, key_col: str,
                   salt: str = "s0") -> DataFrame:
    """Deterministic, repeatable sampling: keep rows whose md5-derived
    bucket (first 4 hex chars of md5(salt || key) → int in [0, 65536),
    mod 10,000) falls below fraction·10,000. Unlike ``df.sample`` this is
    STABLE across runs/engines/partitionings — the property a
    training-data pipeline needs for reproducible subsets — and
    stratification is just a different salt per stratum. Uses the
    engine-agnostic strpos hex arithmetic (functions.hashing), the same
    primitive every oracle-gated hash here builds on.

    The fraction→threshold rounding is HALF-UP (0.00025 keeps 3 of
    10,000 buckets) — the same rule ``sample_mixture``'s column-valued
    thresholds get from Spark's/DuckDB's ``round``, so moving a stratum
    between the two operators at the same rate keeps the same bucket
    set."""
    from ..functions.hashing import _hex4_to_int_col
    bucket = _hex4_to_int_col(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))) % 10000
    return df.filter(bucket < _half_up_thresh(fraction))


def sample_by_hash_sql(fraction: float, key_col: str,
                       salt: str = "s0") -> str:
    """DuckDB twin: the WHERE predicate of sample_by_hash."""
    from ..functions.hashing import hex4_to_int_sql
    thresh = _half_up_thresh(fraction)
    h = f"md5('{salt}' || {key_col}::VARCHAR)"
    return f"(({hex4_to_int_sql(h)}) % 10000) < {thresh}"


def sample_mixture(docs: DataFrame, rates, group_col: str = "lang",
                   id_col: str = "doc_id", salt: str = "mix",
                   default_rate: float = 0.0) -> DataFrame:
    """Corpus MIXING: per-group deterministic sampling rates — downsample
    the dominant source, keep low-resource groups whole; the data-mixture
    step a pretraining corpus build ends with.

    ``rates``: ``{group: fraction}`` dict or a (group, rate) DataFrame;
    groups absent from it keep ``default_rate``. Keep-decisions use the
    same md5 bucket as ``sample_by_hash`` (stable across runs, engines
    and partitionings) and are per-doc independent, so a group's rate can
    be changed later without reshuffling which OTHER docs survive.

    100-TB shape: the rates table is tiny and broadcasts; the filter is a
    map-side predicate on the scan — no shuffle at all.
    """
    from ..functions.hashing import _hex4_to_int_col

    if isinstance(rates, dict):
        rates_df = docs.sparkSession.createDataFrame(
            [(k, float(v)) for k, v in sorted(rates.items())],
            f"{group_col} string, rate double")
    else:
        rates_df = rates
    bucket = _hex4_to_int_col(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))) % 10000
    thresh = F.round(
        F.coalesce(F.col("rate"), F.lit(float(default_rate))) * 10000) \
        .cast("long")
    return (docs.join(F.broadcast(rates_df), on=group_col, how="left")
            .filter(bucket < thresh)
            .drop("rate"))
