"""Text-analysis column functions for the documents/pages tables.

Every function here is a pure Column expression (JVM-side, codegen'd) chosen
so the exact same computation is writable in ANSI SQL — each has a
``*_SQL`` template used by the DuckDB oracles in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# --- token counting (whitespace tokens; empty segments dropped) ---

def tokens_col(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


TOKEN_COUNT_SQL = "len(list_filter(string_split({c}, ' '), t -> t != ''))"


# --- BPE-ish subword counting: GPT-2-style pretokenizer regex ---
# contractions | optional-space word | optional-space 1-3 digit chunk |
# optional-space punctuation run. Kept to syntax with identical semantics
# in Java regex (Spark) and RE2 (DuckDB) so the oracle replays it exactly.

BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]{1,3}| ?[^a-zA-Z0-9\s]+"


def bpe_tokens_col(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def bpe_token_count_col(text: Column) -> Column:
    """Subword-ish token count: the GPT-2 pretokenizer split (digits
    chunked to ≤3, punctuation runs, contraction suffixes) WITHOUT a merge
    table — a deterministic, engine-portable upper bound on BPE tokens."""
    return F.size(bpe_tokens_col(text))


BPE_TOKEN_COUNT_SQL = (
    "len(regexp_extract_all({c}, "
    "'''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]{{1,3}}| ?[^a-zA-Z0-9\\s]+'))"
)


# --- language-ID: stopword heuristic over padded text ---

_LANG_MARKERS = [
    ("en", [" the ", " and ", " of "]),
    ("de", [" der ", " und ", " die "]),
    ("fr", [" le ", " la ", " et "]),
    ("es", [" el ", " los ", " de la "]),
]


def lang_guess_col(text: Column) -> Column:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    expr = F.lit("unknown")
    for lang, markers in reversed(_LANG_MARKERS):
        cond = None
        for m in markers:
            c = padded.contains(m)
            cond = c if cond is None else (cond | c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def lang_guess_sql(c: str) -> str:
    padded = f"(' ' || lower({c}) || ' ')"
    clauses = []
    for lang, markers in _LANG_MARKERS:
        cond = " OR ".join(f"contains({padded}, '{m}')" for m in markers)
        clauses.append(f"WHEN ({cond}) THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " ELSE 'unknown' END"


# --- quality score: length/word-shape/stopword composite, 3 decimals ---

def quality_score_col(text: Column) -> Column:
    toks = token_count_col(text)
    chars = F.length(text)
    spaces = chars - F.length(F.replace(text, F.lit(" "), F.lit("")))
    awl = (chars - spaces) / F.greatest(toks, F.lit(1))
    length_part = F.least(toks / F.lit(100.0), F.lit(1.0)) * 0.5
    shape_part = F.when((awl >= 3) & (awl <= 10), F.lit(0.3)).otherwise(F.lit(0.0))
    stop_part = F.when(lang_guess_col(text) != "unknown", F.lit(0.2)).otherwise(F.lit(0.0))
    return F.round(length_part + shape_part + stop_part, 3)


def quality_score_sql(c: str) -> str:
    toks = TOKEN_COUNT_SQL.format(c=c)
    awl = f"((length({c}) - (length({c}) - length(replace({c}, ' ', '')))) / greatest({toks}, 1))"
    return (
        f"round(least({toks} / 100.0, 1.0) * 0.5"
        f" + (CASE WHEN {awl} >= 3 AND {awl} <= 10 THEN 0.3 ELSE 0.0 END)"
        f" + (CASE WHEN ({lang_guess_sql(c)}) != 'unknown' THEN 0.2 ELSE 0.0 END), 3)"
    )


# --- document fingerprint: md5 of the normalized head ---

def fingerprint_col(text: Column) -> Column:
    norm = F.lower(F.regexp_replace(text, r"\s+", " "))
    return F.md5(F.substring(norm, 1, 64))


def fingerprint_sql(c: str) -> str:
    return f"md5(substr(lower(regexp_replace({c}, '\\s+', ' ', 'g')), 1, 64))"
