"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.

All metrics are pure JVM column expressions (whole-stage codegen, no
Python in the hot path) with DuckDB SQL twins generated from the same
literals, so every operator is value-checked by the driver oracle.

Heuristics follow the standard web-corpus filtering recipes (C4 /
Gopher-style rules: length, symbol ratios, stopword density); the
language ID is a stopword-hit argmax over five language profiles —
crude but deterministic and self-contained (no model files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.texthash import poly_hash, poly_hash_sql, tokens, tokens_sql

WORD_RE = "[A-Za-z0-9]+"
PUNCT_RE = r"[^A-Za-z0-9\s]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "nicht", "ein", "für"],
    "fr": ["le", "la", "les", "et", "est", "des", "une", "dans", "pour", "que"],
    "es": ["el", "los", "las", "es", "una", "por", "con", "para", "del", "más"],
    "it": ["il", "di", "che", "per", "con", "del", "sono", "una", "della", "questo"],
}
LANG_ORDER = list(STOPWORDS)  # tie-break: first listed wins


def _counts(text: F.Column) -> dict[str, F.Column]:
    toks = tokens(text)
    return {
        "n_chars": F.length(text).cast("long"),
        "n_tokens": F.size(toks).cast("long"),
        "n_words": F.size(F.regexp_extract_all(text, F.lit(WORD_RE), 0)).cast("long"),
        "n_punct": F.size(F.regexp_extract_all(text, F.lit(PUNCT_RE), 0)).cast("long"),
        "toks": toks,
    }


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """DF[id, n_chars, n_tokens, n_words, n_punct, mean_token_len]."""
    c = _counts(F.col(text_col))
    mean_len = F.round(
        F.when(
            c["n_tokens"] > 0,
            F.aggregate(c["toks"], F.lit(0).cast("long"), lambda a, t: a + F.length(t))
            / c["n_tokens"],
        ).otherwise(F.lit(0.0)),
        6,
    )
    return df.select(
        F.col(id_col).alias("id"), c["n_chars"].alias("n_chars"),
        c["n_tokens"].alias("n_tokens"), c["n_words"].alias("n_words"),
        c["n_punct"].alias("n_punct"), mean_len.alias("mean_token_len"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """DF[id, punct_ratio, stop_ratio, quality] — C4/Gopher-style
    quality in [0,1]: penalize punctuation-heavy and stopword-free
    (non-linguistic) text, reward mid-length documents.

    quality = 0.4*min(n_tokens/100, 1) + 0.3*min(4*stop_ratio, 1)
            + 0.3*(1 - min(4*punct_ratio, 1))
    """
    c = _counts(F.col(text_col))
    en = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    stop_hits = F.size(F.array_intersect(c["toks"], en)).cast("double")
    stop_ratio = F.when(c["n_tokens"] > 0, stop_hits / c["n_tokens"]).otherwise(F.lit(0.0))
    punct_ratio = F.when(c["n_chars"] > 0, c["n_punct"] / c["n_chars"]).otherwise(F.lit(0.0))
    quality = (
        F.lit(0.4) * F.least(c["n_tokens"] / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * F.least(F.lit(4.0) * stop_ratio, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.lit(4.0) * punct_ratio, F.lit(1.0)))
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """DF[id, lang_pred, lang_score] — argmax of distinct-stopword
    hits per language profile; ties broken by LANG_ORDER; all-zero
    -> 'und'. Distinct-hit counting (array_intersect is set-valued)
    matches DuckDB list_intersect semantics exactly."""
    toks = tokens(F.col(text_col))
    scores = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(s) for s in words]))
        ).cast("long")
        for lang, words in STOPWORDS.items()
    }
    best = None
    for lang in LANG_ORDER:
        cond = F.lit(True)
        for prev in LANG_ORDER[: LANG_ORDER.index(lang)]:
            cond = cond & (scores[lang] > scores[prev])
        for nxt in LANG_ORDER[LANG_ORDER.index(lang) + 1 :]:
            cond = cond & (scores[lang] >= scores[nxt])
        clause = (scores[lang] > 0) & cond
        best = (
            F.when(clause, F.lit(lang)) if best is None else best.when(clause, F.lit(lang))
        )
    pred = best.otherwise(F.lit("und"))
    score = F.greatest(*scores.values())
    return df.select(
        F.col(id_col).alias("id"), pred.alias("lang_pred"), score.alias("lang_score")
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """DF[id, fp] — whole-document rolling hash (portable spec)."""
    return df.select(
        F.col(id_col).alias("id"), poly_hash(F.col(text_col)).alias("fp")
    )


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------


def _counts_sql(text: str) -> dict[str, str]:
    return {
        "n_chars": f"CAST(length({text}) AS BIGINT)",
        "n_tokens": f"CAST(len({tokens_sql(text)}) AS BIGINT)",
        "n_words": f"CAST(len(regexp_extract_all({text}, '{WORD_RE}')) AS BIGINT)",
        "n_punct": rf"CAST(len(regexp_extract_all({text}, '{PUNCT_RE}')) AS BIGINT)",
        "toks": tokens_sql(text),
    }


def token_stats_sql(table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id") -> str:
    c = _counts_sql(text_col)
    mean_len = (
        f"round(CASE WHEN {c['n_tokens']} > 0 THEN "
        f"CAST(list_sum([length(t) for t in {c['toks']}]) AS DOUBLE) / {c['n_tokens']} "
        f"ELSE 0.0 END, 6)"
    )
    return (
        f"SELECT {id_col} AS id, {c['n_chars']} AS n_chars, "
        f"{c['n_tokens']} AS n_tokens, {c['n_words']} AS n_words, "
        f"{c['n_punct']} AS n_punct, {mean_len} AS mean_token_len FROM {table}"
    )


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def quality_scores_sql(table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    c = _counts_sql(text_col)
    stop = (
        f"(CASE WHEN {c['n_tokens']} > 0 THEN "
        f"CAST(len(list_intersect({c['toks']}, {_sql_list(STOPWORDS['en'])})) AS DOUBLE)"
        f" / {c['n_tokens']} ELSE 0.0 END)"
    )
    punct = (
        f"(CASE WHEN {c['n_chars']} > 0 THEN "
        f"CAST({c['n_punct']} AS DOUBLE) / {c['n_chars']} ELSE 0.0 END)"
    )
    quality = (
        f"0.4 * least({c['n_tokens']} / 100.0, 1.0) "
        f"+ 0.3 * least(4.0 * {stop}, 1.0) "
        f"+ 0.3 * (1.0 - least(4.0 * {punct}, 1.0))"
    )
    return (
        f"SELECT {id_col} AS id, round({punct}, 6) AS punct_ratio, "
        f"round({stop}, 6) AS stop_ratio, round({quality}, 6) AS quality "
        f"FROM {table}"
    )


def lang_id_sql(table: str = "documents", text_col: str = "text",
                id_col: str = "doc_id") -> str:
    toks = tokens_sql(text_col)
    score = {
        lang: f"CAST(len(list_intersect(toks, {_sql_list(words)})) AS BIGINT)"
        for lang, words in STOPWORDS.items()
    }
    clauses = []
    for lang in LANG_ORDER:
        conds = [f"{score[lang]} > 0"]
        for prev in LANG_ORDER[: LANG_ORDER.index(lang)]:
            conds.append(f"{score[lang]} > {score[prev]}")
        for nxt in LANG_ORDER[LANG_ORDER.index(lang) + 1 :]:
            conds.append(f"{score[lang]} >= {score[nxt]}")
        clauses.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    pred = "CASE " + " ".join(clauses) + " ELSE 'und' END"
    gmax = "greatest(" + ", ".join(score[lang] for lang in LANG_ORDER) + ")"
    return (
        f"SELECT id, {pred} AS lang_pred, {gmax} AS lang_score FROM "
        f"(SELECT {id_col} AS id, {toks} AS toks FROM {table})"
    )


def fingerprints_sql(table: str = "documents", text_col: str = "text",
                     id_col: str = "doc_id") -> str:
    return f"SELECT {id_col} AS id, {poly_hash_sql(text_col)} AS fp FROM {table}"
