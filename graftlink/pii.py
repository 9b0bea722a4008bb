"""PII detection + redaction for training-data pipelines (§2C).

The standard pre-training scrub (C4 / CCNet / BigScience ROOTS all
ship a variant): count and mask emails, IPv4 addresses, and phone
numbers before anything else sees the text. No igraph anchor — this
is engine-extension surface, like textops.

Everything is pure JVM column expressions (regexp_extract_all /
regexp_replace inside whole-stage codegen — no Python in the hot
path, no shuffle at all: detection and redaction are narrow maps, so
at 100 TB this runs at scan speed with full column pruning).

The regexes are written in the COMMON subset of Java regex (Spark)
and RE2 (DuckDB): character classes, bounded repetition, word
boundaries — no backreferences, no lookaround (RE2 has neither), so
both engines match identical spans and the driver twin hash-checks
the actual redacted strings, not just counts.

Contract notes:
- counts are per-pattern over the RAW text, independently (an email's
  digits are not double-counted as a phone because the phone patterns
  require separators/+, but overlapping custom patterns would be — the
  counts are detector outputs, not a disjoint partition of the text);
- redaction applies in a FIXED order (email, then ipv4, then phone) so
  composed replacements are deterministic and identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# two phone shapes: international +NNNNNNN.. (7-15 digits) and
# NANP-style NNN-NNN-NNNN with -, . or space separators
PHONE_RE = r"\+[0-9]{7,15}\b|\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"

EMAIL_TOKEN, IPV4_TOKEN, PHONE_TOKEN = "<EMAIL>", "<IP>", "<PHONE>"

_PATTERNS = [
    ("email", EMAIL_RE, EMAIL_TOKEN),
    ("ipv4", IPV4_RE, IPV4_TOKEN),
    ("phone", PHONE_RE, PHONE_TOKEN),
]


def pii_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """DF[id, n_emails, n_ipv4, n_phones, has_pii] — per-pattern match
    counts over the raw text; narrow map, no shuffle."""
    t = F.col(text_col)
    counts = {
        name: F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long")
        for name, pat, _ in _PATTERNS
    }
    return df.select(
        F.col(id_col).alias("id"),
        counts["email"].alias("n_emails"),
        counts["ipv4"].alias("n_ipv4"),
        counts["phone"].alias("n_phones"),
        (counts["email"] + counts["ipv4"] + counts["phone"] > 0).alias("has_pii"),
    )


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """DF[id, text] — text with every match replaced by its typed
    token, applied email -> ipv4 -> phone."""
    out = F.col(text_col)
    for _, pat, token in _PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return df.select(F.col(id_col).alias("id"), out.alias("text"))


# ---------------------------------------------------------------------------
# DuckDB twins — same literals, same order
# ---------------------------------------------------------------------------


def _sql_quote(pat: str) -> str:
    # DuckDB standard string literals do NOT process backslash
    # escapes, so the regex goes through verbatim — only quotes need
    # doubling.
    return "'" + pat.replace("'", "''") + "'"


def pii_signals_sql(source_sql: str, text_expr: str = "text",
                    id_expr: str = "doc_id") -> str:
    c = {
        name: f"len(regexp_extract_all({text_expr}, {_sql_quote(pat)}))"
        for name, pat, _ in _PATTERNS
    }
    return f"""
        SELECT {id_expr} AS id,
               CAST({c['email']} AS BIGINT) AS n_emails,
               CAST({c['ipv4']} AS BIGINT) AS n_ipv4,
               CAST({c['phone']} AS BIGINT) AS n_phones,
               ({c['email']} + {c['ipv4']} + {c['phone']}) > 0 AS has_pii
        FROM ({source_sql})
    """


def redact_pii_sql(source_sql: str, text_expr: str = "text",
                   id_expr: str = "doc_id") -> str:
    out = text_expr
    for _, pat, token in _PATTERNS:
        out = f"regexp_replace({out}, {_sql_quote(pat)}, '{token}', 'g')"
    return f"SELECT {id_expr} AS id, {out} AS text FROM ({source_sql})"
