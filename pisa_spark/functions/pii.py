"""PII detection and scrubbing (email / IPv4 / phone masking).

The standard pre-training redaction stage (the Dolma toolkit and the
BigScience ROOTS pipeline both ship exactly this shape: regex
detectors for emails, IP addresses and phone numbers, replaced by
stable placeholder tokens). Everything is whole-stage-codegen column
expressions — `regexp_count` for the signals, chained
`regexp_replace` for the scrub; no UDFs, no shuffle, so the pass
streams at scan speed on any corpus size.

Patterns are pinned to the common subset of Java regex (Spark) and
RE2 (DuckDB twin): character classes, bounded repetition and word
boundaries only — no lookaround, no backreferences. Scrub order is
pinned EMAIL -> PHONE -> IPV4 and matters: it decides which token
wins when a span could parse two ways (e.g. `123.456.7890` is
phone-shaped and dotted-quad-shaped; the pinned order masks it as a
phone). The placeholder tokens contain no digits or `@`, so a
scrubbed text never re-matches — the scrub is idempotent by
construction.

Reference parity note: the reference consumes pre-cleaned interaction
CSVs (/root/reference/src/helpers/Reader.py) and has no redaction
stage; this is part of the "beyond the reference" training-data
pipeline surface the brief mandates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pinned detector patterns (Java-regex / RE2 common subset).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IPV4_TOKEN = "<IP>"

# (column-suffix, pattern, token) in the pinned scrub order.
PII_RULES = [
    ("emails", EMAIL_RE, EMAIL_TOKEN),
    ("phones", PHONE_RE, PHONE_TOKEN),
    ("ipv4", IPV4_RE, IPV4_TOKEN),
]


def scrub_text_col(text: Column) -> Column:
    """The scrubbed text as a column expression (rules applied in the
    pinned order)."""
    out = text
    for _, pat, tok in PII_RULES:
        out = F.regexp_replace(out, pat, tok)
    return out


def pii_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ipv4, has_pii) per document.

    Counts are of the raw text independently per rule (an email's
    host part can also count as an IPv4 if it is a dotted quad —
    counts answer "how many spans does each detector see", the audit
    question; the scrub resolves overlaps by the pinned order).
    """
    t = F.col(text_col)
    counts = [
        F.regexp_count(t, F.lit(pat)).cast("int").alias(f"n_{name}")
        for name, pat, _ in PII_RULES
    ]
    out = docs.select("doc_id", *counts)
    total = sum(F.col(f"n_{name}") for name, _, _ in PII_RULES)
    return out.withColumn("has_pii", (total > 0).cast("boolean"))


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Documents with ``text_col`` masked: each detected span replaced
    by its placeholder token, all other columns untouched."""
    return docs.withColumn(text_col, scrub_text_col(F.col(text_col)))


def pii_filter(
    docs: DataFrame, max_hits: int = 0, text_col: str = "text"
) -> DataFrame:
    """Docs with at most ``max_hits`` detected PII spans (default:
    drop every document any detector fires on — the conservative
    pre-training cut when scrubbing is not wanted)."""
    sig = pii_signals(docs, text_col=text_col)
    total = (
        F.col("n_emails") + F.col("n_phones") + F.col("n_ipv4")
    )
    keep = sig.filter(total <= int(max_hits)).select("doc_id")
    return docs.join(keep, "doc_id", "left_semi")
