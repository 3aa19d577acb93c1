"""PII detection and redaction for training-data pipelines.

Regex-based detectors for the high-frequency PII classes a web-scale corpus
must scrub before training (emails, phone numbers, IPv4 addresses) — the
cheap deterministic pass that runs on every document; ML-based NER scrubbing
would layer on top as a Pandas-UDF stage.

All expressions are built-in pyspark.sql.functions (JVM regex, whole-stage
codegen) — a narrow per-row map with zero shuffle: at 100 TB this pipelines
with the scan.  Patterns deliberately use only syntax shared by Java regex
(Spark) and RE2 (DuckDB) so oracle queries can mirror them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Detection patterns (Java-regex / RE2 common subset: no lookbehind).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
IPV4_PATTERN = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

# Redaction replaces longest/most-specific first so an email's domain dots
# are not half-eaten by the IP pattern.
REDACTIONS = (
    (EMAIL_PATTERN, "[EMAIL]"),
    (IPV4_PATTERN, "[IP]"),
    (PHONE_PATTERN, "[PHONE]"),
)


def _c(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def email_count(text: Column | str = "text") -> Column:
    return F.regexp_count(_c(text), F.lit(EMAIL_PATTERN))


def phone_count(text: Column | str = "text") -> Column:
    return F.regexp_count(_c(text), F.lit(PHONE_PATTERN))


def ipv4_count(text: Column | str = "text") -> Column:
    return F.regexp_count(_c(text), F.lit(IPV4_PATTERN))


def redact(text: Column | str = "text") -> Column:
    out = _c(text)
    for pattern, token in REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out


def with_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds per-class counts, a `has_pii` flag, and the redacted text."""
    out = (
        df.withColumn("n_emails", email_count(text_col))
        .withColumn("n_phones", phone_count(text_col))
        .withColumn("n_ips", ipv4_count(text_col))
    )
    return out.withColumn(
        "has_pii", (F.col("n_emails") + F.col("n_phones") + F.col("n_ips")) > 0
    ).withColumn("redacted", redact(text_col))
