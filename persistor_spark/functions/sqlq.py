"""Quoting helpers for the SQL-string expression builders (r14/r15 opt).

The expr-string fast paths (keys.py, blob_naming.py, version_batching.py,
plans/ingest.py) interpolate config-supplied strings into SQL text.  Spark's
SQL parser processes backslash escape sequences inside string literals
(unless spark.sql.parser.escapedStringLiterals flips the legacy behavior),
and backtick-quoted identifiers escape embedded backticks by doubling — so
quote-doubling alone (the r14 form) mis-parses backslashes and breaks on
backtick-bearing names, both of which the old Column-API path handled.
(r15 advisor fix: escape backslashes too; escape backticks in identifier
interpolation.)
"""

from __future__ import annotations


def sql_str(s: str) -> str:
    """`s` as a SQL string literal: backslashes doubled FIRST (the parser's
    escape character), then embedded single quotes doubled."""
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def sql_ident(name: str) -> str:
    """`name` as a backtick-quoted SQL identifier (embedded backticks double)."""
    return "`" + name.replace("`", "``") + "`"
