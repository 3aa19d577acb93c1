"""Timestamp wire formats (reference: sender.go:32-34, formatter.go:25,72-85,
indexer-api/lib/util.go:77).

Two string layouts exist at the boundaries:
- persist/index wire: `2006-01-02 15:04:05.99999999` (variable fraction)
- query-API wire:     `2006-01-02T15:04:05.99999999Z`
Internally everything is TimestampType (UTC session).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column, functions as F

INDEX_WIRE_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
QUERY_WIRE_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"


def parse_wire(col: Column | str) -> Column:
    """Parse the index wire layout; variable fractional digits tolerated
    (formatter.go:72-85 uses Go's flexible .99999999)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.to_timestamp(c, INDEX_WIRE_FORMAT),
        F.to_timestamp(c, "yyyy-MM-dd HH:mm:ss.SSS"),
        F.to_timestamp(c, "yyyy-MM-dd HH:mm:ss"),
    )


def format_wire(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, INDEX_WIRE_FORMAT)


def parse_query_wire(value: str) -> datetime:
    """Python-side parse of the query-API layout (util.go:255-285): RFC3339
    with up to 8 fractional digits, always UTC."""
    v = value.rstrip("Z")
    for fmt in ("%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S"):
        try:
            return datetime.strptime(v, fmt).replace(tzinfo=timezone.utc)
        except ValueError:
            continue
    raise ValueError(f"unparseable query timestamp: {value!r}")
