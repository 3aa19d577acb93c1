"""Mongo-filter-dialect -> Spark Column translator (reference Q5-Q7:
indexer-api/lib/repo/mongo.go:212-239, util.go:190-285).

The Indexer API's generic query body is a list of filter maps combined with
`$or`; each map is a conjunction of `field: value` equalities or
`field: {"$op": value}` operator documents.  This module is the pure-function
"semantic shim" SURVEY.md §4.3 calls out — ~100 LoC, no Catalyst rules needed:
the translated Column lands in a plain `.filter()`, so predicate pushdown to
parquet happens for free.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import Column, functions as F

from persistor_spark.functions.timestamps import parse_query_wire
from persistor_spark.schemas import (
    ADDITIONAL_METADATA_PREFIX,
    QUERYABLE_FIELDS,
    TIMESTAMP_FIELDS,
)


class InvalidQueryKeys(ValueError):
    """Mirrors checkForInvalidQueryKeys' rejection (util.go:190-206)."""


class InvalidTimestamp(ValueError):
    """Mirrors convertTimestamps' rejection (util.go:222-253)."""


# Mongo comparison operators the dialect admits on operator documents.
# NULL semantics follow MONGO, not SQL, for the negative operators: Mongo's
# $ne / $nin MATCH documents whose field is missing or null (the reference
# hands these filters to Mongo verbatim), while a naive != / ~isin
# evaluates NULL -> NULL and .filter() drops the row — silently returning
# fewer rows than the reference for every nullable field.  The positive
# comparisons keep SQL behavior (NULL never matches), which agrees with
# Mongo for $eq/$gt/... on null-vs-string comparisons.
_OPS = {
    "$eq": lambda c, v: c == v,
    "$ne": lambda c, v: ~c.eqNullSafe(v),
    "$gt": lambda c, v: c > v,
    "$gte": lambda c, v: c >= v,
    "$lt": lambda c, v: c < v,
    "$lte": lambda c, v: c <= v,
    "$in": lambda c, v: c.isin(list(v)),
    "$nin": lambda c, v: ~F.coalesce(c.isin(list(v)), F.lit(False)),
}


def validate_filter_keys(filters: Iterable[dict]) -> None:
    """Whitelist check: a key is valid iff it's a queryable index field or a
    dotted path under additional_metadata (util.go:208-220)."""
    invalid = [
        key
        for flt in filters
        for key in flt
        if key not in QUERYABLE_FIELDS
        and key != "additional_metadata"
        and not key.startswith(ADDITIONAL_METADATA_PREFIX)
    ]
    if invalid:
        raise InvalidQueryKeys(f"invalid query filter keys in query request body - {invalid}")


def coerce_timestamps(filters: list[dict]) -> list[dict]:
    """For the 3 timestamp fields, convert wire strings (or operator docs of
    wire strings) to datetimes (util.go:222-285).  Non-string values for a
    timestamp field are rejected, as in the reference."""
    out = []
    errors: dict[str, str] = {}
    for flt in filters:
        conv = {}
        for key, value in flt.items():
            if key in TIMESTAMP_FIELDS:
                try:
                    if isinstance(value, str):
                        conv[key] = parse_query_wire(value)
                    elif isinstance(value, dict):
                        # $in/$nin operands are LISTS of wire strings — parse
                        # each element; str(list) would be rejected wholesale.
                        conv[key] = {
                            op: (
                                [parse_query_wire(str(t)) for t in ts]
                                if isinstance(ts, (list, tuple))
                                else parse_query_wire(str(ts))
                            )
                            for op, ts in value.items()
                        }
                    else:
                        raise ValueError("invalid time format")
                except ValueError as exc:
                    errors[key] = str(exc)
            else:
                conv[key] = value
        out.append(conv)
    if errors:
        raise InvalidTimestamp(f"invalid timestamp values in query request body - {errors}")
    return out


def _field_column(key: str) -> Column:
    if key.startswith(ADDITIONAL_METADATA_PREFIX):
        sub = key[len(ADDITIONAL_METADATA_PREFIX) :]
        return F.element_at(F.col("additional_metadata"), F.lit(sub))
    return F.col(key)


def _condition(key: str, value: Any) -> Column:
    col = _field_column(key)
    if isinstance(value, dict):
        conds = []
        for op, operand in value.items():
            if op not in _OPS:
                raise InvalidQueryKeys(f"unsupported operator {op!r} for field {key!r}")
            conds.append(_OPS[op](col, operand))
        return _all(conds)
    return col == value


def _all(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _any(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def translate(filters: list[dict]) -> Column:
    """Full translation: validate keys, coerce timestamps, build the
    OR-of-ANDs Column (`bson.M{"$or": filters}`, mongo.go:222).

    Mongo's `$or: []` matches nothing; an empty filter map `{}` matches
    everything — both preserved.
    """
    filters = list(filters)
    validate_filter_keys(filters)
    filters = coerce_timestamps(filters)
    if not filters:
        return F.lit(False)
    disjuncts = []
    for flt in filters:
        if not flt:
            disjuncts.append(F.lit(True))
            continue
        disjuncts.append(_all([_condition(k, v) for k, v in flt.items()]))
    return _any(disjuncts)
