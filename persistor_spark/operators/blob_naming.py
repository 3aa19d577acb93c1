"""Blob path generation (reference T4: storage.go:103-247).

The reference builds `bucket/prefix + maskDirs + prefix-firstMsgID.ext` per
mini-batch with wall-clock time parts.  Spark-first translation:

- mask members become *derived columns* (date parts of an injectable clock,
  `{attr}` substitutions with 'unknown' fill, custom constants);
- the blob's identity is the deterministic `location_key` column — the
  contract the index stores and resubmit joins on (SURVEY.md §7.3 hard
  point 3: we pin the *path*, not Spark's task-owned physical file names);
- the physical write is `partitionBy(mask columns)` so partition pruning
  works on every mask member at read time.

Blob filename: the reference names a blob after its FIRST message's id
(storage.go:50,113) — an order artifact of a single-writer loop.  We name it
after the deterministic partition identity (broker_id by default), which is
stable under retries and parallel writers; `location_key` remains a dense
join key either way (D9/D10 pin the semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from persistor_spark.config import StorageConfig, TIME_MASK_MEMBERS
from persistor_spark.functions.sqlq import sql_ident, sql_str
from persistor_spark.operators.version_batching import UNKNOWN

_TIME_PART_EXPR = {
    "year": lambda clock: F.year(clock).cast("string"),
    "month": lambda clock: F.lpad(F.month(clock).cast("string"), 2, "0"),
    "day": lambda clock: F.lpad(F.dayofmonth(clock).cast("string"), 2, "0"),
    "hour": lambda clock: F.lpad(F.hour(clock).cast("string"), 2, "0"),
}

# SQL-string twins of _TIME_PART_EXPR for the str-clock fast path (r14 opt,
# guide §1.2): the ingest plan builds these per batch — per MICRO-batch on
# the streaming path — and every Column call above is a driver py4j round
# trip; one F.expr parse replaces four calls per member.  current_timestamp()
# as the clock string is evaluated once per query exactly like the shared
# Column object was (query-start literal), so values are unchanged.
_TIME_PART_SQL = {
    "year": "cast(year({c}) as string)",
    "month": "lpad(cast(month({c}) as string), 2, '0')",
    "day": "lpad(cast(dayofmonth({c}) as string), 2, '0')",
    "hour": "lpad(cast(hour({c}) as string), 2, '0')",
}


def mask_columns(
    cfg: StorageConfig,
    clock: Column | str,
    attributes: str = "attributes",
) -> dict[str, Column]:
    """One named Column per mask member, in mask order (storage.go:125-189).

    Mask keys are case-insensitive in the reference (storage.go:198) — so
    the custom_values lookup must be case-insensitive TOO: the member is
    lowercased here, and a config like mask=('ENV',),
    custom_values={'ENV': ...} passes validate() with its original casing.

    `clock` may be a Column (legacy/tests) or a SQL expression STRING
    (the ingest plan's fast path — see _TIME_PART_SQL).
    """
    custom = {k.lower(): v for k, v in cfg.custom_values.items()}
    cols: dict[str, Column] = {}
    for member in cfg.mask:
        m = member.lower()
        if m in TIME_MASK_MEMBERS:
            cols[f"__mask_{m}"] = (
                F.expr(_TIME_PART_SQL[m].format(c=clock))
                if isinstance(clock, str)
                else _TIME_PART_EXPR[m](clock)
            )
        elif m.startswith("{") and m.endswith("}"):
            attr = m[1:-1]
            cols[f"__mask_{attr}"] = F.expr(
                f"coalesce(element_at({sql_ident(attributes)}, {sql_str(attr)}),"
                f" '{UNKNOWN}')"
            )
        else:
            cols[f"__mask_{m}"] = F.lit(str(custom[m]))
    return cols


def location_key(
    cfg: StorageConfig,
    mask_cols: dict[str, Column],
    blob_name: Column,
) -> Column:
    """Full blob URL: `<scheme>://<bucket>/<prefix>/<mask parts>/blob-<name>.<ext>`
    (storage.go:253-264 addressing; S4/S5 parse it back)."""
    parts: list[Column] = [F.lit(f"{cfg.base_url}/{cfg.prefix}/")]
    for col in mask_cols.values():
        parts.extend([col, F.lit("/")])
    parts.extend([F.lit("blob-"), blob_name, F.lit(f".{cfg.extension}")])
    return F.concat(*parts)


def split_location(col: Column) -> tuple[Column, Column]:
    """location URL -> (bucket, object path); mirrors the fetchers' URL
    parsing (gs.go:54-89 splits gs://bucket/path; abs.go:76-114 the https
    form).  Spark reads the URL directly, but the parse is exposed for
    parity tests."""
    no_scheme = F.regexp_replace(col, r"^[a-z0-9]+://", "")
    bucket = F.split(no_scheme, "/").getItem(0)
    path = F.regexp_replace(no_scheme, r"^[^/]+/", "")
    return bucket, path


def blob_column_exprs(
    cfg: StorageConfig,
    clock: Column | str,
    blob_name: Column | None = None,
    attributes: str = "attributes",
) -> tuple[dict[str, Column], Column]:
    """(mask column dict, location_key Column) — the location_key refers to
    the mask columns BY NAME, so callers attach the dict first (its own
    withColumns) and location_key in a later op, letting them fuse either
    with other derived columns.  The static part of the location URL
    (base/prefix + mask refs + '/' separators + 'blob-') is one SQL concat;
    per-part Column-API composition recurs every streaming micro-batch
    (r14 opt, guide §1.2).  `blob_name` stays an opaque Column (callers
    pass arbitrary expressions)."""
    cols = mask_columns(cfg, clock, attributes)
    name_col = blob_name if blob_name is not None else F.col("broker_id")

    static_parts = [sql_str(f"{cfg.base_url}/{cfg.prefix}/")]
    for n in cols:
        static_parts.extend([sql_ident(n), sql_str("/")])
    static_parts.append(sql_str("blob-"))
    lk = F.concat(
        F.expr(f"concat({', '.join(static_parts)})"),
        name_col,
        F.lit(f".{cfg.extension}"),
    )
    return cols, lk


def add_blob_columns(
    df: DataFrame,
    cfg: StorageConfig,
    clock: Column | str,
    blob_name: Column | None = None,
    attributes: str = "attributes",
) -> tuple[DataFrame, list[str]]:
    """Attach mask columns + `location_key`; returns (df, mask column names)
    for use as `partitionBy(...)` keys on the physical write."""
    cols, lk = blob_column_exprs(cfg, clock, blob_name, attributes)
    df = df.withColumns(cols).withColumn("location_key", lk)
    return df, list(cols)
