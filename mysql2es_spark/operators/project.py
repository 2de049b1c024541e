"""Projection surface of the reference (SURVEY §2.2, §2.8).

mysql2es transforms each fetched row before indexing: rename map
(`mapping:`, README-EN.org:130-135), snake->camelCase
(`column-lower-camel`, README-EN.org:129-130), column drops
(`ignore-column`, README-EN.org:135-136), composite-id synthesis with
prefix/suffix (README-EN.org:88, 111-118), time-bucket routing
(`template-column` + `template-pattern`, README-EN.org:124-127), and
scalar defaults like `ifnull(x,0)` / `unix_timestamp(t)` in the user
SQL (README-EN.org:100-102).

All of these are pure Column expressions — one ``select`` projection,
fully whole-stage-codegen'd, no Python anywhere.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """`mapping: {c_type: type}` — per-column rename (README-EN.org:130-135)."""
    return df.select(
        *[F.col(c).alias(mapping.get(c, c)) for c in df.columns]
    )


def snake_to_camel(name: str) -> str:
    """`user_name ==> userName` (README-EN.org:129-130)."""
    head, *rest = name.split("_")
    return head + "".join(p.capitalize() for p in rest)


def camel_case_columns(df: DataFrame) -> DataFrame:
    """`column-lower-camel: true` (README-EN.org:129-130)."""
    return df.select(*[F.col(c).alias(snake_to_camel(c)) for c in df.columns])


def ignore_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """`ignore-column: c1,c2` (README-EN.org:135-136)."""
    return df.drop(*cols)


def index_name_of(table: str) -> str:
    """Table->index name derivation `t_some_one ==> some-one`
    (README-EN.org:93-95): strip the `t_` prefix, snake->kebab, lowercase
    (ES indices must be lowercase since 6.0)."""
    stripped = re.sub(r"^t_", "", table)
    return stripped.replace("_", "-").lower()


def synthesize_id(
    df: DataFrame,
    pk_cols: list[str],
    prefix: str | None = None,
    suffix: str | None = None,
    pattern_capture: Column | None = None,
    out: str = "doc_id_str",
) -> DataFrame:
    """Document-id synthesis (README-EN.org:88, 111-118): PK columns
    joined by '-' (composite keys), optional `id-prefix`/`id-suffix`,
    and the shard-wildcard capture (`pattern-to-id`) as an extra prefix —
    in Spark the shard suffix arrives as a partition/source column."""
    parts: list[Column] = []
    if prefix:
        parts.append(F.lit(prefix))
    if pattern_capture is not None:
        parts.append(pattern_capture)
    parts.extend(F.col(c).cast("string") for c in pk_cols)
    if suffix:
        parts.append(F.lit(suffix))
    return df.withColumn(out, F.concat_ws("-", *parts))


def template_bucket(
    df: DataFrame, column: str, pattern: str = "yyyy_MM", out: str = "index_bucket"
) -> DataFrame:
    """Time-partitioned index routing (README-EN.org:124-127): derive the
    physical partition (monthly index) from a date column.  At query time
    the partition column prunes the scan — the alias-over-index_patterns
    behavior of README-EN.org:261-297."""
    return df.withColumn(out, F.date_format(F.col(column), pattern))


def multi_format_timestamp(col: Column | str, fmts: list[str] | None = None) -> Column:
    """ES-style multi-format date parsing (README-EN.org:210-217):
    `epoch_millis || yyyy-MM-dd || yyyy-MM-dd HH:mm:ss || ...` — first
    format that parses wins."""
    c = F.col(col) if isinstance(col, str) else col
    fmts = fmts or [
        "yyyy-MM-dd HH:mm:ss.SSS",
        "yyyy-MM-dd HH:mm:ss",
        "yyyy-MM-dd",
    ]
    attempts = [F.try_to_timestamp(c, F.lit(f)) for f in fmts]
    # epoch_millis: pure digits
    attempts.append(
        F.when(
            c.rlike("^[0-9]{10,13}$"),
            F.timestamp_millis(
                F.when(F.length(c) <= 10, c.cast("long") * 1000).otherwise(
                    c.cast("long")
                )
            ),
        )
    )
    return F.coalesce(*attempts)


def soft_delete_filter(df: DataFrame, col: str = "deleted") -> DataFrame:
    """Logical-delete predicate (README-EN.org:6-8): physical deletes are
    unsupported (no binlog); rows with deleted=1 are excluded at read."""
    return df.filter(F.coalesce(F.col(col), F.lit(0)) == 0)


def increment_filter(df: DataFrame, col: str, last) -> DataFrame:
    """The increment predicate `inc > last` (strict >, README-EN.org:90-92)."""
    return df.filter(F.col(col) > F.lit(last))
