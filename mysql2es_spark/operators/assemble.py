"""Document assembly joins (SURVEY §2.3): the reference's
`relation-mapping` (one-to-one, flat merge) and `nested-mapping`
(one-to-many, list-of-struct) — README-EN.org:145-159.

The reference runs these as per-batch child fetches
(`WHERE child-field IN (page ids)`) because it pages through JDBC; in
Spark they are ordinary joins that Catalyst plans (broadcast for small
children, sort-merge otherwise) — semantically identical, one row per
parent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def relation_mapping(
    main: DataFrame,
    child: DataFrame,
    main_field: str,
    child_field: str,
    broadcast: bool = False,
) -> DataFrame:
    """One-to-one flat merge (README-EN.org:145-151): child columns are
    attached at peer level to the parent doc.  Documented by the
    reference as the alternative when a LEFT JOIN in the source SQL is
    slower than two single-table queries — in Spark both forms produce
    the same join; ``broadcast=True`` for small dimensions."""
    c = F.broadcast(child) if broadcast else child
    return main.join(
        c, main[main_field] == c[child_field], "left"
    ).drop(c[child_field])


def nested_mapping(
    main: DataFrame,
    child: DataFrame,
    main_field: str,
    child_field: str,
    nested_name: str,
    child_cols: list[str] | None = None,
    sort_keys: list[str] | None = None,
) -> DataFrame:
    """One-to-many nested assembly (README-EN.org:152-159): group child
    rows by the FK and attach them as a list-of-struct property named by
    the config key (`item:` in the reference example).

    The struct list is ``array_sort``-ed so the result is deterministic
    (the reference inherits whatever order MySQL returns; Spark's
    collect_list is nondeterministic, so we pin it).
    """
    cols = child_cols or [c for c in child.columns if c != child_field]
    nested = (
        child.groupBy(child_field)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(*[F.col(c) for c in cols]))
            ).alias(nested_name)
        )
    )
    out = main.join(
        nested, main[main_field] == nested[child_field], "left"
    ).drop(nested[child_field])
    return out
