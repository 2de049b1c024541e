"""Version-guarded upsert / latest-wins dedup (SURVEY §2.7 U2, §2.9 T5).

The reference writes every doc with a `_version` (id- or
timestamp-typed, `version-column`) and ES rejects stale overwrites when
`version-check: true` (README-EN.org:78-79, 122-123) — so replayed and
compensated rows can never regress newer data.  The batch equivalent:
union everything, keep the max-version row per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_version(
    df: DataFrame,
    key_cols: list[str],
    version_cols: list[str],
) -> DataFrame:
    """One row per key: highest version wins; ties broken by the next
    version column (deterministic total order required — the reference
    gets this from ES's compare-and-set; we get it from the sort)."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.desc(c) for c in version_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    version_cols: list[str],
) -> DataFrame:
    """union + latest-wins = the idempotent re-sync semantics of E2
    (README-EN.org:71-79): applying the same updates twice is a no-op."""
    return latest_by_version(
        base.unionByName(updates), key_cols, version_cols
    )
