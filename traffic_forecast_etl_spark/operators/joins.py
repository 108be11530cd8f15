"""Join operators (SURVEY §2.3 J1-J3 + the general joins the engine
must expose: semi/anti, range, as-of).

Scale policy lives here: small dimension sides get an explicit
``broadcast()`` hint (shuffle-free hash join); big-big joins shuffle
on their keys and rely on AQE skew splitting; the as-of join is a
composition of union + window (one shuffle, no per-row lookups).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def join_on_keys(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """J1: equi-join on a composite key (reference: weather ⋈ traffic on
    (Date, Hour), notebook cell 6 ≈L74). ``broadcast_right=True`` for
    dimension-sized right sides."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=list(keys), how=how)


def lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    payload: Sequence[str],
    broadcast_dim: bool = True,
) -> DataFrame:
    """J2: decorrelated scalar-subquery lookup (FK resolution).

    The reference runs one correlated scalar subquery per inserted row
    (reference: dags/utils.py:269-273). Decorrelated, it is a single
    left equi-join — Catalyst performs the same rewrite for SQL scalar
    subqueries; we write the join directly. Dimension side broadcasts
    by default (FK dims are small relative to facts).
    """
    d = dim.select(F.col(dim_key).alias("__dimkey"), *payload)
    if broadcast_dim:
        d = F.broadcast(d)
    return fact.join(d, fact[fact_key] == d["__dimkey"], "left").drop("__dimkey")


def semi_join_membership(
    df: DataFrame, col: str, values: Sequence[Any] | DataFrame, value_col: str | None = None
) -> DataFrame:
    """J3: set-membership filter (holiday-flag pattern, reference:
    notebook cell 6 ≈L74, dags/utils.py:242).

    Small literal list → ``isin`` (constant-folded predicate, pushed to
    the scan). Table-sized membership → broadcast LEFT SEMI join.
    """
    if isinstance(values, DataFrame):
        key = value_col or col
        return df.join(
            F.broadcast(values.select(F.col(key).alias(col)).distinct()), on=col, how="left_semi"
        )
    return df.filter(F.col(col).isin(list(values)))


def anti_join(left: DataFrame, right: DataFrame, keys: Sequence[str]) -> DataFrame:
    """NOT EXISTS — rows of ``left`` with no match in ``right``. The
    building block of the idempotent insert-if-absent sink (S8)."""
    return left.join(right, on=list(keys), how="left_anti")


def flag_membership(
    df: DataFrame, key: str, members: DataFrame, member_key: str, flag: str
) -> DataFrame:
    """J3 variant that keeps all rows and adds a boolean flag (the
    isHoliday feature): broadcast left join + NULL test."""
    m = F.broadcast(
        members.select(F.col(member_key).alias(key)).distinct().withColumn("__hit", F.lit(1))
    )
    return df.join(m, on=key, how="left").withColumn(flag, F.col("__hit").isNotNull()).drop("__hit")


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi_keys: Sequence[str],
    range_cond: Column,
) -> DataFrame:
    """Range join: equi keys + a non-equi band condition. With equi
    keys present Spark plans a hash/sort-merge join on the equi keys
    and applies the band as a post-join filter — no nested-loop
    blowup. Pure band joins (no equi key) should bucketize the range
    key into an equi-joinable bucket column first."""
    if equi_keys:
        cond = [left[k] == right[k] for k in equi_keys]
        return left.join(right, on=cond, how="inner").filter(range_cond)
    return left.join(right, on=range_cond, how="inner")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_cols: Sequence[str],
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ``right.on <= left.on`` within the same ``by`` group (backward; or
    the earliest ``>=`` for forward).

    Spark has no native as-of join. Scalable composition (one shuffle
    on ``by``, no per-row lookups, no crossJoin):

      1. tag and union both sides on (by, on);
      2. window-sort within ``by`` by (on, tag) and carry the last
         non-null right payload forward with ``last(ignorenulls)``;
      3. keep left rows.

    This is the standard union-merge formulation of merge_asof; state
    per group is one row of payload, and the window never materializes
    a group in memory (UnsafeExternalSorter spills).
    """
    l_tagged = left.withColumn("__is_left", F.lit(True))
    for c in right_cols:
        l_tagged = l_tagged.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.select(
        *by,
        F.col(on).alias(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    ).withColumn("__is_left", F.lit(False))
    left_cols = [c for c in left.columns]
    for c in left_cols:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tagged.select(*left_cols, *[f"{c}{suffix}" for c in right_cols], "__is_left").unionByName(
        r_tagged.select(*left_cols, *[f"{c}{suffix}" for c in right_cols], "__is_left")
    )
    if direction == "backward":
        # right rows sort BEFORE left rows at equal timestamps so an
        # exact-timestamp match is visible to the left row.
        order = [F.col(on).asc(), F.col("__is_left").cast("int").asc()]
        frame = Window.partitionBy(*by).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        filled = unioned.select(
            "*",
            *[
                F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(frame).alias(f"__f_{c}")
                for c in right_cols
            ],
        )
    else:
        order = [F.col(on).asc(), F.col("__is_left").cast("int").desc()]
        frame = Window.partitionBy(*by).orderBy(*order).rowsBetween(0, Window.unboundedFollowing)
        filled = unioned.select(
            "*",
            *[
                F.first(F.col(f"{c}{suffix}"), ignorenulls=True).over(frame).alias(f"__f_{c}")
                for c in right_cols
            ],
        )
    out = filled.filter(F.col("__is_left")).select(
        *left_cols, *[F.col(f"__f_{c}").alias(f"{c}{suffix}") for c in right_cols]
    )
    return out
