"""Date/time scalar functions (SURVEY §2.6 F1-F5, §2.11 hour-24 fold).

All native Column expressions — they compile into whole-stage codegen,
never a Python round-trip (the reference does all of these with
row-wise ``.apply`` lambdas; reference: notebook cell 2 ≈L33, cell 6
≈L74, dags/utils.py:238-242).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_from_yyyymmdd(col: Column | str) -> Column:
    """F1: date from a yyyyMMdd integer (reference slices the string:
    notebook cell 2 ≈L33)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c.cast("string"), "yyyyMMdd")


def parse_date_multi(col: Column | str, formats: tuple[str, ...] = ("yyyy-MM-dd", "dd-MM-yyyy")) -> Column:
    """F2: multi-format date parse with fallback (reference try/except
    around pd.to_datetime: data/extract_from_raw_data.py:22,36-38).

    ``try_to_date`` returns NULL instead of raising under ANSI mode, so
    the coalesce chain is the declarative form of the try/except.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.try_to_date(c, f) for f in formats])


def fold_hour_24(hour: Column | str, *, strict_midnight: bool = False) -> Column:
    """KNMI hour-24 fold. The reference maps hour 24 of day D to hour 0
    of the SAME day (notebook cell 2 ≈L33: replace(24, 0) with no date
    increment) — a documented quirk (SURVEY §2.11) that is load-bearing
    for join cardinality. ``strict_midnight=True`` is reserved for the
    corrected semantics (caller advances the date too).
    """
    h = F.col(hour) if isinstance(hour, str) else hour
    if strict_midnight:
        return h % 24
    return F.when(h == 24, F.lit(0)).otherwise(h)


def calendar_features(date_col: Column | str, prefix: str = "") -> dict[str, Column]:
    """F4: calendar extraction — month, day-of-month, weekday.

    ⚠ weekday encoding: pandas ``weekday()`` is Monday=0..Sunday=6 and
    it is the model's #2 feature (11.2% importance, reference notebook
    cell 18); Spark's ``dayofweek`` is Sunday=1 and would silently
    corrupt it. ``F.weekday`` (Spark ≥3.5) matches pandas.
    """
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return {
        f"{prefix}Month": F.month(c),
        f"{prefix}Day": F.dayofmonth(c),
        f"{prefix}DayofWeek": F.weekday(c),
    }
