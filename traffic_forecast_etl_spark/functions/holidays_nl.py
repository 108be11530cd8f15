"""Dutch public-holiday calendar (SURVEY §2.3 J3, §2.11).

The reference uses the `holidays` PyPI package in the notebook (cell
5 ≈L65) and a hard-coded 2022-only list in the DAG
(dags/utils.py:21-30) — two inconsistent sources (SURVEY §2.11).
Engine policy: ONE computed holiday dimension both planes read.

Dates are derived from the public Gregorian computus (Gauss Easter
algorithm) + fixed-date rules for the Netherlands, matching the
`holidays.Netherlands` calendar: Nieuwjaarsdag, Goede Vrijdag,
Eerste/Tweede Paasdag, Koningsdag (Apr 27, shifted to Apr 26 when it
falls on Sunday), Bevrijdingsdag, Hemelvaartsdag, Eerste/Tweede
Pinksterdag, Eerste/Tweede Kerstdag.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession


def easter_sunday(year: int) -> _dt.date:
    """Gregorian Easter via the anonymous Gauss computus."""
    a = year % 19
    b, c = divmod(year, 100)
    d, e = divmod(b, 4)
    f = (b + 8) // 25
    g = (b - f + 1) // 3
    h = (19 * a + b - d - g + 15) % 30
    i, k = divmod(c, 4)
    l = (32 + 2 * e + 2 * i - h - k) % 7
    m = (a + 11 * h + 22 * l) // 451
    month, day = divmod(h + l - 7 * m + 114, 31)
    return _dt.date(year, month, day + 1)


def nl_holidays(year: int) -> list[_dt.date]:
    easter = easter_sunday(year)
    day = _dt.timedelta(days=1)
    kings = _dt.date(year, 4, 27)
    if kings.weekday() == 6:  # Sunday → celebrated the Saturday before
        kings = kings - day
    return sorted(
        [
            _dt.date(year, 1, 1),      # Nieuwjaarsdag
            easter - 2 * day,          # Goede Vrijdag
            easter,                    # Eerste Paasdag
            easter + day,              # Tweede Paasdag
            kings,                     # Koningsdag
            _dt.date(year, 5, 5),      # Bevrijdingsdag
            easter + 39 * day,         # Hemelvaartsdag
            easter + 49 * day,         # Eerste Pinksterdag
            easter + 50 * day,         # Tweede Pinksterdag
            _dt.date(year, 12, 25),    # Eerste Kerstdag
            _dt.date(year, 12, 26),    # Tweede Kerstdag
        ]
    )


def holiday_dim(spark: SparkSession, years: range | list[int]) -> DataFrame:
    """Holiday dimension table (one date per row) — broadcast-joined
    by the isHoliday feature (operators/joins.py flag_membership)."""
    dates = [(d,) for y in years for d in nl_holidays(y)]
    return spark.createDataFrame(dates, "holiday_date date")
