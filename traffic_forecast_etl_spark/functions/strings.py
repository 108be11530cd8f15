"""String scalar functions (SURVEY §2.6 F10).

Native regexp expressions — the reference does these with pandas
``.str.replace`` (reference: data/extract_from_raw_data.py:30-31).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decimal_comma_to_double(col: Column | str) -> Column:
    """F10: parse decimal-comma floats ("52,0955" → 52.0955)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, ",", ".").cast("double")
