from .dates import (
    date_from_yyyymmdd,
    parse_date_multi,
    calendar_features,
    fold_hour_24,
)
from .units import (
    fahrenheit_to_celsius,
    decicelsius_to_celsius,
    minmax_normalize_expr,
    rescale_intensity,
)
from .strings import decimal_comma_to_double

__all__ = [
    "date_from_yyyymmdd",
    "parse_date_multi",
    "calendar_features",
    "fold_hour_24",
    "fahrenheit_to_celsius",
    "decicelsius_to_celsius",
    "minmax_normalize_expr",
    "rescale_intensity",
    "decimal_comma_to_double",
]
