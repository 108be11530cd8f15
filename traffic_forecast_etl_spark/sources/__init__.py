from .tables import TABLE_NAMES, load_table, load_tables, register_views
from .csv import read_csv_auto, probe_delimiter
from .json_payload import forecast_schema, read_json_payload
from .jdbc import JdbcConfig, read_jdbc, write_jdbc_append
from .http_payload import ApiConfig, fetch_forecast, fetch_json
from .delta_log import read_delta, write_delta_append, delta_snapshot_files
from .writers import read_partitioned, write_date_partitioned

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "read_csv_auto",
    "probe_delimiter",
    "forecast_schema",
    "read_json_payload",
    "JdbcConfig",
    "ApiConfig",
    "fetch_forecast",
    "fetch_json",
    "read_delta",
    "write_delta_append",
    "delta_snapshot_files",
    "read_jdbc",
    "write_jdbc_append",
    "read_partitioned",
    "write_date_partitioned",
]
