"""Time-series regularization operators (engine extension).

The reference's domain is hourly traffic/weather series; real feeds
have gaps (sensor outages, dropped polls — the reference's notebooks
simply dropna). At scale the standard repair is resample-to-grid +
interpolate, done per series key so every series stays within one
shuffle partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def _step_seconds(step: str) -> int:
    """Parse '1 hour' / '15 minutes' / '2 days' into seconds."""
    parts = step.strip().split()
    if len(parts) != 2:
        raise ValueError(f"step must be '<n> <unit>', got {step!r}")
    n = int(parts[0])
    unit = parts[1].lower().rstrip("s")
    if unit not in _UNIT_SECONDS or n <= 0:
        raise ValueError(f"unsupported step {step!r}; units: {sorted(_UNIT_SECONDS)}")
    return n * _UNIT_SECONDS[unit]


def resample_interpolate(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Regularize each series to a fixed-step grid, linearly
    interpolating interior gaps and extending the edge values outward
    (the pandas ``resample().mean().interpolate(
    limit_direction='both')`` contract, re-expressed distributed).

    Observations are first BINNED to the grid: each timestamp floors
    to its epoch-anchored ``step`` slot (so 10:17 lands in the 10:00
    hourly slot — off-phase and irregular feeds are aggregated, never
    silently discarded), and duplicates within a slot average. The
    grid then runs from each key's min to max occupied slot. A slot
    counts as observed (``is_interpolated = false``) iff it received
    at least one non-null value.

    Output: (key_cols..., ts, value, is_interpolated).

    Plan shape at scale:
      - the grid is built per key from a 2-row-per-key bounds
        aggregate, then ``explode(sequence(...))`` — generation is
        distributed with the keys, never a driver loop;
      - one left join grid⋈observations on (key, ts) — both sides
        hash-partition on the same key, and AQE broadcasts the bounds
        side when small;
      - interpolation is two windows per key (trailing last-non-null,
        leading first-non-null), i.e. a single shuffle keyed by the
        series key shared by join and windows. No per-row Python,
        no driver state.

    Gap length is unbounded: the window form carries the nearest
    non-null neighbor across any run of missing grid points (an
    iterative fill would cap the gap length).
    """
    keys = list(key_cols)
    step_s = _step_seconds(step)
    ts_type = df.schema[ts_col].dataType
    # floor-to-step binning, epoch-anchored (pandas resample bins on
    # fixed wall-clock boundaries, not each key's first observation);
    # cast back so the grid keeps the input's timestamp flavor (NTZ
    # stays NTZ) and the (key, slot) join types line up.
    slot = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(step_s)) * F.lit(step_s)
    ).cast(ts_type)
    obs = (
        df.select(
            *keys, slot.alias("__ts"), F.col(value_col).cast("double").alias("__v")
        )
        .groupBy(*keys, "__ts")
        .agg(F.avg("__v").alias("__v"))
    )
    bounds = obs.groupBy(*keys).agg(
        F.min("__ts").alias("__t0"), F.max("__ts").alias("__t1")
    )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence("__t0", "__t1", F.expr(f"INTERVAL {step}"))
        ).alias("__ts"),
    )
    joined = grid.join(obs, [*keys, "__ts"], "left")

    w_prev = (
        Window.partitionBy(*keys)
        .orderBy("__ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(*keys)
        .orderBy("__ts")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last("__v", ignorenulls=True).over(w_prev)
    prev_t = F.last(F.when(F.col("__v").isNotNull(), F.col("__ts")), ignorenulls=True).over(w_prev)
    next_v = F.first("__v", ignorenulls=True).over(w_next)
    next_t = F.first(F.when(F.col("__v").isNotNull(), F.col("__ts")), ignorenulls=True).over(w_next)

    span = F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
    frac = (F.unix_timestamp("__ts") - F.unix_timestamp(prev_t)) / span
    interp = prev_v + (next_v - prev_v) * frac
    filled = (
        F.when(F.col("__v").isNotNull(), F.col("__v"))
        .when(prev_v.isNull(), next_v)  # before first observation
        .when(next_v.isNull(), prev_v)  # after last observation
        .otherwise(interp)
    )
    # no rounding here: interpolation returns full-precision doubles
    # (callers own presentation rounding — and round-convention
    # differences across engines matter exactly at the midpoints a
    # frac=1/2 interpolation structurally produces)
    return joined.select(
        *keys,
        F.col("__ts").alias(ts_col),
        filled.alias(value_col),
        F.col("__v").isNull().alias("is_interpolated"),
    )
