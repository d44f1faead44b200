"""Runtime pipeline metrics via Spark's observe API (#139).

A 100 TB pipeline needs its audit counters (rows in, rows kept, value
totals) WITHOUT paying a second pass over the data. Spark's
``Observation`` attaches aggregate expressions to a plan node and
collects them as a side effect of the action that already runs — zero
extra scans, exact values, available on the driver after the action.

Usage::

    audited, obs = observed(df, "ingest", F.count(F.lit(1)).alias("rows"))
    audited.write.parquet(...)      # the action that was happening anyway
    obs.get                         # {'rows': 12345}
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach audit metrics to a DataFrame; returns (df, observation).

    The metrics materialize when the returned DataFrame is acted on;
    read them from ``observation.get`` afterwards."""
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
