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


class ProgressRecorder:
    """Streaming observability (#164): a StreamingQueryListener that
    accumulates per-batch progress — input rows, processed rows/sec,
    state-store rows — for every query on the session.

    At 100 TB/day this is the feedback loop that sizes shuffle
    partitions and watermark delays: backpressure shows up as
    batchDuration > trigger interval, state bloat as a monotonically
    growing stateOperators[].numRowsTotal. Attach once per session
    (`recorder.attach(spark)`), read `recorder.totals()` after (or
    during) the run; detach to stop. Listener callbacks run on the
    driver's listener bus — they must never block, so the recorder
    only appends to in-memory lists.
    """

    def __init__(self) -> None:
        self.progress: list[dict] = []
        self._listener = None

    def attach(self, spark) -> "ProgressRecorder":
        from pyspark.sql.streaming import StreamingQueryListener

        recorder = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event) -> None:
                pass

            def onQueryProgress(self, event) -> None:
                p = event.progress
                recorder.progress.append(
                    {
                        "name": p.name,
                        "batch_id": p.batchId,
                        "num_input_rows": p.numInputRows,
                        "rows_per_sec": p.processedRowsPerSecond,
                        "state_rows": sum(
                            s.numRowsTotal for s in (p.stateOperators or [])
                        ),
                    }
                )

            def onQueryTerminated(self, event) -> None:
                pass

            def onQueryIdle(self, event) -> None:
                pass

        self._listener = _L()
        spark.streams.addListener(self._listener)
        return self

    def detach(self, spark) -> None:
        if self._listener is not None:
            spark.streams.removeListener(self._listener)
            self._listener = None

    def totals(self) -> dict:
        """Aggregate view: total input rows and max state rows seen."""
        return {
            "batches": len(self.progress),
            "input_rows": sum(p["num_input_rows"] for p in self.progress),
            "max_state_rows": max(
                (p["state_rows"] for p in self.progress), default=0
            ),
        }
