"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.J meets §7.6).

The template for operators Spark's built-in windows can't express:
arbitrary per-key state evolved batch by batch. The example keeps a
running per-user profile (event count, value sum, last seen) — the
"user state store" shape that backs online feature computation.

Scale notes: state lives in the state store keyed by the groupBy
key — shuffle once per micro-batch on user_id; state size is
O(distinct keys), eviction via the timeout conf. The same function
body works unchanged on a 1000-executor cluster because all
cross-row communication is the shuffle.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)


def _update_profile(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last = max(last, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, total, last))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "sum_value": total, "last_seen_us": last}]
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Continuously-updated per-user profile over a stream of
    (user_id, ts, value) events."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- Spark 4 transformWithState variant -----------------------------

try:
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserProfileProcessor(StatefulProcessor):
        """The same per-user profile on the Spark 4
        ``transformWithStateInPandas`` API — typed value state via a
        handle, explicit lifecycle (init/handleInputRows/close), and
        room for timers/TTL that the old applyInPandasWithState
        lacked. Output parity with ``user_profiles`` is tested."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "profile", "n_events BIGINT, sum_value DOUBLE, last_seen_us BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total, last = (
                self._state.get() if self._state.exists() else (0, 0.0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                last = max(last, int(pdf["ts"].astype("int64").max() // 1000))
            self._state.update((n, total, last))
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "n_events": n,
                        "sum_value": total,
                        "last_seen_us": last,
                    }
                ]
            )

        def close(self) -> None:
            pass

    def user_profiles_tws(events: DataFrame) -> DataFrame:
        """``user_profiles`` on the transformWithState API (Spark 4
        state-v2: typed state handles, timers, column-family state
        store — the forward path for custom stateful operators).

        Environment note: the plan builds and the processor is plain
        pandas, but EXECUTING state-v2 needs the ``protobuf`` wheel
        (the Python worker speaks protobuf to the state server),
        which this image lacks — the parity test skips in that case.
        ``user_profiles`` (applyInPandasWithState) is the executable
        twin here and stays the tested default."""
        return events.groupBy("user_id").transformWithStateInPandas(
            UserProfileProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pre-4.0 PySpark — old API only
    StatefulProcessor = StatefulProcessorHandle = None  # type: ignore[assignment]
    user_profiles_tws = None  # type: ignore[assignment]


# --- streaming CUSUM monitor ----------------------------------------

CUSUM_STATE = T.StructType(
    [
        T.StructField("pref", T.DoubleType()),      # drift-corrected prefix sum
        T.StructField("min_pref", T.DoubleType()),  # min over 0..t incl. P_0=0
        T.StructField("max_cplus", T.DoubleType()),
        T.StructField("peak_day", T.StringType()),
        T.StructField("n_days", T.LongType()),
    ]
)

CUSUM_OUTPUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_days", T.LongType()),
        T.StructField("max_cusum", T.DoubleType()),
        T.StructField("peak_day", T.StringType()),
        T.StructField("breached", T.BooleanType()),
    ]
)


def cusum_monitor_stream(
    events: DataFrame, params: dict[str, tuple[float, float, float]]
) -> DataFrame:
    """Streaming CUSUM change-point monitor (r9): the batch key
    pipeline_cusum_changepoint re-derives the whole statistic per
    run; this operator maintains it INCREMENTALLY per event type via
    ``applyInPandasWithState`` — per-key state is exactly the closed
    form's two accumulators (the drift-corrected prefix sum P_t and
    min_{0≤i≤t} P_i, P_0 = 0 included per the late-r9 fix) plus the
    running peak, so each micro-batch costs one shuffle on
    event_type and O(types) state, however long the stream runs.

    ``params`` maps event_type → (mu, allowance, threshold): in the
    batch key μ and σ are estimated from the full series, which a
    causal monitor cannot do — production CUSUM fixes them from a
    reference window (Page's original formulation), so they are
    inputs here. Alignment contract: input rows must be DAILY
    aggregates (day string, x double) and a day must not straddle
    micro-batches — CUSUM increments per day, and a split day would
    enter as two half-increments (the parity test feeds whole-day
    files; production uses the daily-rollup stream upstream).

    Emits the running (n_days, max_cusum, peak_day, breached) per
    type each batch — the live dashboard row. Parity with the batch
    closed form is pytest-pinned to float tolerance (the stream
    accumulates sequential doubles where the batch uses exact
    decimal cumulatives; the ordering is identical, so they agree to
    ulps, not bits — tolerance 1e-9 relative)."""

    def update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        mu, allow, threshold = params.get(etype, (0.0, 0.0, float("inf")))
        if state.exists:
            pref, min_pref, max_c, peak, n = state.get
        else:
            pref, min_pref, max_c, peak, n = 0.0, 0.0, 0.0, "", 0
        rows = pd.concat(list(batches), ignore_index=True)
        rows = rows.sort_values("day")
        for _, r in rows.iterrows():
            pref += float(r["x"]) - (mu + allow)
            min_pref = min(min_pref, pref)  # includes P_0 = 0 start
            c_plus = pref - min_pref
            n += 1
            if c_plus > max_c:
                max_c, peak = c_plus, str(r["day"])
        state.update((pref, min_pref, max_c, peak, n))
        yield pd.DataFrame(
            [
                {
                    "event_type": etype,
                    "n_days": n,
                    "max_cusum": max_c,
                    "peak_day": peak,
                    "breached": bool(max_c > threshold),
                }
            ]
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=CUSUM_OUTPUT,
        stateStructType=CUSUM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RUNNING_DISTINCT_STATE = T.StructType(
    [T.StructField("seen_types", T.ArrayType(T.StringType()))]
)

# the late_delay_seconds variant: + per-user high-water mark (µs).
# A DIFFERENT state schema ⇒ a different checkpoint lineage — turning
# the guard on is a new query, not a restart (the v2 restart contract)
RUNNING_DISTINCT_STATE_GUARDED = T.StructType(
    [
        T.StructField("seen_types", T.ArrayType(T.StringType())),
        T.StructField("hi_us", T.LongType()),
    ]
)

RUNNING_DISTINCT_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("distinct_types_so_far", T.LongType()),
    ]
)


def running_distinct_stream(
    events: DataFrame, late_delay_seconds: int | None = None
) -> DataFrame:
    """Streaming twin of the batch key ``win_running_distinct`` (r9):
    per-user running count of distinct event types, maintained
    INCREMENTALLY via ``applyInPandasWithState`` — the batch key
    re-windows the whole history per run; this operator keeps each
    user's SEEN-TYPE SET as state and emits one output row per input
    event, so a micro-batch costs one shuffle on user_id and state
    is O(users × type-cardinality). Event-type domains are small by
    construction (bounded enums); an unbounded domain (URLs, SKUs at
    the long tail) would swap the exact set for a KMV/HLL register
    set — same state shape, approximate count.

    Alignment contract (the cusum_monitor precedent): rows within a
    micro-batch are ordered by (ts, event_id) before updating, so
    parity with the batch window is EXACT (integer counts, no
    floats) as long as a user's events do not arrive out of order
    ACROSS micro-batches — the parity test feeds time-chunked files.

    ``late_delay_seconds`` is the INLINE late-row guard (r13): the
    engine never filters late input into applyInPandasWithState (an
    upstream withWatermark is inert here — measured, pinned in
    tests/test_streaming.py) and Spark forbids chaining a second
    stateful operator like ``late_row_filter`` in the same query, so
    eviction has to live inside the update function. When set, state
    gains a per-user high-water mark (max event time of PREVIOUS
    batches — the engine watermark's batch-delayed semantics) and
    rows more than the delay behind it are dropped before they can
    touch the seen-set. Default None keeps the r9 state schema
    byte-identical (existing checkpoints restart cleanly)."""
    guarded = late_delay_seconds is not None

    def update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            seen = set(state.get[0])
            hi_us = state.get[1] if guarded else None
        else:
            seen, hi_us = set(), None
        rows = pd.concat(list(batches), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        if guarded:
            # NULL ts: unordered, drop (ts IS NOT NULL convention) —
            # NaT astypes to int64-min and would read maximally late
            rows = rows[rows["ts"].notna()]
            if rows.empty:
                state.update((sorted(seen), hi_us))
                yield pd.DataFrame(
                    {"user_id": [], "event_id": [],
                     "distinct_types_so_far": []}
                )
                return
            ts_us = rows["ts"].astype("int64") // 1000  # ns → µs
            if hi_us is not None:
                rows = rows[ts_us >= hi_us - late_delay_seconds * 1_000_000]
            new_hi = int(ts_us.max())
            hi_us = new_hi if hi_us is None else max(hi_us, new_hi)
        out_ids, out_counts = [], []
        for _, r in rows.iterrows():
            seen.add(str(r["event_type"]))
            out_ids.append(int(r["event_id"]))
            out_counts.append(len(seen))
        state.update((sorted(seen), hi_us) if guarded else (sorted(seen),))
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)] * len(out_ids),
                "event_id": out_ids,
                "distinct_types_so_far": out_counts,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_DISTINCT_OUTPUT,
        stateStructType=(
            RUNNING_DISTINCT_STATE_GUARDED if guarded else RUNNING_DISTINCT_STATE
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- operator-side late-row eviction ---------------------------------

def late_row_filter(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    delay_seconds: int = 3600,
) -> DataFrame:
    """Watermark-style late-row eviction for CUSTOM stateful pipelines.

    Measured (r13, pinned in tests/test_streaming.py): this Spark
    build never filters late input to ``applyInPandasWithState`` —
    an upstream ``withWatermark`` plus either NoTimeout or
    EventTimeTimeout still delivers rows older than the advanced
    watermark to the state function. That matches Spark's documented
    contract (automatic late filtering covers aggregations / dedup /
    stream-stream joins; arbitrary stateful ops must guard
    themselves), so the engine provides the guard as an OPERATOR:
    per-key state is one high-water mark (max event time seen in
    PREVIOUS micro-batches — the same batch-delayed semantics the
    engine watermark has), and a row is dropped iff its event time is
    more than ``delay_seconds`` behind that mark. Within-batch
    disorder is tolerated (the mark advances only between batches).

    Scale: the mark is per KEY, not global — stricter than an engine
    watermark (one slow key cannot hold back eviction for the rest)
    and coordination-free: one shuffle on the key, O(keys) state.

    Composition limit (also measured, r13): Spark rejects TWO
    applyInPandasWithState operators in one streaming query
    ("Multiple applyInPandasWithStates are not supported"), so this
    op guards ingest-edge queries whose downstream is a sink /
    foreachBatch / windowed agg; a downstream CUSTOM stateful op must
    inline the same guard instead — ``running_distinct_stream``'s
    ``late_delay_seconds`` parameter is that inline form, and the
    SPRT/Page-Hinkley monitors carry their own day-monotone guards."""
    out_schema = events.schema
    state_schema = "hi_us long"
    names = [f.name for f in out_schema.fields]

    def update(
        key_vals: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        hi_us = state.get[0] if state.exists else None
        rows = pd.concat(list(batches), ignore_index=True)
        # NULL event times cannot be ordered: drop them explicitly
        # (the engine-wide ts IS NOT NULL convention) — NaT would
        # otherwise astype to int64-min and read as maximally late,
        # and an all-NaT batch would poison the high-water mark
        rows = rows[rows[ts_col].notna()]
        if rows.empty:
            yield rows[names]
            return
        ts_us = rows[ts_col].astype("int64") // 1000  # ns → µs
        if hi_us is not None:
            keep = rows[ts_us >= hi_us - delay_seconds * 1_000_000]
        else:
            keep = rows
        new_hi = int(ts_us.max())
        state.update((new_hi if hi_us is None else max(hi_us, new_hi),))
        yield keep[names]

    return events.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming SPRT monitor -----------------------------------------

SPRT_STATE = T.StructType(
    [
        T.StructField("n1", T.LongType()),        # running successes
        T.StructField("n0", T.LongType()),        # running failures
        T.StructField("decision", T.StringType()),
        T.StructField("day_decided", T.StringType()),
        T.StructField("day_seen", T.StringType()),  # max day ever seen
    ]
)

SPRT_OUTPUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("decision", T.StringType()),
        T.StructField("day_decided", T.StringType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("n_success", T.LongType()),
        T.StructField("llr", T.DoubleType()),
    ]
)


def sprt_monitor_stream(daily: DataFrame) -> DataFrame:
    """Streaming Wald SPRT (r11): the batch key ``pipeline_sprt``
    re-walks the whole daily table per run; this operator maintains
    the sequential test INCREMENTALLY per event type via
    ``applyInPandasWithState``. Per-key state is exactly the test's
    sufficient statistic — the two running counts (n1, n0) — plus the
    frozen decision: a sequential test STOPS at its first boundary
    crossing, so once decided the counts freeze and every later batch
    just re-emits the verdict (the always-valid dashboard row).

    The LLR uses the SAME scaled-integer constants as the batch key
    (imported — one source of truth), so stream/batch parity is
    EXACT, not tolerance-based: integer counts x integer constants
    have no accumulation error to diverge on. Alignment contract as
    cusum_monitor_stream: input rows are DAILY aggregates
    (event_type, day string, s long, f long) and a day must not
    straddle micro-batches.

    State-schema note: the r12 day_seen field makes SPRT_STATE v2 —
    a query restarted against a pre-r12 checkpoint fails Spark's
    state-store schema validation; restart from a fresh checkpoint
    (the standard applyInPandasWithState migration contract).

    Scale: one shuffle per micro-batch on event_type, O(types) state,
    unbounded stream length — the 100 TB-stream form of the batch
    key's calendar-bounded window walk."""
    from osm_airflow_spark.plans.experiments import _SPRT_A, _SPRT_C0, _SPRT_C1

    def update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        if state.exists:
            n1, n0, decision, dday, day_seen = state.get
        else:
            n1, n0, decision, dday, day_seen = 0, 0, "continue", "", ""
        rows = pd.concat(list(batches), ignore_index=True).sort_values("day")
        # max-day-seen persists in state (ISO day strings: lexicographic
        # max == chronological max), so the 'continue' row's day is
        # MONOTONE even when a late/replayed batch carries earlier days
        # than one already processed — the batch's own max(day) would
        # regress.
        day_seen = max(day_seen, str(rows["day"].max()))
        for _, r in rows.iterrows():
            if decision != "continue":
                break  # sequential test stopped: counts freeze
            n1 += int(r["s"])
            n0 += int(r["f"])
            llr_m = n1 * _SPRT_C1 - n0 * _SPRT_C0
            if llr_m >= _SPRT_A:
                decision, dday = "accept_h1", str(r["day"])
            elif llr_m <= -_SPRT_A:
                decision, dday = "accept_h0", str(r["day"])
        state.update((n1, n0, decision, dday, day_seen))
        llr_m = n1 * _SPRT_C1 - n0 * _SPRT_C0
        yield pd.DataFrame(
            [
                {
                    "event_type": etype,
                    "decision": decision,
                    "day_decided": dday if decision != "continue" else day_seen,
                    "n_seen": n1 + n0,
                    "n_success": n1,
                    "llr": float(llr_m) / 1000000.0,
                }
            ]
        )

    return daily.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=SPRT_OUTPUT,
        stateStructType=SPRT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PH_STATE = T.StructType(
    [
        T.StructField("t", T.LongType()),
        T.StructField("s", T.LongType()),
        T.StructField("m", T.LongType()),
        T.StructField("rmin", T.LongType()),
        T.StructField("ph_max", T.LongType()),
        T.StructField("peak_day", T.StringType()),
        T.StructField("day_seen", T.StringType()),
    ]
)

PH_OUTPUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_days", T.LongType()),
        T.StructField("ph_max", T.DoubleType()),
        T.StructField("peak_day", T.StringType()),
    ]
)


def page_hinkley_stream(daily: DataFrame) -> DataFrame:
    """Streaming Page-Hinkley drift monitor: the batch key
    ``pipeline_page_hinkley`` re-walks the whole daily table per run;
    this operator maintains the identical recursion INCREMENTALLY per
    event type via ``applyInPandasWithState``. PH is the
    streaming-NATIVE drift statistic — unlike CUSUM it needs no
    global mu/sigma, so per-key state is just the walk's sufficient
    statistic: (t, s, m, running min, peak, peak day).

    Arithmetic is token-identical to the batch key: exact integer
    micros, the one rational mean_i = s/i evaluated as the SAME IEEE
    double division then rounded with Spark's exact F.round
    semantics — HALF_UP on the SHORTEST DECIMAL REPR of the quotient
    (Decimal(repr(q)); a floor(q+0.5) shortcut is NOT equivalent:
    q = 0.49999999999999994 floors to 1 because q+0.5 rounds up
    across the binade, while both batch engines emit 0 — the classic
    Math.round defect, r12 review finding) — so stream/batch parity
    is exact, not tolerance-based.
    Alignment contract as sprt_monitor_stream: rows are DAILY
    aggregates (event_type, day string, xm long micros), a day must
    not straddle micro-batches, and days must arrive ascending —
    rows at or before the persisted max-day are SKIPPED (replay
    idempotence; a drift walk is order-defined, so a late earlier
    day cannot be retrofitted — that is the batch key's job).

    State-schema note: PH_STATE is v1; as with any
    applyInPandasWithState operator, changing the state struct
    requires a fresh checkpoint (Spark's state store validates the
    schema on restart).

    Scale: one shuffle per micro-batch on event_type, O(types)
    state, unbounded stream length."""
    from decimal import ROUND_HALF_UP, Decimal

    def _round_like_spark(q: float) -> int:
        # Spark F.round(double, 0) = BigDecimal.valueOf(q) (shortest
        # decimal repr) + HALF_UP; decimal.ROUND_HALF_UP is half-away
        # for negatives too, matching Spark/DuckDB on every quotient
        # the batch key can produce.
        return int(
            Decimal(repr(q)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
        )

    def update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        if state.exists:
            t, s, m, rmin, ph_max, peak_day, day_seen = state.get
        else:
            t, s, m, rmin, ph_max, peak_day, day_seen = (
                0, 0, 0, 0, -1, "", ""
            )
        rows = pd.concat(list(batches), ignore_index=True).sort_values("day")
        for _, r in rows.iterrows():
            day = str(r["day"])
            if day_seen and day <= day_seen:
                continue  # replayed/late day: the walk is order-defined
            day_seen = day
            t += 1
            s += int(r["xm"])
            q = s / t  # the engines' double division, exactly
            mean = _round_like_spark(q)
            m += int(r["xm"]) - mean
            rmin = m if t == 1 else min(rmin, m)
            ph = m - rmin
            if ph > ph_max:
                ph_max, peak_day = ph, day
        state.update((t, s, m, rmin, ph_max, peak_day, day_seen))
        if t > 0:
            yield pd.DataFrame(
                [
                    {
                        "event_type": etype,
                        "n_days": t,
                        "ph_max": float(ph_max) / 1000000.0,
                        "peak_day": peak_day,
                    }
                ]
            )

    return daily.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=PH_OUTPUT,
        stateStructType=PH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- Space-Saving heavy hitters --------------------------------------

HEAVY_HITTERS_STATE = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("errors", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)

HEAVY_HITTERS_OUTPUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("est_count", T.LongType()),
        T.StructField("max_err", T.LongType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("batch_hi_us", T.LongType()),
    ]
)


def heavy_hitters_stream(events: DataFrame, k: int = 8) -> DataFrame:
    """Streaming HEAVY HITTERS per event type — Space-Saving
    (Metwally, Agrawal & El Abbadi 2005) with k counters per group:
    which users dominate each event type, maintained incrementally
    with O(k) state per type regardless of user cardinality (the
    bounded-state twin of agg_countmin_sketch's batch heavy-hitter
    screen, and the shape a 100 TB vocabulary monitor uses — swap
    user_id for token). Guarantees, pinned in tests: every counter's
    TRUE count lies in [est_count − max_err, est_count]; any item
    with true count > n_seen/k is guaranteed tracked; with
    k ≥ distinct items every count is EXACT (max_err = 0) and equals
    the batch groupBy — the exactness contract.

    Each micro-batch emits the full current counter snapshot per
    type (at most k rows) stamped with the batch's max event-time
    (µs), so a consumer reads the latest snapshot per type and a
    test can select a specific batch's view. Rows within a batch are
    ordered (ts, event_id) before updating — the engine-wide
    alignment contract — though Space-Saving totals are
    order-insensitive within a batch.

    Scale: one shuffle per micro-batch on event_type; state is
    3 arrays × k per type. Skewed types are exactly the point —
    the counters absorb the skew instead of the shuffle."""

    def update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        if state.exists:
            items, counts, errors, n_seen = (
                list(state.get[0]),
                list(state.get[1]),
                list(state.get[2]),
                int(state.get[3]),
            )
        else:
            items, counts, errors, n_seen = [], [], [], 0
        table = {
            it: (c, e) for it, c, e in zip(items, counts, errors)
        }
        rows = pd.concat(list(batches), ignore_index=True)
        rows = rows[rows["ts"].notna()].sort_values(["ts", "event_id"])
        hi_us = (
            int(rows["ts"].astype("int64").max() // 1000)
            if len(rows)
            else None
        )
        for uid in rows["user_id"].astype("int64"):
            it = str(int(uid))
            n_seen += 1
            if it in table:
                c, e = table[it]
                table[it] = (c + 1, e)
            elif len(table) < k:
                table[it] = (1, 0)
            else:
                # evict the minimum counter (ties: lexicographically
                # smallest item string — deterministic) and inherit
                # its count as the new item's overestimation error
                evict = min(table.items(), key=lambda kv: (kv[1][0], kv[0]))
                mc = evict[1][0]
                del table[evict[0]]
                table[it] = (mc + 1, mc)
        items = sorted(table)
        counts = [table[it][0] for it in items]
        errors = [table[it][1] for it in items]
        state.update((items, counts, errors, n_seen))
        if hi_us is None:
            yield pd.DataFrame(
                {c.name: [] for c in HEAVY_HITTERS_OUTPUT.fields}
            )
            return
        yield pd.DataFrame(
            {
                "event_type": [etype] * len(items),
                "user_id": [int(it) for it in items],
                "est_count": counts,
                "max_err": errors,
                "n_seen": [n_seen] * len(items),
                "batch_hi_us": [hi_us] * len(items),
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=HEAVY_HITTERS_OUTPUT,
        stateStructType=HEAVY_HITTERS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- Deterministic bottom-k sample ----------------------------------

BOTTOMK_STATE = T.StructType(
    [
        T.StructField("hs", T.ArrayType(T.LongType())),
        T.StructField("eids", T.ArrayType(T.LongType())),
        T.StructField("uids", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)

BOTTOMK_OUTPUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("h", T.LongType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("batch_hi_us", T.LongType()),
    ]
)


def bottomk_sample_stream(events: DataFrame, k: int = 8) -> DataFrame:
    """Streaming DETERMINISTIC UNIFORM SAMPLE per event type — the
    bottom-k sketch (Cohen & Kaplan 2007): keep the k events whose
    content hash is smallest, maintained incrementally with O(k)
    state per type. Because the "randomness" is xxhash64(event_id)
    derived IN-PLAN (the engine-wide no-rand() rule), the stream
    state after any prefix EXACTLY equals the batch bottom-k over
    that prefix — replay-stable, mergeable across partitions and
    micro-batches, and restartable from checkpoints without sampling
    drift. The subsampling primitive of a training-data pipeline at
    100 TB (pair with llm_sample_weighted's batch twin): a uniform
    k-sample per stratum whose membership is reproducible across
    reruns, engines and partitionings.

    Each micro-batch emits the full current sample snapshot per type
    (at most k rows) stamped with the batch's max event-time (µs) —
    the heavy_hitters_stream snapshot convention. Ties are
    impossible: the sort key (h, event_id) is unique per event.

    Scale: one shuffle per micro-batch on event_type; state is three
    k-length arrays per type. Cross-run determinism is the point —
    a resumed or re-partitioned job reproduces the identical
    sample."""
    from pyspark.sql import functions as F

    hashed = events.withColumn("h", F.xxhash64("event_id"))

    def update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        if state.exists:
            triples = list(
                zip(state.get[0], state.get[1], state.get[2])
            )
            n_seen = int(state.get[3])
        else:
            triples, n_seen = [], 0
        rows = pd.concat(list(batches), ignore_index=True)
        rows = rows[rows["ts"].notna()]
        hi_us = (
            int(rows["ts"].astype("int64").max() // 1000)
            if len(rows)
            else None
        )
        n_seen += int(len(rows))
        for h, eid, uid in zip(
            rows["h"].astype("int64"),
            rows["event_id"].astype("int64"),
            rows["user_id"].astype("int64"),
        ):
            triples.append((int(h), int(eid), int(uid)))
        triples.sort(key=lambda t: (t[0], t[1]))
        triples = triples[:k]
        state.update(
            (
                [t[0] for t in triples],
                [t[1] for t in triples],
                [t[2] for t in triples],
                n_seen,
            )
        )
        if hi_us is None:
            yield pd.DataFrame(
                {c.name: [] for c in BOTTOMK_OUTPUT.fields}
            )
            return
        yield pd.DataFrame(
            {
                "event_type": [etype] * len(triples),
                "event_id": [t[1] for t in triples],
                "user_id": [t[2] for t in triples],
                "h": [t[0] for t in triples],
                "n_seen": [n_seen] * len(triples),
                "batch_hi_us": [hi_us] * len(triples),
            }
        )

    return hashed.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=BOTTOMK_OUTPUT,
        stateStructType=BOTTOMK_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
