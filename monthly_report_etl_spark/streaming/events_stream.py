"""Structured Streaming over the ``events`` stream (the reference is batch
only — SURVEY §2.11; this is the streaming extension on the ``events``
fixture, BASELINE.json north star).

* ``windowed_counts_stream`` — readStream → watermark → tumbling
  event-time window aggregation. Watermark bounds state: late rows beyond
  10 minutes are dropped, so state size is O(windows in flight), not
  O(stream length) — the 100 TB/day streaming shape.
* ``sessionize_batch`` — gap-based sessionization expressed with lag +
  windowed cumsum; in streaming the same semantics come from
  ``session_window`` (both included; the batch form is oracle-checkable).
* ``stateful_user_counts`` — arbitrary stateful processing via
  ``applyInPandasWithState`` (running per-user counters with timeout) —
  the custom-stateful-operator template.

events.parquet has shipped with ``ts`` as TIMESTAMP(NANOS) (rounds 1-4)
and TIMESTAMP(MICROS) (round 5+); ``_read_events_stream`` probes the
footer and normalizes both to session-TZ TIMESTAMP (see catalog._events).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def _events_stream_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


# nanos-as-long layout (rounds 1-4: TIMESTAMP(NANOS) physical type)
EVENTS_STREAM_SCHEMA = _events_stream_schema(T.LongType())
# micros layout (round 5+: TIMESTAMP(MICROS) physical type → NTZ)
EVENTS_STREAM_SCHEMA_MICROS = _events_stream_schema(T.TimestampNTZType())


def _ts_is_nanos(src_dir: str) -> bool:
    """Probe the physical ``ts`` type of the parquet files in ``src_dir``
    (driver-side footer reads, not a data pass). ALL files are probed and
    must agree (ADVICE r5): a staged directory mixing nanos- and
    micros-layout files would otherwise read the remainder with the wrong
    schema (long vs timestamp) and fail or mis-decode."""
    import pyarrow.parquet as pq

    types = {
        str(pq.read_schema(os.path.join(src_dir, name)).field("ts").type)
        for name in sorted(os.listdir(src_dir))
        if name.endswith(".parquet")
    }
    if not types:
        raise FileNotFoundError(f"no parquet files in {src_dir}")
    if len(types) > 1:
        raise ValueError(
            f"mixed physical ts types in {src_dir}: {sorted(types)} — "
            "stage nanos- and micros-layout files in separate directories"
        )
    return types.pop() == "timestamp[ns]"


def _read_events_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over the staged events directory, normalizing ``ts`` to
    session-TZ TIMESTAMP across both physical layouts the fixture has
    shipped with (see catalog._events). Streaming sources need an explicit
    schema, so the probe picks which one matches the files on disk.

    ``max_files_per_trigger`` bounds each micro-batch to that many input
    files (file-source option) — the soak harness uses it to drive a
    time-ordered multi-batch run so watermark advance and state eviction
    actually happen between batches; default (None) keeps the
    process-everything-in-one-batch behavior the throughput bench times."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if _ts_is_nanos(src_dir):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        stream = (
            reader.schema(EVENTS_STREAM_SCHEMA)
            .format("parquet")
            .load(src_dir)
            # integer DIV: epoch-nanos exceed double's 2^53 exact range
            .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        )
        return stream
    return (
        reader.schema(EVENTS_STREAM_SCHEMA_MICROS)
        .format("parquet")
        .load(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )

SESSION_GAP_MINUTES = 30


def _stage_events_dir(sf_dir: str) -> str:
    """Streaming sources read directories; stage the single events.parquet
    into a temp dir (driver-side file copy, not a data pass).

    Keyed by a STABLE digest of the path (Python's ``hash`` is salted per
    process, which littered /tmp with one dir per run); the copy is
    refreshed when the source's (size, mtime) changed so a regenerated
    fixture is never silently reused.
    """
    import hashlib

    key = hashlib.md5(sf_dir.encode("utf-8")).hexdigest()[:16]
    staged = os.path.join(tempfile.gettempdir(), f"events_stream_{key}")
    os.makedirs(staged, exist_ok=True)
    src = os.path.join(sf_dir, "events.parquet")
    dst = os.path.join(staged, "events.parquet")
    s = os.stat(src)
    if (
        not os.path.exists(dst)
        or os.stat(dst).st_size != s.st_size
        or os.stat(dst).st_mtime < s.st_mtime
    ):
        shutil.copy2(src, dst)
    return staged


def windowed_counts_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream → watermark(10 min) → 1-hour tumbling windows per
    event_type: count + sum(value)."""
    stream = _read_events_stream(spark, src_dir, max_files_per_trigger)
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def sliding_window_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """readStream → watermark(10 min) → 1-hour windows every 15 minutes —
    the streaming twin of ``analytics.events_sliding_window`` (each event
    in exactly 4 windows; state = open windows inside the watermark
    horizon, so 4 window-groups per key at steady state)."""
    stream = _read_events_stream(spark, src_dir)
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def run_sliding_window_once(
    spark: SparkSession, sf_dir: str, query_name: str = "sliding_counts"
) -> DataFrame:
    src = _stage_events_dir(sf_dir)
    q = (
        sliding_window_stream(spark, src)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_windowed_counts_once(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "windowed_counts",
    progress: list | None = None,
) -> DataFrame:
    """Drive the streaming query to completion over the staged fixture
    (memory sink + processAllAvailable) and return the materialized result.

    Pass a list as ``progress`` to receive the run's StreamingQueryProgress
    dicts (``recentProgress``) — the bench reads ``stateOperators`` from
    them (numRowsTotal / memoryUsedBytes) so the state-size claim rides
    the measured run instead of a design note."""
    src = _stage_events_dir(sf_dir)
    q = (
        windowed_counts_stream(spark, src)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
        if progress is not None:
            progress.extend(q.recentProgress)
    finally:
        q.stop()
    return spark.table(query_name)


# ---------------------------------------------------------------------------
# sessionization — batch form (oracle-checkable) mirroring session_window
# ---------------------------------------------------------------------------

SESSIONIZE_ORACLE = f"""
WITH marked AS (
    SELECT user_id, ts,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL {SESSION_GAP_MINUTES} MINUTES
                     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_new,
           event_id
    FROM events WHERE ts IS NOT NULL
),
numbered AS (
    SELECT user_id, ts,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
    FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(ts) AS TIMESTAMP) AS session_start,
       CAST(max(ts) AS TIMESTAMP) AS session_end
FROM numbered
GROUP BY user_id, session_id
"""


def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (lag → new-session flag → running sum).

    One shuffle keyed by user_id serves both window passes (same
    partitioning); session stats come from the subsequent hash agg on
    (user_id, session_id) — co-partitioned, no extra exchange.

    NULL event time (r15 boundary hunt): a session is DEFINED by time
    gaps, so an event with no timestamp cannot belong to one — and the
    engines disagreed on what to do with it (Spark's NULLS-FIRST sort
    gave it its own session; DuckDB's NULLS-LAST lag comparison
    silently merged it into the user's last session). Filtered out on
    both sides, the same convention as the tumbling windows and the
    sequence corpus (a streaming source would never emit it: no event
    time, no watermark).
    """
    from monthly_report_etl_spark.catalog import _events

    ev = _events(spark, sf_dir).filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Full microsecond precision: cast('long') truncates to seconds, which
    # would split a gap in (1800s, 1801s] differently from the INTERVAL
    # comparison in the oracle and from session_window.
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    marked = ev.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > SESSION_GAP_MINUTES * 60 * 1_000_000), 1).otherwise(0),
    )
    numbered = marked.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# arbitrary stateful processing template
# ---------------------------------------------------------------------------

_STATE_SCHEMA = "n LONG"
_STATEFUL_OUTPUT_SCHEMA = "user_id LONG, n_events_total LONG"


def _count_events(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (n,) = state.get if state.exists else (0,)
    for pdf in batches:
        n += len(pdf)
    state.update((n,))
    yield pd.DataFrame({"user_id": [key[0]], "n_events_total": [n]})


def stateful_user_counts(spark: SparkSession, src_dir: str) -> DataFrame:
    """Custom stateful streaming operator: running per-user event counts
    via ``applyInPandasWithState`` (update mode, no timeout)."""
    stream = _read_events_stream(spark, src_dir)
    return stream.groupBy("user_id").applyInPandasWithState(
        _count_events,
        outputStructType=_STATEFUL_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_counts_once(spark: SparkSession, sf_dir: str, query_name: str = "stateful_counts") -> DataFrame:
    src = _stage_events_dir(sf_dir)
    q = (
        stateful_user_counts(spark, src)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


# batch tumbling-window counts — same windowing semantics, oracle-checkable.
# WHERE ts IS NOT NULL (r15): Spark's window() EXCLUDES rows whose event
# time is NULL (no timestamp -> no window, the streaming semantics), while
# a bare date_trunc group kept a NULL window row — the oracle now mirrors
# the drop.
TUMBLING_WINDOW_ORACLE = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2
"""


def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the streaming aggregation (identical window
    semantics: 1-hour tumbling windows align with hour truncation)."""
    from monthly_report_etl_spark.catalog import _events

    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


CATALOG: dict[str, tuple] = {
    "streaming_tumbling_window_batch": (tumbling_window_counts, TUMBLING_WINDOW_ORACLE),
    "streaming_sessionize": (sessionize_batch, SESSIONIZE_ORACLE),
}


# ---------------------------------------------------------------------------
# stream-stream interval join (click → purchase attribution)
# ---------------------------------------------------------------------------

ATTRIBUTION_WINDOW_MINUTES = 30

INTERVAL_JOIN_ORACLE = f"""
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       CAST(c.ts AS TIMESTAMP) AS click_ts,
       CAST(p.ts AS TIMESTAMP) AS purchase_ts
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND p.event_type = 'purchase'
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL {ATTRIBUTION_WINDOW_MINUTES} MINUTES
"""


def interval_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the stream-stream interval join: every purchase
    attributed to each click by the same user in the preceding 30 minutes.

    Equi-join on user_id (ONE shuffle pair) with the time interval as a
    post-join predicate — the exact shape Structured Streaming executes
    with watermark-bounded state below."""
    from monthly_report_etl_spark.catalog import _events

    ev = _events(spark, sf_dir)
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("_uid"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        c.join(
            p,
            (F.col("user_id") == F.col("_uid"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.unix_micros("purchase_ts")
                <= F.unix_micros("click_ts") + ATTRIBUTION_WINDOW_MINUTES * 60 * 1_000_000
            ),
        )
        .select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts")
    )


def interval_join_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming twin: two readStreams, watermarks on BOTH sides, a
    time-interval join condition. The watermarks bound the buffered state
    to the attribution window (+ lateness) — without them a stream-stream
    join's state grows with the stream. State law (measured by
    ``tools/stream_soak.py``, SCALE.md §8g): buffered rows ≈ arrival
    rate × (watermark delay + interval span) on each side — it scales
    with the event RATE inside that horizon, never with stream length;
    ``max_files_per_trigger`` exists so the soak can drive a
    multi-batch run where eviction actually happens between batches."""
    def _stream():
        return _read_events_stream(spark, src_dir, max_files_per_trigger)

    c = (
        _stream()
        .filter(F.col("event_type") == "click")
        .select("user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "1 hour")
    )
    p = (
        _stream()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("_uid"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    return c.join(
        p,
        F.expr(
            f"""
            user_id = _uid AND
            purchase_ts >= click_ts AND
            purchase_ts <= click_ts + INTERVAL {ATTRIBUTION_WINDOW_MINUTES} MINUTES
            """
        ),
    ).select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts")


def run_interval_join_once(
    spark: SparkSession, sf_dir: str, query_name: str = "interval_join"
) -> DataFrame:
    src = _stage_events_dir(sf_dir)
    q = (
        interval_join_stream(spark, src)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


CATALOG["streaming_interval_join_batch"] = (interval_join_batch, INTERVAL_JOIN_ORACLE)


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state v2 API)
# ---------------------------------------------------------------------------

try:  # the v2 state API speaks protobuf to the JVM; gate on the package
    from google.protobuf import descriptor  # noqa: F401

    HAS_TWS_DEPS = True
except Exception:  # pragma: no cover - container lacks python-protobuf
    HAS_TWS_DEPS = False


def _running_agg_processor():
    """StatefulProcessor: per-user running (count, sum) via ValueState —
    the transformWithState twin of stateful_user_counts, on the v2 API
    (typed state handles, timers, TTL support)."""
    import pandas as pd  # noqa: F811 - local import keeps module import light

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningAgg(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState("agg", "n LONG, total DOUBLE")

        def handleInputRows(self, key, rows, timer_values):
            if self._state.exists():
                prev = self._state.get()
                n, total = int(prev[0]), float(prev[1])
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].dropna().sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    return RunningAgg()


def transform_with_state_counts(spark: SparkSession, src_dir: str) -> DataFrame:
    """Per-user running aggregates via ``transformWithStateInPandas``.

    Requires the python ``protobuf`` package (HAS_TWS_DEPS) and the
    RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) set BEFORE the session's
    first streaming query."""
    if not HAS_TWS_DEPS:  # pragma: no cover
        raise ImportError("transformWithState needs the python protobuf package")
    stream = _read_events_stream(spark, src_dir)
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_running_agg_processor(),
        outputStructType="user_id LONG, n_events LONG, sum_value DOUBLE",
        outputMode="Update",
        timeMode="None",
    )


def dedup_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming exact dedup on the event key, with state truly bounded by
    the watermark: ``dropDuplicatesWithinWatermark`` evicts a key's state
    once the watermark passes its event time + delay, so memory is bounded
    by the lateness horizon (plain ``dropDuplicates`` on a key subset that
    excludes the event-time column would keep state for every distinct key
    forever — the watermark does NOT evict it). The trade is explicit:
    duplicates separated by more than the watermark delay are re-emitted,
    which is the only state-bounded contract possible on an unbounded
    stream (the streaming twin of the batch dedup_exact/dedup_latest
    family)."""
    stream = _read_events_stream(spark, src_dir, max_files_per_trigger)
    return (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type", "event_id")
    )


def run_dedup_stream_once(
    spark: SparkSession, sf_dir: str, query_name: str = "dedup_stream"
) -> DataFrame:
    src = _stage_events_dir(sf_dir)
    q = (
        dedup_stream(spark, src)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_windowed_counts_to_tsv(
    spark: SparkSession, sf_dir: str, out_dir: str, query_name: str = "windowed_to_tsv"
) -> None:
    """Streaming aggregation → reference TSV sink via ``foreachBatch``:
    each micro-batch's updated result lands through the SAME sink
    contract (tab/QUOTE_ALL/BOM) the batch jobs use — the pattern for
    pointing an existing batch sink at a stream without a new writer.
    Complete output mode: every batch rewrites the (small, aggregated)
    result — idempotent against replays."""
    from monthly_report_etl_spark.sources.csv import write_tsv

    src = _stage_events_dir(sf_dir)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        write_tsv(batch_df, out_dir, single_file=True, bom=True)

    q = (
        windowed_counts_stream(spark, src)
        .writeStream.outputMode("complete")
        .foreachBatch(_sink)
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_windowed_counts_to_parquet(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    query_name: str = "windowed_to_parquet",
) -> None:
    """Streaming aggregation → parquet files in APPEND mode with a
    CHECKPOINT — the exactly-once file-sink contract: offsets + window
    state live in the checkpoint, finalized windows (watermark passed)
    are written once, and a RESTARTED query resumes from the checkpoint
    instead of re-reading and re-emitting (the restart test drives this
    twice and asserts zero duplicate rows). Append mode means rows land
    only when their window is final — the tail windows inside the
    watermark horizon stay in state, which is the correct unbounded-
    stream behavior (complete/foreachBatch is the finite-replay form
    above)."""
    src = _stage_events_dir(sf_dir)
    q = (
        windowed_counts_stream(spark, src)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def session_window_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """Streaming sessionization via the native ``session_window`` — the
    streaming twin of ``sessionize_batch`` (same 30-minute gap): state per
    open session, closed by the watermark, merged on overlap."""
    stream = _read_events_stream(spark, src_dir)
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(
            F.session_window("ts", f"{SESSION_GAP_MINUTES} minutes").alias("w"),
            "user_id",
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def run_session_window_once(
    spark: SparkSession, sf_dir: str, query_name: str = "session_windows"
) -> DataFrame:
    src = _stage_events_dir(sf_dir)
    q = (
        session_window_stream(spark, src)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
