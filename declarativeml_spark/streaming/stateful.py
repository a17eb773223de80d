"""Custom stateful streaming operators via applyInPandasWithState.

The reference's agent/event layer implies long-lived per-key state
(AGENTS.md:131-132 ``WAIT FOR EVENT``; DISTRIBUTED.md training
coordination rows). The Spark-native form is
``applyInPandasWithState``: per-key state object + Arrow-batched
updates + timeout-driven finalization.

``streaming_sessionize`` is the canonical instance: per-user session
aggregation where a session closes after ``gap`` seconds of silence
(processing-time timeout). The batch equivalent (events_sessionize
query) is oracle-checked; this operator is the infinite-stream form —
state per user is O(1) (current session aggregate), so 10⁹ users is
10⁹ tiny state rows sharded across executors.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        # NTZ like the catalog's ts (see SCD2_OUTPUT_SCHEMA note):
        # session-tz TimestampType would reinterpret the UDF's naive
        # micros as local instants and break batch parity off-UTC
        StructField("session_start", TimestampNTZType()),
        StructField("session_end", TimestampNTZType()),
    ]
)


def _sessionize_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total, start_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [total],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        # pandas datetime64[ns|us] → microseconds; a raw int64 column
        # can only be the legacy nanosAsLong shape (sources/catalog.py
        # normalizes to NTZ upstream), so convert ns → us explicitly —
        # keeping nanos here would make every gap look 1000x larger
        if rows["ts"].dtype.kind == "M":
            ts_us = rows["ts"].astype("datetime64[us]").astype("int64")
        else:
            ts_us = rows["ts"].astype("int64") // 1000
        closed = []
        if state.exists:
            n, total, start_us, last_us = state.get
        else:
            n, total, start_us, last_us = 0, 0.0, None, None
        for t_us, value in zip(ts_us, rows["value"].fillna(0.0)):
            if last_us is not None and t_us - last_us > gap_us:
                closed.append((user_id, n, total, start_us, last_us))
                n, total, start_us = 0, 0.0, None
            if start_us is None:
                start_us = int(t_us)
            n += 1
            total += float(value)
            last_us = int(t_us)
        state.update((n, total, start_us, last_us))
        state.setTimeoutDuration(gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "n_events": [c[1] for c in closed],
                    "total_value": [c[2] for c in closed],
                    "session_start": [pd.Timestamp(c[3], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[4], unit="us") for c in closed],
                }
            )

    return update


def streaming_sessionize(
    events_stream: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Stateful sessionization over a streaming events frame
    (columns: user_id, ts, value)."""
    from pyspark.sql import functions as F

    # a NULL event time has no position on the per-user timeline —
    # and pandas silently maps NaT to the int64-min sentinel
    # (-9.2e18), which would wreck every later gap comparison. Drop
    # before state, mirroring the batch windows' NULL skipping.
    events_stream = events_stream.where(F.col("ts").isNotNull())
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_seconds),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


PACK_STATE_SCHEMA = StructType([StructField("cum", LongType())])

PACK_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("bucket", LongType()),
        StructField("n_tokens", LongType()),
        StructField("chunk_id", LongType()),
        StructField("chunk_offset", LongType()),
        StructField("chunks_spanned", LongType()),
    ]
)


def _pack_fn(context: int):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (bucket,) = key
        # batch parity: the NULL-bucket partition (NULL doc_id rows)
        # still packs — the window sorts NULLS FIRST and the running
        # sum proceeds; int(None)/int(NaN) would kill the query on
        # one NULL id instead
        bucket = None if pd.isna(bucket) else int(bucket)  # NULL key
        # arrives as float NaN through Arrow, not None
        rows = pd.concat(list(pdfs)).sort_values(
            "doc_id", na_position="first"
        )
        cum = int(state.get[0]) if state.exists else 0
        out: dict = {k.name: [] for k in PACK_OUTPUT_SCHEMA}
        for doc_id, n in zip(rows["doc_id"], rows["n_tokens"]):
            out["doc_id"].append(None if pd.isna(doc_id) else int(doc_id))
            out["bucket"].append(bucket)
            if pd.isna(n):
                # batch parity (pack_chunks): size(split(NULL)) is
                # NULL; the window sum skips NULLs so cum does not
                # advance, the chunk position still emits, and
                # chunks_spanned is NULL — int(NaN) would instead
                # kill the stream on one NULL document
                out["n_tokens"].append(None)
                out["chunk_id"].append(cum // context)
                out["chunk_offset"].append(cum % context)
                out["chunks_spanned"].append(None)
                continue
            n = int(n)
            out["n_tokens"].append(n)
            out["chunk_id"].append(cum // context)
            out["chunk_offset"].append(cum % context)
            out["chunks_spanned"].append(
                (cum + n - 1) // context - cum // context + 1
            )
            cum += n
        state.update((cum,))
        yield pd.DataFrame(out)

    return update


def streaming_pack(
    docs_stream: DataFrame,
    context: int = 512,
    buckets: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Stateful concatenate-and-chunk packing over a document stream:
    the per-bucket running token count lives in ``GroupState``, so
    chunk positions CONTINUE across micro-batches — a restarted or
    long-running ingest keeps appending to the same packed layout the
    batch operator (operators/corpus.py::pack_chunks) would produce
    for the same arrival order.

    Scale: state per bucket is ONE long (the cumulative token count)
    — thousands of buckets cost kilobytes; Arrow batches carry only
    (doc_id, bucket, n_tokens) triples, never text. Within a batch,
    rows pack in doc_id order; across batches, in arrival order —
    the stream contract a file/queue source provides.
    """
    from pyspark.sql import functions as F

    # same plan-time refusal as batch pack_chunks: a string id would
    # cast to all-NULL buckets and die row-by-row inside the state
    # function instead of failing loudly here
    id_type = dict(docs_stream.dtypes).get(id_col, "")
    if not (
        id_type in ("tinyint", "smallint", "int", "bigint")
        or id_type.startswith("decimal")
    ):
        raise ValueError(
            f"streaming_pack needs an integer id column for bucketing;"
            f" {id_col!r} is {id_type or 'missing'} — supply a numeric"
            " id (e.g. xxhash64 the string key first)"
        )
    toks = rf"split(trim({text_col}), '\\s+')"
    d = docs_stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (F.col(id_col) % buckets).cast("long").alias("bucket"),
        F.expr(f"size({toks})").cast("long").alias("n_tokens"),
    )
    return d.groupBy("bucket").applyInPandasWithState(
        _pack_fn(context),
        outputStructType=PACK_OUTPUT_SCHEMA,
        stateStructType=PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ANOM_STATE_SCHEMA = StructType(
    [
        StructField("hours_us", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
    ]
)

ANOM_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("hour", TimestampNTZType()),  # NTZ: see SCD2 note
        StructField("n", LongType()),
        StructField("z", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)


def _anomaly_fn(window_size: int, min_full: int, z_cut: float):
    import math

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (event_type,) = key
        if state.exists:
            hours_us, counts = state.get
            hist = list(zip(list(hours_us), list(counts)))
        else:
            hist = []
        rows = pd.concat(list(pdfs)).sort_values("hour")
        # a finalized hourly rollup can't produce NULL buckets or
        # counts, but one malformed row must not poison the trailing
        # window (NaT → int64-min sentinel) or kill the query
        # (int(NaN)) — and the checkpoint would replay it forever
        rows = rows.dropna(subset=["hour", "n"])
        hour_us = rows["hour"].astype("datetime64[us]").astype("int64")
        out: dict = {k.name: [] for k in ANOM_OUTPUT_SCHEMA}
        for h_us, n in zip(hour_us, rows["n"]):
            n = int(n)
            # monotonicity guard: a duplicate or late re-emission of an
            # already-processed hour (update-mode upstream, replayed
            # file) would silently double-count inside the trailing
            # window and corrupt every later z-score — drop it; late
            # corrections require a batch backfill, which the
            # bit-identical batch query provides.
            if hist and int(h_us) <= hist[-1][0]:
                continue
            trail = [c for _, c in hist[-window_size:]]
            m = len(trail)
            if m >= 2:
                s = sum(trail)
                sq = sum(c * c for c in trail)
                # exact-integer sum/sumsq then IEEE division — the
                # identical arithmetic of the batch query
                # (queries/pipeline5.py events_rate_anomalies)
                var = (float(sq) - float(s) * float(s) / m) / (m - 1)
                z = (
                    (float(n) - float(s) / m) / math.sqrt(var)
                    if var > 0
                    else None
                )
                if z is not None:
                    # the batch twin emits sround(z, 4)
                    # (floor(x*1e4 + 0.5)/1e4) — mirror the identical
                    # IEEE op sequence so streaming output equals the
                    # batch query byte for byte, not just to 4dp
                    z = math.floor(z * 1e4 + 0.5) / 1e4
                out["event_type"].append(event_type)
                out["hour"].append(pd.Timestamp(h_us, unit="us"))
                out["n"].append(n)
                out["z"].append(z)
                out["is_anomaly"].append(
                    bool(z is not None and m >= min_full and abs(z) > z_cut)
                )
            hist.append((int(h_us), n))
        hist = hist[-window_size:]
        state.update(
            ([h for h, _ in hist], [c for _, c in hist])
        )
        yield pd.DataFrame(out)

    return update


def streaming_rate_anomalies(
    hourly_stream: DataFrame,
    window_size: int = 24,
    min_full: int = 12,
    z_cut: float = 2.0,
) -> DataFrame:
    """Stateful streaming twin of the batch ``events_rate_anomalies``
    query: consumes a stream of FINALIZED hourly counts (event_type,
    hour, n) — e.g. the output of a watermarked hourly rollup — and
    emits each bucket's z-score against the trailing ``window_size``
    buckets, continuing across micro-batches and restarts.

    Scale: state per event type is two window_size-element long
    arrays (the trailing hours and counts) — thousands of event types
    cost kilobytes, and Arrow batches carry 3-column count rows,
    never raw events. Arithmetic matches the batch query exactly
    (integer sum/sum-of-squares, IEEE division), so a backfill
    through the batch path and a live run through this operator agree
    bit-for-bit; tests/test_streaming_pipeline.py asserts it.
    Duplicate or out-of-order re-emissions of an already-processed
    hour are DROPPED (monotonicity guard) — corrections flow through
    the batch backfill instead of corrupting the trailing window.
    """
    return hourly_stream.groupBy("event_type").applyInPandasWithState(
        _anomaly_fn(window_size, min_full, z_cut),
        outputStructType=ANOM_OUTPUT_SCHEMA,
        stateStructType=ANOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


COMPACT_STATE_SCHEMA = StructType(
    [
        StructField("ts_us", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
    ]
)

COMPACT_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("last_ts", TimestampNTZType()),  # NTZ: see SCD2 note
    ]
)


def _compact_fn():
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        best = state.get if state.exists else None  # (ts_us, event_id, type)
        rows = pd.concat(list(pdfs))
        ts_us = rows["ts"].astype("datetime64[us]").astype("int64")
        for t_us, eid, etype in zip(ts_us, rows["event_id"], rows["event_type"]):
            # preserve NULL event_type (batch max_by-struct keeps it
            # NULL; unconditional str() would mint the literal 'nan')
            cand = (
                int(t_us),
                int(eid),
                None if pd.isna(etype) else str(etype),
            )
            # same (ts, event_id) lexicographic ordering as the batch
            # max_by-struct — newest ts wins, event_id breaks ties
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
        state.update(best)
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)],
                "event_id": [best[1]],
                "event_type": [best[2]],
                "last_ts": [pd.Timestamp(best[0], unit="us")],
            }
        )

    return update


def streaming_latest_per_user(events_stream: DataFrame) -> DataFrame:
    """Stateful streaming twin of the batch ``events_latest_per_user``
    compaction: per user, the current newest event, re-emitted
    whenever a micro-batch touches that user — the changelog a
    current-state store (or Kafka compacted topic) consumes.

    Scale: state per key is ONE (ts, id, type) triple — a
    current-state table over 10^9 users is 10^9 tiny rows sharded
    across executors, and Arrow batches carry only the 4 columns the
    comparison needs. The comparison is the same (ts, event_id)
    lexicographic rule as the batch max_by-struct, so after any
    prefix of the stream the emitted state equals the batch query on
    the same prefix (tests assert it across a two-batch split).
    """
    from pyspark.sql import functions as F

    # NULL ts has no timeline position (and NaT becomes the int64-min
    # sentinel, minting a 1677-09-21 last_ts); NULL event_id has no
    # deterministic tie-break. The batch max_by struct never lets
    # such a row win — drop them before state.
    d = events_stream.select(
        "user_id", "event_id", "event_type", "ts"
    ).where(F.col("ts").isNotNull() & F.col("event_id").isNotNull())
    return d.groupBy("user_id").applyInPandasWithState(
        _compact_fn(),
        outputStructType=COMPACT_OUTPUT_SCHEMA,
        stateStructType=COMPACT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TWA_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("last_eid", LongType()),
        StructField("last_value", DoubleType()),
        StructField("wsum_dec", StringType()),  # exact DECIMAL(38,6) sum
        StructField("span_us", LongType()),
        StructField("n_segments", LongType()),
    ]
)

TWA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_segments", LongType()),
        StructField("span_us", LongType()),
        StructField("twa_raw", DoubleType()),
    ]
)


def _twa_fn():
    import decimal

    q6 = decimal.Decimal(1).scaleb(-6)

    def dec6(x: float) -> decimal.Decimal:
        # repr(x) is the shortest round-trip decimal string — the same
        # route Spark's cast(double AS DECIMAL) takes
        # (BigDecimal.valueOf/Double.toString). Quantizing the exact
        # binary expansion Decimal(x) instead rounds HALF_UP ties the
        # other way (e.g. 2.5e-12: engines say 3E-12, exact-expansion
        # says 2E-12), breaking parity with the batch twin on
        # boundary values.
        return decimal.Decimal(repr(x)).quantize(
            q6, rounding=decimal.ROUND_HALF_UP
        )

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts, last_eid, last_val, wsum_s, span, nseg = state.get
            wsum = decimal.Decimal(wsum_s)
        else:
            last_ts, last_eid, last_val, wsum, span, nseg = (
                None, None, None, decimal.Decimal(0), 0, 0,
            )
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        ts_us = rows["ts"].astype("datetime64[us]").astype("int64")
        # DECIMAL(38,6) needs up to 44 significant digits through the
        # quantize; Python's default 28-digit context would raise
        # InvalidOperation on large value*gap products and silently
        # round long-running sums
        with decimal.localcontext() as ctx:
            ctx.prec = 50
            for t_us, eid, val in zip(
                ts_us, rows["event_id"], rows["value"]
            ):
                t_us, eid = int(t_us), int(eid)
                if last_ts is not None and (t_us, eid) <= (
                    last_ts,
                    last_eid,
                ):
                    # monotonicity guard (same policy as the
                    # rate-anomaly and SCD2 twins): a replayed or late
                    # row would add a negative or duplicate segment
                    # and corrupt the exact sum forever — drop it;
                    # corrections flow through batch backfill
                    continue
                if last_ts is not None:
                    gap = t_us - last_ts
                    # each segment's weight contribution rounds to
                    # DECIMAL(38,6) exactly like the batch twin's
                    # cast(value * gap AS DECIMAL(38,6)), then sums
                    # exactly. A NULL value mirrors SUM's NULL
                    # skipping: the segment still counts in span and
                    # n_segments, only the product is skipped —
                    # Decimal('NaN') would otherwise poison the exact
                    # sum permanently.
                    if last_val is not None:
                        wsum += dec6(last_val * float(gap))
                    span += gap
                    nseg += 1
                last_ts, last_eid = t_us, eid
                last_val = None if pd.isna(val) else float(val)
        state.update((last_ts, last_eid, last_val, str(wsum), span, nseg))
        twa = float(wsum) / float(span) if span > 0 else None
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)],
                "n_segments": [nseg],
                "span_us": [span],
                "twa_raw": [twa],
            }
        )

    return update


def streaming_time_weighted_value(events_stream: DataFrame) -> DataFrame:
    """Stateful streaming twin of the batch
    ``events_time_weighted_value``: per user, the running
    time-weighted average of the ``value`` gauge, updated every
    micro-batch — the continuously-maintained form of the
    interval-weighted mean (utilization/price/balance averaging).

    State per key is one (last_ts, last_value, exact-decimal weighted
    sum, span, count) quintuple — O(1) per user regardless of event
    volume. Segment weights round through DECIMAL(38,6) exactly as
    the batch query's cast does (Python decimal HALF_UP — the
    cross-engine-proven semantics of embedding_pca_power), so after
    consuming any in-order prefix of the log, the emitted aggregate
    equals the batch query on the same prefix bit for bit.

    In-order delivery per key is assumed (append-log semantics, the
    contract of the other stateful twins); within a micro-batch rows
    are sorted by (ts, event_id) before folding.
    """
    from pyspark.sql import functions as F

    # NULL ts/event_id rows carry no (ts, event_id) timeline position
    # (the batch LEAD window orders them away; NaT would become the
    # int64-min sentinel and mint a ~9.2e18-microsecond segment) —
    # drop before state. NULL *values* stay: they advance the span
    # like the batch SUM-skipped segments do.
    d = events_stream.select(
        "user_id", "event_id", "value", "ts"
    ).where(F.col("ts").isNotNull() & F.col("event_id").isNotNull())
    return d.groupBy("user_id").applyInPandasWithState(
        _twa_fn(),
        outputStructType=TWA_OUTPUT_SCHEMA,
        stateStructType=TWA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# First-seen-per-user: the stateful core of streaming_new_users.

FIRST_SEEN_STATE_SCHEMA = StructType([StructField("emitted", LongType())])

FIRST_SEEN_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("first_ts_us", LongType()),
    ]
)


def _first_seen_fn():
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            # already emitted in an earlier micro-batch; a later
            # (late-data) smaller ts cannot revise an appended row —
            # the same horizon every no-retraction streaming
            # first-seen carries.
            for _ in pdfs:
                pass
            return
        mn = None
        for pdf in pdfs:
            # NULL ts arrives as NaN through Arrow — the batch MIN
            # skips it; int(NaN) would kill the query (and the
            # checkpoint replays the same poison batch on restart)
            vals = pdf["ts_us"].dropna()
            if len(vals):
                m = int(vals.min())
                mn = m if mn is None else min(mn, m)
        if mn is None:
            return
        state.update((1,))
        yield pd.DataFrame({"user_id": [int(user_id)], "first_ts_us": [mn]})

    return update


def streaming_first_seen(events_stream: DataFrame) -> DataFrame:
    """Per-user first appearance over a stream (columns: user_id,
    ts_us int64): emits (user_id, first_ts_us) exactly once — in the
    first micro-batch the user appears — taking MIN(ts_us) *within*
    that batch, so the emitted timestamp is deterministic however the
    batch's rows are partitioned (a bare ``dropDuplicates`` keeps
    whichever row wins the shuffle race instead).

    State is one long per seen user — O(distinct users), the same
    bound the batch MIN-aggregation carries. Cross-batch late rows
    (a user's true min arriving after their first batch) are beyond
    any append-mode operator; micro-batch boundaries are the
    attribution horizon.
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _first_seen_fn(),
        outputStructType=FIRST_SEEN_OUTPUT_SCHEMA,
        stateStructType=FIRST_SEEN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Per-stratum quota admission (streaming stratified sampling).

QUOTA_STATE_SCHEMA = StructType([StructField("admitted", LongType())])

QUOTA_OUTPUT_SCHEMA = StructType(
    [
        StructField("lang", StringType()),
        StructField("doc_id", LongType()),
        StructField("h", LongType()),
        StructField("rnk", LongType()),
    ]
)


def _quota_fn(quota: int):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (lang,) = key
        admitted = int(state.get[0]) if state.exists else 0
        if admitted >= quota:
            for _ in pdfs:
                pass
            return
        rows = pd.concat(list(pdfs))
        # a NULL hash or id cannot take budget deterministically (the
        # batch row_number orders real values) — and .astype('int64')
        # on NaN would kill the query
        rows = rows.dropna(subset=["h", "doc_id"])
        if not len(rows):
            return
        # deterministic admission WITHIN the batch: smallest
        # (hash, doc_id) first — arrival order across partitions
        # must not decide who gets the remaining budget
        rows = rows.sort_values(["h", "doc_id"]).head(quota - admitted)
        out = pd.DataFrame(
            {
                "lang": lang,
                "doc_id": rows["doc_id"].astype("int64"),
                "h": rows["h"].astype("int64"),
                "rnk": range(admitted + 1, admitted + 1 + len(rows)),
            }
        )
        state.update((admitted + len(rows),))
        yield out

    return update


def streaming_stratified_quota(
    docs_stream: DataFrame, quota: int = 50
) -> DataFrame:
    """Streaming per-stratum quota admission: at most ``quota``
    documents per language ever pass, chosen deterministically
    WITHIN each micro-batch by smallest (Lehmer-hash, doc_id) — the
    ingest-side form of batch ``corpus_stratified_quota``.

    Semantics note (inherent to append-only streams): the batch twin
    keeps the quota globally-smallest hashes, which requires
    retraction to maintain incrementally; the streaming form admits
    batch-by-batch and never evicts. Exact batch-prefix equivalence
    holds when a stratum's candidates arrive within one micro-batch
    — the test feeds the whole table as one batch and asserts
    bit-equality with the oracle-checked batch query.

    Scale: state is ONE long per stratum; Arrow batches carry
    (lang, doc_id, h) triples only.

    Input columns: lang, doc_id, h (precompute h with the shared
    Lehmer expression so stream and batch hash identically).
    """
    return docs_stream.groupBy("lang").applyInPandasWithState(
        _quota_fn(quota),
        outputStructType=QUOTA_OUTPUT_SCHEMA,
        stateStructType=QUOTA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SCD2_STATE_SCHEMA = StructType(
    [
        StructField("open_from_us", LongType()),
        StructField("open_type", StringType()),
        StructField("last_ts_us", LongType()),
        StructField("last_event_id", LongType()),
    ]
)

# valid_from/valid_to are NTZ like the catalog's ts column: a
# session-tz TimestampType here would reinterpret the UDF's naive
# micros as local-time instants and break batch parity off-UTC.
SCD2_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("valid_from", TimestampNTZType()),
        StructField("valid_to", TimestampNTZType()),
    ]
)


def _scd2_fn():
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            open_from, open_type, last_ts, last_eid = state.get
        else:
            open_from = open_type = last_ts = last_eid = None
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        ts_us = rows["ts"].astype("datetime64[us]").astype("int64")
        out_type: list = []
        out_from: list = []
        out_to: list = []
        for t, eid, etype in zip(
            ts_us, rows["event_id"], rows["event_type"]
        ):
            t, eid = int(t), int(eid)
            # a NULL type stays None (str() would mint the literal
            # 'None'); the change test below then matches the batch
            # twin's IS DISTINCT FROM: a LEADING null-type row opens
            # nothing (prev state is null too), a null after a value
            # (or vice versa) is a change
            etype = None if pd.isna(etype) else str(etype)
            if last_ts is not None and (t, eid) <= (last_ts, last_eid):
                # monotonicity guard (same policy as the rate-anomaly
                # twin): late corrections flow through batch backfill,
                # never by rewriting already-emitted intervals
                continue
            last_ts, last_eid = t, eid
            if open_from is None:
                if etype is not None:
                    open_from, open_type = t, etype
            elif etype != open_type:
                out_type.append(open_type)
                out_from.append(open_from)
                out_to.append(t)
                open_from, open_type = t, etype
        state.update((open_from, open_type, last_ts, last_eid))
        if out_type:
            yield pd.DataFrame(
                {
                    "user_id": [int(user_id)] * len(out_type),
                    "event_type": out_type,
                    "valid_from": pd.to_datetime(out_from, unit="us"),
                    "valid_to": pd.to_datetime(out_to, unit="us"),
                }
            )

    return update


def streaming_scd2_intervals(events_stream: DataFrame) -> DataFrame:
    """Stateful streaming twin of the batch ``events_scd2_intervals``
    SCD-type-2 build: per user, consecutive same-type events collapse
    into one open interval held in state; a type CHANGE closes the
    interval and emits it (append mode — closed intervals are
    immutable facts a dimension table can upsert).

    The open (is_current) interval lives ONLY in state: a stream
    cannot emit-then-retract it, so after any prefix the emitted rows
    equal the batch query's CLOSED subset on the same prefix
    (asserted in tests across a two-batch split); the batch backfill
    publishes the open tails.

    Scale: state per user is one (ts, type, ts, id) quadruple —
    bounded, no timeline buffering; only closed-interval rows cross
    the Python boundary.
    """
    from pyspark.sql import functions as F

    # same timeline discipline as the other stateful twins: NULL
    # ts/event_id rows have no (ts, event_id) position (NaT would
    # become the int64-min sentinel) — drop before state
    d = events_stream.select(
        "user_id", "event_id", "event_type", "ts"
    ).where(F.col("ts").isNotNull() & F.col("event_id").isNotNull())
    return d.groupBy("user_id").applyInPandasWithState(
        _scd2_fn(),
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
