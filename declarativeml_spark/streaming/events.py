"""Event layer: PUBLISH / SUBSCRIBE / WHEN…THEN reactive rules.

The reference specifies (never implements) a pub/sub event system:
``PUBLISH EVENT type WITH PAYLOAD {json}`` (EXTENSIONS.md:194-210),
``SUBSCRIBE TO 'pattern' EXECUTE PROCEDURE`` (EXTENSIONS.md:213-224),
and reactive workflows ``WHEN <cond> THEN <actions>`` over model
events (DSL.md:123-144). Spark-native design:

* the event log is a DataFrame-shaped stream — ``event_type STRING,
  payload STRING (JSON), ts TIMESTAMP`` — batch (a table) or
  streaming (``readStream``) interchangeably;
* subscriptions are SQL-pattern filters + Python handlers, evaluated
  per micro-batch via ``foreachBatch`` (streaming) or directly
  (batch) — the handler receives only its matched slice;
* WHEN…THEN rules are subscriptions whose predicate may also inspect
  JSON payload fields via ``get_json_object``.

Scale: pattern filtering and payload predicates are Catalyst
expressions pushed into the stream scan; handlers see pre-filtered
micro-batches, so a rule that matches 0.1% of a 100 TB/day stream
pulls 0.1%.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("payload", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("source_instance", T.StringType(), True),
    ]
)


def _like_pattern(pattern: str) -> str:
    """Event patterns match with SQL LIKE; the reference writes
    glob-style wildcards (AGENTS.md:50 ``'model.convergence.*'``), so
    ``*`` translates to ``%`` — an event TYPE never legitimately
    contains a literal asterisk. ``%`` stays a wildcard too — the
    engine's own WHEN rules write raw LIKE patterns (``'ops.%'``).
    LIKE's UNDERSCORE, however, is escaped: event types here
    routinely contain literal underscores
    (``training.epoch_complete``), and an unescaped ``_`` is a
    single-char wildcard that silently overmatches
    (``epochXcomplete`` would fire the rule). ONE chokepoint for
    every matcher (subscribe, wait_for), so the two APIs speak the
    same language."""
    escaped = pattern.replace("\\", "\\\\").replace("_", "\\_")
    return escaped.replace("*", "%")


@dataclass
class Subscription:
    pattern: str  # SQL LIKE pattern on event_type
    handler: Callable[[DataFrame], None]
    payload_predicate: Optional[str] = None  # SQL over get_json_object fields
    name: str = ""


@dataclass
class EventBus:
    """In-session event bus over a DataFrame event log."""

    spark: SparkSession
    subscriptions: List[Subscription] = field(default_factory=list)
    _published: list = field(default_factory=list)

    def publish(
        self, event_type: str, payload: Optional[dict] = None, source: str = "local"
    ) -> None:
        """PUBLISH EVENT type WITH PAYLOAD {...} — append to the log."""
        import datetime as _dt

        self._published.append(
            (
                event_type,
                json.dumps(payload or {}),
                # event-time from the wall clock, matching the
                # reference's created_at DEFAULT now() (EXTENSIONS.md:189).
                # Timezone-AWARE: createDataFrame reads a naive datetime
                # in the session-local timezone, which would shift the
                # stored instant by the UTC offset on non-UTC machines.
                _dt.datetime.now(_dt.timezone.utc),
                source,
            )
        )

    def published_df(self) -> DataFrame:
        return self.spark.createDataFrame(self._published, EVENT_SCHEMA)

    def subscribe(
        self,
        pattern: str,
        handler: Callable[[DataFrame], None],
        payload_predicate: Optional[str] = None,
        name: str = "",
    ) -> Subscription:
        """SUBSCRIBE TO 'pattern' EXECUTE <handler>."""
        sub = Subscription(
            _like_pattern(pattern), handler, payload_predicate, name
        )
        self.subscriptions.append(sub)
        return sub

    def when(
        self, event_type_pattern: str, payload_predicate: str, action: Callable[[DataFrame], None]
    ) -> Subscription:
        """WHEN <event matches + payload predicate> THEN <action>."""
        return self.subscribe(event_type_pattern, action, payload_predicate)

    # -- dispatch -----------------------------------------------------------
    def dispatch_batch(self, events: Optional[DataFrame] = None) -> dict[str, int]:
        """Evaluate all subscriptions against a batch of events.

        Returns per-subscription matched-row counts. Used directly for
        batch logs and from foreachBatch for streams.
        """
        if events is not None:
            df = events
        else:
            # internal log is a queue: each dispatch consumes it so a
            # later dispatch doesn't re-fire rules on old events
            df = self.published_df()
            self._published = []
        counts: dict[str, int] = {}
        errors: list[tuple[str, BaseException]] = []
        for i, sub in enumerate(self.subscriptions):
            matched = df.filter(F.col("event_type").like(sub.pattern))
            if sub.payload_predicate:
                matched = matched.filter(F.expr(sub.payload_predicate))
            n = matched.count()
            counts[sub.name or f"sub{i}"] = n
            if n > 0:
                # handler isolation: one raising handler must not skip
                # every later subscription's delivery of this batch
                # (user-supplied WHEN-rule actions throw); errors
                # surface AFTER the full fan-out
                try:
                    sub.handler(matched)
                except Exception as e:  # noqa: BLE001 - re-raised below
                    errors.append((sub.name or f"sub{i}", e))
        if errors:
            names = ", ".join(n for n, _ in errors)
            raise RuntimeError(
                f"{len(errors)} event handler(s) failed ({names});"
                " every other subscription still received the batch"
            ) from errors[0][1]
        return counts

    def wait_for(
        self,
        pattern: str,
        payload_predicate: Optional[str] = None,
        timeout_s: float = 30.0,
        poll_s: float = 0.5,
    ) -> Optional[DataFrame]:
        """WAIT FOR EVENT … WHERE … (reference AGENTS.md:131-132):
        block until a matching event is published or timeout.

        Polls the internal log without consuming it; returns the
        matched slice, or None on timeout.
        """
        deadline = time.time() + timeout_s
        pattern = _like_pattern(pattern)
        while True:
            df = self.published_df().filter(F.col("event_type").like(pattern))
            if payload_predicate:
                df = df.filter(F.expr(payload_predicate))
            if df.count() > 0:
                return df
            if time.time() >= deadline:
                return None
            time.sleep(poll_s)

    def start_stream(
        self,
        events_stream: DataFrame,
        query_name: str = "event_rules",
        trigger_seconds: Optional[float] = None,
        available_now: bool = False,
    ):
        """Attach the rule set to a streaming event source.

        By default the query runs CONTINUOUSLY (micro-batch as data
        arrives, optionally paced by ``trigger_seconds``) — a rule
        engine that self-terminates after the initial catch-up would
        silently stop firing on a live stream. Pass
        ``available_now=True`` for the drain-and-stop backfill shape.
        """

        def process(batch_df: DataFrame, epoch_id: int) -> None:
            self.dispatch_batch(batch_df)

        writer = events_stream.writeStream.foreachBatch(process).queryName(
            query_name
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_seconds is not None:
            writer = writer.trigger(
                processingTime=f"{trigger_seconds} seconds"
            )
        return writer.start()
