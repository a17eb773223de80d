"""Tick-scheduled COMPUTE execution on Structured Streaming.

The reference schedules registered computations ``EVERY n TICKS``
(reference: dsl/parser.py:418-432 validates the tick count; the tick
duration itself is never defined — we define 1 tick = 1 second,
recorded here per SURVEY.md §7.6). The Spark mapping is a streaming
query with ``trigger(processingTime=f"{n} seconds")`` applying the
registered kernel to each micro-batch.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from declarativeml_spark.functions.kernels import COMPUTATIONS, apply_compute

TICK_SECONDS = 1  # 1 tick == 1 second (reference leaves this undefined)


def start_compute_stream(
    stream_df: DataFrame,
    name: str,
    output_table: Optional[str] = None,
    once: bool = False,
) -> StreamingQuery:
    """Run a registered COMPUTE against a streaming DataFrame.

    ``EVERY n TICKS`` → processingTime trigger of ``n`` seconds; a
    registration without a schedule runs as fast as batches arrive.
    The result lands in an in-memory sink (queryable as
    ``output_table``) — a real deployment would write a table/Kafka
    sink via the same handle.
    """
    reg = COMPUTATIONS.get(name)
    if reg is None:
        raise ValueError(f"No registered computation named {name!r}")
    out = apply_compute(stream_df, name)
    writer = out.writeStream.outputMode("append").format("memory").queryName(
        output_table or f"{name}_out"
    )
    if once:
        writer = writer.trigger(availableNow=True)
    elif reg.schedule_ticks:
        writer = writer.trigger(processingTime=f"{reg.schedule_ticks * TICK_SECONDS} seconds")
    return writer.start()
