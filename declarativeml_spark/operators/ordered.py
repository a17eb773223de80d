"""Distributed ordered-scan primitives: global cumulative sums,
global ranks, and exact NTILE WITHOUT a single-partition window.

``Window.orderBy(...)`` with no ``partitionBy`` is the classic 100 TB
trap: Spark funnels every row through one task. The two-phase shape
here is the scale-correct equivalent:

1. ``repartitionByRange`` on the order keys — rows land in
   range-contiguous partitions (partition 0 holds the first range of
   the sort order, partition 1 the next, ...) — and the ranged frame
   is EAGERLY MATERIALIZED (``localCheckpoint``), freezing each
   row's partition assignment;
2. one tiny pass over the *per-partition totals* (one row per
   partition, bounded by the partition count, never by data size)
   builds exclusive prefix offsets;
3. a within-partition window (safe: each partition sorts locally)
   plus the broadcast offset yields the exact global running value.

The materialization in step 1 is CORRECTNESS-CRITICAL, not an
optimization. ``repartitionByRange`` samples its boundaries from its
input, and partition-local row order of an unmaterialized shuffled
input is not deterministic across evaluations (fetch-order races) —
so the totals job and the output job, each re-evaluating the range
exchange, can place the SAME row in DIFFERENT partitions; offsets
computed by one job then mis-label the other's partitions. Observed
at sf0.1 as corrupted NTILE buckets (ranks exceeding n; 61-75 rows
out of a 4×4×4 cube, varying per run). Checkpointing the ranged
frame executes the shuffle exactly once; every later job reads the
same frozen blocks, making the offsets exact for wherever the
boundaries actually fell — and the result is then independent of
boundary placement, since offset + local cumsum telescopes to the
same global value for any contiguous partitioning.

At 100 TB the checkpoint stores the shuffled projection once —
the same order of magnitude as the shuffle itself; project the
input to the needed columns before calling. Blocks are freed by the
context cleaner when the frame is garbage collected.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PART = "__range_pid"


def _ranged_frozen(
    df: DataFrame, order_by: List[Column], num_partitions: int
) -> DataFrame:
    """Range-partition on the order keys and freeze the assignment
    (see module docstring — the eager materialization is what makes
    the two-job offset scheme sound)."""
    n = max(2, num_partitions)
    ranged = df.repartitionByRange(n, *order_by).withColumn(
        _PART, F.spark_partition_id()
    )
    return ranged.localCheckpoint(eager=True)


def _prefix_offsets(
    by_pid: dict, want_sum: bool
) -> Tuple[list, int]:
    """Exclusive prefix (count, sum) offsets per pid + grand total."""
    rows = []
    acc_n = 0
    acc_s = 0
    for pid in sorted(by_pid):
        n, s = by_pid[pid]
        if want_sum:
            rows.append((pid, acc_n, acc_s))
        else:
            rows.append((pid, acc_n))
        acc_n += n
        acc_s += s if s is not None else 0
    return rows, acc_n


def global_cumsum(
    df: DataFrame,
    order_by: List[Column],
    value_col: str,
    out_col: str = "cum",
    rank_col: str | None = None,
    num_partitions: int = 32,
) -> DataFrame:
    """Exact global running sum of ``value_col`` (and optionally the
    global 1-based rank) in ``order_by`` order, two-phase over a
    frozen range partitioning. The only driver-side state is one row
    per range partition (a constant, never a function of data size).
    """
    ranged = _ranged_frozen(df, order_by, num_partitions)

    totals = (
        ranged.groupBy(_PART)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col(value_col)).alias("__t"),
        )
        .collect()
    )
    by_pid = {r[_PART]: (r["__n"], r["__t"]) for r in totals}
    rows, _total = _prefix_offsets(by_pid, want_sum=True)
    offsets = df.sparkSession.createDataFrame(
        rows, f"{_PART} int, __cnt_off long, __sum_off long"
    )

    w = (
        Window.partitionBy(_PART)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        ranged.join(F.broadcast(offsets), _PART)
        .withColumn(out_col, F.col("__sum_off") + F.sum(value_col).over(w))
    )
    if rank_col is not None:
        out = out.withColumn(
            rank_col, F.col("__cnt_off") + F.row_number().over(w)
        )
    return out.drop(_PART, "__sum_off", "__cnt_off")


def global_ntile(
    df: DataFrame,
    order_by: List[Column],
    k: int,
    out_col: str,
    num_partitions: int = 32,
) -> DataFrame:
    """Exact ``NTILE(k) OVER (ORDER BY ...)`` without the
    single-partition window: two-phase global rank over a frozen
    range partitioning, then the exact NTILE bucket formula.

    NTILE(k) over n rows puts ``q = n // k`` rows in each bucket and
    one extra row in each of the first ``n % k`` buckets — NOT the
    uniform ``1 + floor(k*(rank-1)/n)`` (which diverges whenever
    ``n % k != 0``; e.g. n=6, k=4: rank 4 is bucket 2 under NTILE but
    bucket 3 under the uniform formula). The remainder-aware form
    here is bit-identical to Spark's and DuckDB's NTILE for every n.
    """
    ranged = _ranged_frozen(df, order_by, num_partitions)

    totals = (
        ranged.groupBy(_PART).agg(F.count(F.lit(1)).alias("__n")).collect()
    )
    by_pid = {r[_PART]: (r["__n"], None) for r in totals}
    rows, n = _prefix_offsets(by_pid, want_sum=False)
    offsets = df.sparkSession.createDataFrame(
        rows, f"{_PART} int, __cnt_off long"
    )

    w = Window.partitionBy(_PART).orderBy(*order_by)
    rank = F.col("__cnt_off") + F.row_number().over(w)

    q, rem = divmod(max(n, 1), k)
    if q == 0:
        # fewer rows than buckets: bucket == rank
        bucket = rank
    else:
        big = rem * (q + 1)
        bucket = F.when(
            rank <= F.lit(big), 1 + F.floor((rank - 1) / F.lit(q + 1))
        ).otherwise(F.lit(1 + rem) + F.floor((rank - F.lit(big) - 1) / F.lit(q)))

    out = (
        ranged.join(F.broadcast(offsets), _PART)
        .withColumn(out_col, bucket.cast("int"))
    )
    return out.drop(_PART, "__cnt_off")
