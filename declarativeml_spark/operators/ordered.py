"""Distributed ordered-scan primitives: global cumulative sums and
global ranks WITHOUT a single-partition window.

``Window.orderBy(...)`` with no ``partitionBy`` is the classic 100 TB
trap: Spark funnels every row through one task. The two-phase shape
here is the scale-correct equivalent:

1. ``repartitionByRange`` on the order keys — rows land in
   range-contiguous partitions (partition 0 holds the first range of
   the sort order, partition 1 the next, ...);
2. one tiny driver-side pass over the *per-partition totals* (one row
   per partition, bounded by the partition count, never by data size)
   builds exclusive prefix offsets;
3. a within-partition window (safe: each partition sorts locally)
   plus the broadcast offset yields the exact global running value.

The result is independent of where the range boundaries fall, so the
sampling inside ``repartitionByRange`` cannot affect correctness —
offset + local cumsum telescopes to the same global cumsum for any
contiguous partitioning.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PART = "__range_pid"


def _with_range_pid(df: DataFrame, order_by: List[Column], num_partitions: int) -> DataFrame:
    n = max(2, num_partitions)
    return df.repartitionByRange(n, *order_by).withColumn(
        _PART, F.spark_partition_id()
    )


def global_cumsum(
    df: DataFrame,
    order_by: List[Column],
    value_col: str,
    out_col: str = "cum",
    rank_col: str | None = None,
    num_partitions: int = 32,
) -> DataFrame:
    """Exact global running sum of ``value_col`` (and optionally the
    global 1-based rank) in ``order_by`` order, two-phase.

    The only driver-side collect is one row per range partition
    (``num_partitions`` rows — a constant, not a function of data
    size), mirroring how `collect`-bounded reads are used elsewhere
    in this engine (class counts, forecast tails).
    """
    ranged = _with_range_pid(df, order_by, num_partitions)

    totals = (
        ranged.groupBy(_PART)
        .agg(
            F.sum(F.col(value_col)).alias("__t"),
            F.count(F.lit(1)).alias("__n"),
        )
        .collect()
    )
    by_pid = {r[_PART]: (r["__t"], r["__n"]) for r in totals}
    sum_off: dict[int, int] = {}
    cnt_off: dict[int, int] = {}
    acc_s, acc_n = 0, 0
    for pid in sorted(by_pid):
        sum_off[pid] = acc_s
        cnt_off[pid] = acc_n
        s, n = by_pid[pid]
        acc_s += s or 0
        acc_n += n

    off_rows = [(pid, sum_off[pid], cnt_off[pid]) for pid in sorted(by_pid)]
    offsets = df.sparkSession.createDataFrame(
        off_rows, f"{_PART} int, __sum_off long, __cnt_off long"
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
    single-partition window: two-phase global rank, then the exact
    NTILE bucket formula.

    NTILE(k) over n rows puts ``q = n // k`` rows in each bucket and
    one extra row in each of the first ``n % k`` buckets — NOT the
    uniform ``1 + floor(k*(rank-1)/n)`` (which diverges whenever
    ``n % k != 0``; e.g. n=6, k=4: rank 4 is bucket 2 under NTILE but
    bucket 3 under the uniform formula). The remainder-aware form here
    is bit-identical to Spark's and DuckDB's NTILE for every n.

    Driver-side state: one row per range partition (bounded by the
    partition count), same contract as :func:`global_cumsum`.
    """
    ranged = _with_range_pid(df, order_by, num_partitions)

    totals = (
        ranged.groupBy(_PART).agg(F.count(F.lit(1)).alias("__n")).collect()
    )
    by_pid = {r[_PART]: r["__n"] for r in totals}
    n = sum(by_pid.values())
    cnt_off: dict[int, int] = {}
    acc = 0
    for pid in sorted(by_pid):
        cnt_off[pid] = acc
        acc += by_pid[pid]

    offsets = df.sparkSession.createDataFrame(
        [(pid, cnt_off[pid]) for pid in sorted(by_pid)],
        f"{_PART} int, __cnt_off long",
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
