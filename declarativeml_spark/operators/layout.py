"""Physical-layout operators: balanced output sharding and small-file
compaction planning.

Both are metadata/assignment-plane ops — they decide *where rows or
files go*, they don't move the bytes themselves — so their cost is a
function of row/file counts, never of the 100 TB payload. Each has an
oracle-checked query twin in ``queries/pipeline6.py`` and a DSL
statement form (``SHARD``, ``COMPACT``) in the engine.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Deterministic Lehmer-style hash of an integer id: restart-safe
# (pure function of the id — rand() would reshuffle on re-run) and
# engine-reproducible, so oracle twins can hash-check assignments.
# The id is widened to BIGINT *inside* the expression: without it, an
# INT id column makes `(id % 2147483647) + 2147483647` 32-bit
# arithmetic, which overflows for every positive remainder (errors
# under ANSI mode, silently wraps otherwise). The shared text keeps
# Spark and DuckDB in lock-step either way.
LEHMER_ID = (
    "((((CAST({id} AS BIGINT) % 2147483647) + 2147483647) % 2147483647)"
    " * 48271 % 2147483647) * 48271 % 2147483647"
)


def shard_round_robin(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    num_partitions: int = 32,
) -> DataFrame:
    """Assign every row a ``shard`` in ``[0, n_shards)`` by exact
    round-robin over the deterministic Lehmer-hash order of
    ``id_col`` — the balanced-writer plan for emitting a corpus as
    evenly-sized output files.

    Exactly balanced in row count (±1 by construction); hash order
    makes per-shard payload mass (tokens/bytes) statistically
    independent of any data ordering, so it balances too — audit it
    with ``queries/pipeline6.py::corpus_shard_assignment``.

    Scale: the global rank is the two-phase distributed cumsum of
    ``operators/ordered.py`` (range-repartition + per-partition
    offsets), never a single-partition global window.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from declarativeml_spark.operators.ordered import global_cumsum

    hashed = df.withColumn("__h", F.expr(LEHMER_ID.format(id=id_col)))
    ranked = global_cumsum(
        hashed.withColumn("__one", F.lit(1)),
        [F.col("__h"), F.col(id_col)],
        "__one",
        out_col="__cum",
        rank_col="__rnk",
        num_partitions=num_partitions,
    )
    return ranked.withColumn(
        "shard", ((F.col("__rnk") - 1) % n_shards).cast("long")
    ).drop("__h", "__one", "__cum", "__rnk")


def compaction_groups(
    files: DataFrame,
    target_bytes: int,
    part_col: str = "part",
    file_col: str = "file_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Assign each file a merge group (``grp_id``) within its table
    partition by next-fit over the running byte sum: files are taken
    in deterministic ``file_col`` order and a new group starts each
    time the running total crosses a ``target_bytes`` boundary.

    Files are never split, so each group's total lands within one
    file size of the target on both sides: target − prev_file <
    group_bytes < target + last_file (the last group of a partition
    may simply hold the remainder). The same bound Delta/Iceberg
    OPTIMIZE bin-packing gives when file sizes are below the target.

    Scale: input is the file manifest (one row per file — millions of
    rows for a 100 TB table, not the table itself); the window
    partitions by table partition, so no global ordering exists.
    """
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
    # bytes_col joins the ordering as a tiebreaker: a generic manifest
    # may repeat file_col within a partition, and with ties the
    # running byte sum — hence grp_id — would depend on shuffle order.
    w = (
        Window.partitionBy(part_col)
        .orderBy(file_col, bytes_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return files.withColumn(
        "__excl_cum",
        (F.sum(bytes_col).over(w) - F.col(bytes_col)).cast("long"),
    ).withColumn(
        "grp_id",
        F.floor(F.col("__excl_cum").cast("double") / target_bytes).cast(
            "long"
        ),
    ).drop("__excl_cum")


def simulated_file_manifest(
    orders: DataFrame,
    n_buckets: int = 97,
    bytes_per_row: int = 4096,
) -> DataFrame:
    """A synthetic (part, file_id, bytes) manifest derived from
    ``orders`` — stands in for a real table manifest (Delta/Iceberg
    metadata) in tests and oracle-checked queries."""
    return orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("part"),
        (F.col("o_orderkey") % n_buckets).cast("long").alias("file_id"),
    ).agg((F.count(F.lit(1)) * bytes_per_row).cast("long").alias("bytes"))


def epoch_shuffle(
    df: DataFrame,
    epochs: int = 3,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch global shuffle: every (epoch, row)
    pair gets a pseudorandom 16-bit sort key (md5 of
    ``'ep<epoch>:<id>'``) and a shard — writing each epoch's shards
    ordered by ``(skey, id)`` IS the shuffled data-loader order. Pure
    function of the id: a restarted job reproduces the permutation
    bit-for-bit, which rand()-seeded shuffles lose the moment
    partitioning changes. Backs the ``SHUFFLE`` DSL statement; the
    oracle-checked audit twin is
    queries/pipeline8.py::corpus_epoch_shuffle.

    The 16-bit skey is NOT unique once a shard exceeds ~65k rows —
    the id must stay in the composite everywhere order matters:
    materialize with ``repartitionByRange(epoch, shard, skey,
    id)`` + ``sortWithinPartitions(same)``. Ordering (or range-
    splitting) by skey alone leaves within-tie order to shuffle
    nondeterminism, silently breaking the restart-safety contract.

    Scale: a constant ×epochs fan-out of per-row map expressions —
    no joins, no windows; the materialization above is never a
    single-task sort.
    """
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from declarativeml_spark.operators.textops import _hex4_int

    key_s = _hex4_int(f"concat('ep', epoch, ':', CAST({id_col} AS STRING))")
    e = df.withColumn(
        "epoch", F.explode(F.expr(f"sequence(0, {epochs - 1})"))
    )
    return e.withColumn("skey", F.expr(f"({key_s})").cast("long")).withColumn(
        "shard", (F.col("skey") % n_shards).cast("long")
    )
