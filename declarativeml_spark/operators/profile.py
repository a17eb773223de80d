"""Numeric column profiling: per-column stats + equi-width
histograms, the data-quality card published before a table feeds
training.

Shared by the ``PROFILE`` DSL statement (engine.py) and the
oracle-checked ``lineitem_numeric_profile`` query
(queries/pipeline5.py) so both paths execute the identical plan.

Scale: two inherent passes — bucket edges need global min/max first
(cf. the two-pass percentile in queries/pipeline.py
``quality_budget_selection``). Pass 1 computes every column's stats
in ONE scan (a single agg row, stack()ed into per-column rows). Pass
2 re-scans with the tiny stats frame broadcast, explodes each row
into (column, bucket) pairs and counts — map-side combine collapses
the shuffle to at most n_columns x 10 rows per upstream partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def numeric_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(col_name, n, mn, mx, avg_val, hist) for each of ``cols``,
    with a 10-bucket equi-width histogram rendered as a comma-joined
    string (empty buckets as zeros, via a bucket->count map — no
    spine join)."""
    from declarativeml_spark.queries.registry import sround

    aggs = []
    for c in cols:
        aggs += [
            F.count(c).cast("bigint").alias(f"{c}__n"),
            F.min(F.col(c).cast("double")).alias(f"{c}__mn"),
            F.max(F.col(c).cast("double")).alias(f"{c}__mx"),
            # nullif: an all-NULL column has count 0 — its mean is
            # NULL, not an ANSI DIVIDE_BY_ZERO abort
            sround(
                F.sum(F.col(c).cast("decimal(38,6)")).cast("double")
                / F.nullif(F.count(c), F.lit(0)),
                6,
            ).alias(f"{c}__avg"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__mn, {c}__mx, {c}__avg" for c in cols
    )
    stats = one.selectExpr(
        f"stack({len(cols)}, {stack_args})"
        " as (col_name, n, mn, mx, avg_val)"
    )

    # NULL cells are excluded from the histogram to match n (F.count
    # skips nulls); without the filter greatest(0, NULL) would shunt
    # every NULL row into bucket 0 and the histogram would sum past n.
    pairs = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("col_name"),
                            F.col(c).cast("double").alias("v"),
                        )
                        for c in cols
                    ]
                )
            ).alias("cv")
        )
        .select("cv.col_name", "cv.v")
        .filter(F.col("v").isNotNull())
    )
    # constant column (mx == mn): every value is the single bucket 0,
    # not a DIVIDE_BY_ZERO abort (ANSI default)
    bucketed = pairs.join(F.broadcast(stats), "col_name").select(
        "col_name",
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.lit(9),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("v") - F.col("mn"))
                        / (F.col("mx") - F.col("mn"))
                        * 10.0
                    ).cast("bigint"),
                ),
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("b"),
    )
    counts = bucketed.groupBy("col_name", "b").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    hist = counts.groupBy("col_name").agg(
        F.expr(
            "concat_ws(',', transform(sequence(0, 9),"
            " i -> CAST(coalesce("
            "element_at(map_from_entries(collect_list(struct(b, cnt))), i),"
            " 0) AS STRING)))"
        ).alias("hist")
    )
    # left join: an all-NULL column has no histogram rows, but its
    # stats row (n=0) must still be reported — an inner join would
    # make 'no data' indistinguishable from 'not requested'
    return stats.join(hist, "col_name", "left").withColumn(
        "hist", F.coalesce("hist", F.lit(",".join(["0"] * 10)))
    )
