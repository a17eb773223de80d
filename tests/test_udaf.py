"""UDF/UDAF surface (SURVEY §2.10): grouped-agg pandas UDF and
applyInPandas, cross-checked against the pure-aggregate forms."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from declarativeml_spark.queries import QUERIES
from declarativeml_spark.sources.catalog import load_table


def test_apply_in_pandas_matches_agg_slope(spark, smoke_dir):
    """Per-group OLS via applyInPandas == closed-form decimal-agg slope."""
    agg_result = {
        r.n_name: r.slope_per_day
        for r in QUERIES["nation_price_trend"](spark, smoke_dir).collect()
    }

    orders = load_table(spark, smoke_dir, "orders")
    cust = load_table(spark, smoke_dir, "customer")
    nation = load_table(spark, smoke_dir, "nation")
    df = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            (F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long").alias("x"),
            F.col("o_totalprice").alias("y"),
        )
    )

    def ols(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        x, y = pdf["x"].to_numpy(float), pdf["y"].to_numpy(float)
        n = len(x)
        slope = (n * (x * y).sum() - x.sum() * y.sum()) / (
            n * (x * x).sum() - x.sum() ** 2
        )
        return pd.DataFrame({"n_name": [pdf["n_name"].iloc[0]], "slope": [slope]})

    pandas_result = {
        r.n_name: r.slope
        for r in df.groupBy("n_name")
        .applyInPandas(ols, schema="n_name string, slope double")
        .collect()
    }
    assert set(agg_result) == set(pandas_result)
    for nation_name, slope in agg_result.items():
        # agg output is rounded to 6 decimals; compare at that precision
        assert slope == pytest.approx(pandas_result[nation_name], abs=1e-6)


def test_grouped_agg_pandas_udf(spark, smoke_dir):
    """GROUPED_AGG pandas UDF (Arrow-batched custom aggregate)."""

    @F.pandas_udf("double")
    def weighted_avg(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    li = load_table(spark, smoke_dir, "lineitem")
    out = li.groupBy("l_returnflag").agg(
        weighted_avg("l_extendedprice", "l_quantity").alias("wavg_price")
    )
    rows = {r.l_returnflag: r.wavg_price for r in out.collect()}
    # cross-check one group with plain aggregates
    check = li.filter(F.col("l_returnflag") == "R").agg(
        (F.sum(F.col("l_extendedprice") * F.col("l_quantity")) / F.sum("l_quantity"))
    ).first()[0]
    assert rows["R"] == pytest.approx(check, rel=1e-9)


def test_io_roundtrips(spark, smoke_dir, tmp_path):
    from declarativeml_spark.sources.io import (
        read_csv,
        read_json,
        read_orc,
        write_orc,
        write_partitioned_parquet,
    )

    src = load_table(spark, smoke_dir, "nation")
    csv_path = str(tmp_path / "nation_csv")
    json_path = str(tmp_path / "nation_json")
    pq_path = str(tmp_path / "nation_pq")

    src.write.option("header", "true").csv(csv_path)
    src.write.json(json_path)
    write_partitioned_parquet(src, pq_path, ["n_regionkey"])

    assert read_csv(spark, csv_path, src.schema).count() == 25
    assert read_json(spark, json_path, src.schema).count() == 25
    orc_path = str(tmp_path / "nation_orc")
    write_orc(src, orc_path)
    assert read_orc(spark, orc_path).count() == 25
    back = spark.read.parquet(pq_path)
    assert back.count() == 25
    # partition pruning: filter on the partition column reads 1 dir —
    # the scan must carry the predicate as a PartitionFilter (pruned
    # at planning), not a post-scan Filter
    pruned = back.filter(F.col("n_regionkey") == 2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "n_regionkey" in pf.group(1), plan
    assert pruned.count() == 5
