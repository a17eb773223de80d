"""sources/catalog.py contracts: nanos normalization, tz
independence, view registration (round-10 review sweep)."""

import warnings

import pytest
from pyspark.sql import functions as F

from declarativeml_spark.sources.catalog import (
    epoch_us,
    load_table,
    register_views,
)


def test_events_ts_is_ntz_and_epoch_us_matches_duckdb(spark, smoke_dir):
    import duckdb

    df = load_table(spark, smoke_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    got = sorted(
        r.e for r in df.select(epoch_us("ts").alias("e")).limit(50).collect()
    )
    con = duckdb.connect()
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT epoch_us(ts) FROM read_parquet('{smoke_dir}/events.parquet')"
            " LIMIT 50"
        ).fetchall()
    )
    # same file, same normalization — driver-oracle equality in微
    assert got[:10] == want[:10]


def test_ltz_reinterpretation_is_session_tz_independent(spark):
    """The legacy LTZ->NTZ branch must pin wall-clock to UTC in ANY
    session timezone (a bare cast rendered in the session tz and
    silently shifted ts by the UTC offset)."""
    tz_key = "spark.sql.session.timeZone"
    prev = spark.conf.get(tz_key)
    try:
        spark.conf.set(tz_key, "America/New_York")
        out = spark.sql(
            "SELECT convert_timezone(current_timezone(), 'UTC',"
            " cast(timestamp'2025-07-31 22:13:20.123456 UTC'"
            " as timestamp_ntz)) AS w"
        ).first().w
        assert str(out) == "2025-07-31 22:13:20.123456"
    finally:
        spark.conf.set(tz_key, prev)


def test_epoch_us_tolerates_ltz_input(spark):
    """epoch_us must not silently session-tz-coerce an LTZ column
    (the inner NTZ cast is a no-op for NTZ input)."""
    df = spark.sql(
        "SELECT timestamp'2020-01-01 00:00:00 UTC' AS t_ltz,"
        " timestamp_ntz'2020-01-01 00:00:00' AS t_ntz"
    )
    row = df.select(
        epoch_us("t_ltz").alias("a"), epoch_us("t_ntz").alias("b")
    ).first()
    assert row.a == row.b == 1577836800000000


def test_register_views_warns_on_missing_tables(spark, tmp_path, smoke_dir):
    """A directory missing tables must WARN naming them, not silently
    succeed having registered nothing (the os.path.exists gate was
    also local-filesystem-only)."""
    d = str(tmp_path / "partial_sf")
    load_table(spark, smoke_dir, "region").write.parquet(
        f"{d}/region.parquet"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        register_views(spark, d, tables=("region", "nation"))
    msgs = [str(x.message) for x in w if "register_views" in str(x.message)]
    assert msgs and "nation" in msgs[0]
    assert spark.table("region").count() > 0
    # restore the real views for other modules sharing the session
    register_views(spark, smoke_dir)
