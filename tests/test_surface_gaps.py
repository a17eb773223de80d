"""REGISTER AGENT, quoted-identifier translation, function aliases,
WAIT FOR EVENT."""

import threading

import pytest

from declarativeml_spark.dsl import parse
from declarativeml_spark.dsl.features import feature_to_spark_sql
from declarativeml_spark.dsl.ir import RegisterAgent
from declarativeml_spark.engine import Engine
from declarativeml_spark.plans.builder import _to_spark_quoting, resolve_source
from declarativeml_spark.streaming.events import EventBus


def test_parse_register_agent():
    a = parse(
        "REGISTER AGENT tuner WITH CAPABILITIES (hyperparameter_tuning, early_stopping) "
        "SUBSCRIBE TO 'training.%' PRIORITY 5 RESOURCE_LIMITS {max_memory: \"2G\"}"
    )
    assert isinstance(a, RegisterAgent)
    assert a.capabilities == ["hyperparameter_tuning", "early_stopping"]
    assert a.subscribe_to == "training.%"
    assert a.priority == 5
    assert a.resource_limits == {"max_memory": "2G"}


def test_register_agent_execution(spark, tmp_path):
    eng = Engine(spark, model_dir=str(tmp_path))
    rec = eng.execute("REGISTER AGENT mon WITH CAPABILITIES (alerts) SUBSCRIBE TO 'model.%'")
    assert rec["status"] == "registered"
    assert any(s.name.startswith("agent:mon") for s in eng.bus.subscriptions)


def test_quoted_identifier_translation():
    assert _to_spark_quoting('"Transactions"') == "`Transactions`"
    assert (
        _to_spark_quoting('"My Table" t WHERE t.note = \'keep "this"\'')
        == "`My Table` t WHERE t.note = 'keep \"this\"'"
    )
    assert _to_spark_quoting('"a""b"') == "`a\"b`"


def test_quoted_source_resolves(spark, smoke_dir):
    from declarativeml_spark.sources.catalog import load_table

    load_table(spark, smoke_dir, "orders").createOrReplaceTempView("Orders_Mixed")
    m = parse(
        'TRAIN MODEL m USING a FROM "Orders_Mixed" PREDICT y WITH FEATURES(x)'
    )
    assert not m.source_is_identifier
    df = resolve_source(spark, m.source, m.source_is_identifier)
    assert df.count() > 0


def test_function_aliases():
    assert (
        feature_to_spark_sql("DAYS_BETWEEN(o_orderdate, CURRENT_DATE())")
        == "datediff(current_date(), `o_orderdate`)"
    )
    assert feature_to_spark_sql("days_between(a, b)") == "datediff(`b`, `a`)"


def test_wait_for_event(spark):
    bus = EventBus(spark)
    bus.publish("training.done", {"model": "m1"})
    df = bus.wait_for("training.%", timeout_s=5)
    assert df is not None and df.count() == 1

    assert bus.wait_for("never.%", timeout_s=1, poll_s=0.2) is None

    # event published from another thread while waiting
    def later():
        import time

        time.sleep(1)
        bus.publish("async.event", {})

    t = threading.Thread(target=later)
    t.start()
    got = bus.wait_for("async.%", timeout_s=10, poll_s=0.2)
    t.join()
    assert got is not None
