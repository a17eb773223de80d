"""COMPUTE statement execution: kernel registry + application."""

import pytest

from declarativeml_spark.engine import Engine
from declarativeml_spark.functions.kernels import (
    COMPUTATIONS,
    apply_compute,
    get_kernel,
    register_kernel,
)
from declarativeml_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def engine(spark, smoke_dir):
    return Engine(spark)


def test_register_and_apply_scalar_kernel(engine, spark, smoke_dir):
    engine.execute(
        "COMPUTE total FROM table(l_extendedprice, l_tax) INTO column(with_tax) "
        "USING scalar_add"
    )
    assert "total" in COMPUTATIONS
    li = load_table(spark, smoke_dir, "lineitem").limit(100)
    out = apply_compute(li, "total")
    row = out.select("l_extendedprice", "l_tax", "with_tax").first()
    assert abs(row.with_tax - (row.l_extendedprice + row.l_tax)) < 1e-9


def test_vector_kernels(engine, spark, smoke_dir):
    engine.execute(
        "COMPUTE sim FROM table(embedding, embedding) INTO column(cos) "
        "USING cosine_similarity BLOCK 128"
    )
    emb = load_table(spark, smoke_dir, "embeddings").limit(10)
    out = apply_compute(emb, "sim")
    for r in out.select("cos").collect():
        assert abs(r.cos - 1.0) < 1e-6  # self-similarity


def test_unknown_kernel_rejected(engine):
    with pytest.raises(ValueError, match="Unknown kernel"):
        engine.execute("COMPUTE bad USING not_a_kernel")


def test_arity_check(engine, spark, smoke_dir):
    # arity mismatches fail at REGISTRATION, not at tick/apply time —
    # a deferred check surfaced as a bare IndexError in the tick loop
    with pytest.raises(ValueError, match="expects 2 inputs"):
        engine.execute(
            "COMPUTE dotp FROM table(embedding) INTO column(d) USING vector_dot"
        )
    # a variadic kernel with no FROM clause is rejected the same way
    with pytest.raises(ValueError, match="at least one"):
        engine.execute("COMPUTE va EVERY 5 TICKS USING vector_add")


def test_custom_kernel_registration(engine, spark, smoke_dir):
    from pyspark.sql import functions as F

    register_kernel("double_it", lambda c: c * 2, arity=1)
    assert get_kernel("double_it").arity == 1
    engine.execute("COMPUTE d2 FROM table(l_quantity) INTO column(q2) USING double_it")
    li = load_table(spark, smoke_dir, "lineitem").limit(10)
    row = apply_compute(li, "d2").select("l_quantity", "q2").first()
    assert row.q2 == row.l_quantity * 2


def test_schedule_ticks_recorded(engine):
    reg = engine.execute(
        "COMPUTE periodic FROM table(value) INTO column(v2) EVERY 5 TICKS USING relu"
    )
    assert reg.schedule_ticks == 5
