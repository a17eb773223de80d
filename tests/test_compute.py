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


# --- round-10 kernels.py review-sweep regressions ---------------------------


def test_relu_preserves_null(engine, spark):
    from pyspark.sql import functions as F
    from declarativeml_spark.functions.kernels import get_kernel

    df = spark.createDataFrame([(1.5,), (-2.0,), (None,)], "x double")
    out = df.select(get_kernel("relu").fn(F.col("x")).alias("r")).collect()
    assert [r.r for r in out] == [1.5, 0.0, None]


def test_vector_dot_int_arrays_no_overflow(engine, spark):
    from pyspark.sql import functions as F
    from declarativeml_spark.functions.kernels import get_kernel

    # 50000*50000 = 2.5e9 > INT_MAX: an un-cast int product wraps
    df = spark.createDataFrame(
        [([50000, 50000], [50000, 50000])], "a array<int>, b array<int>"
    )
    row = df.select(
        get_kernel("vector_dot").fn(F.col("a"), F.col("b")).alias("d")
    ).first()
    assert row.d == 5.0e9


def test_vector_kernels_length_mismatch_raises(engine, spark):
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException
    from declarativeml_spark.functions.kernels import get_kernel

    df = spark.createDataFrame(
        [([1.0, 2.0], [1.0, 2.0, 3.0])],
        "a array<double>, b array<double>",
    )
    for k in ("vector_dot", "vector_add"):
        with pytest.raises(Exception, match="length mismatch"):
            df.select(
                get_kernel(k).fn(F.col("a"), F.col("b")).alias("o")
            ).collect()


def test_vectorized_kernel_block_chunks_not_session_conf(
    engine, spark, smoke_dir
):
    """BLOCK bounds the vectorized kernel's per-call chunk inside the
    Arrow batch; the session-wide Arrow conf must be untouched (it
    previously leaked one computation's batch size into every later
    Arrow exchange)."""
    from declarativeml_spark.functions.kernels import (
        apply_compute,
        register_kernel,
    )

    def cube(s):
        # raw pandas contract: pd.Series -> pd.Series
        return s.astype("float64") ** 3

    register_kernel("cube_vec", cube, arity=1, vectorized=True)
    conf_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    before = spark.conf.get(conf_key, None)
    engine.execute(
        "COMPUTE cubes FROM table(l_quantity) INTO column(q3) "
        "USING cube_vec BLOCK 16"
    )
    li = load_table(spark, smoke_dir, "lineitem").limit(100).coalesce(1)
    rows = apply_compute(li, "cubes").select("l_quantity", "q3").collect()
    assert all(abs(r.q3 - r.l_quantity**3) < 1e-6 for r in rows)
    assert spark.conf.get(conf_key, None) == before
    from declarativeml_spark.functions.kernels import COMPUTATIONS

    assert COMPUTATIONS["cubes"].options.get("BLOCK") == 16


def test_vector_kernels_null_array_propagates_null(engine, spark):
    """A NULL array on either side must propagate NULL (the kernel
    NULL contract) — legacy size(NULL) = -1 previously routed NULL
    rows into the length-mismatch raise_error branch and crashed the
    whole job with a misleading "(-1 vs N)" message."""
    from pyspark.sql import functions as F
    from declarativeml_spark.functions.kernels import get_kernel

    df = spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0]), (None, [3.0, 4.0]), ([1.0, 2.0], None)],
        "a array<double>, b array<double>",
    )
    dots = df.select(
        get_kernel("vector_dot").fn(F.col("a"), F.col("b")).alias("d")
    ).collect()
    assert [r.d for r in dots] == [11.0, None, None]
    adds = df.select(
        get_kernel("vector_add").fn(F.col("a"), F.col("b")).alias("s")
    ).collect()
    assert adds[0].s == [4.0, 6.0]
    assert adds[1].s is None and adds[2].s is None
