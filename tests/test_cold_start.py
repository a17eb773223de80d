"""Cold-start durability: a FRESH Engine on a FRESH SparkSession
(warehouse intact — the driver-restart story a real cluster needs)
serves ALL THREE durable artifact kinds together without any rebuild:

* PREDICT USING MODEL — versioned model dirs (ml/models.py);
* SEARCH … USING INDEX — STORED AS bucketed tables + the
  ``declml_index_registry`` row the fresh engine adopts (probe-only
  plan asserted: the search scans the stored table, no Lloyd's / no
  bucket-key build);
* TOKENIZE … USING — STORED AS merge tables.

``spark.newSession()`` shares the external catalog (the warehouse)
but drops temp views, confs, and all engine state — the closest
single-JVM approximation of a driver restart.
"""

import pytest

from declarativeml_spark.engine import Engine
from declarativeml_spark.sources.catalog import register_views

_LABELED = """
    SELECT o_orderkey, o_totalprice,
           CAST(o_totalprice > 150000 AS INT) AS expensive
    FROM orders
"""


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def warm(spark, smoke_dir, tmp_path_factory):
    """Session 1: train a model, build stored lsh + ivf indexes, train
    a stored tokenizer."""
    register_views(spark, smoke_dir)
    spark.sql(_LABELED).createOrReplaceTempView("orders_cold_lab")
    eng = Engine(spark, model_dir=str(tmp_path_factory.mktemp("models")))
    for name in ("cold_idx", "cold_ivf"):
        try:
            eng.execute(f"DROP INDEX {name}")
        except ValueError:
            pass
    eng.execute(
        "TRAIN MODEL cold_clf USING logistic_regression(max_iter=5) "
        "FROM orders_cold_lab PREDICT expensive "
        "WITH FEATURES(o_totalprice) SPLIT DATA training=0.8, test=0.2"
    )
    eng.execute(
        "CREATE INDEX cold_idx ON embeddings USING lsh STORED AS cold_idx_tbl"
    )
    eng.execute(
        "CREATE INDEX cold_ivf ON embeddings USING ivf(n_cells=8)"
        " STORED AS cold_ivf_tbl"
    )
    eng.execute(
        "TRAIN TOKENIZER cold_tok FROM documents VOCAB 40"
        " STORED AS cold_tok_tbl"
    )
    yield eng
    for name in ("cold_idx", "cold_ivf"):
        try:
            eng.execute(f"DROP INDEX {name}")
        except ValueError:
            pass
    try:
        eng.execute("DROP TOKENIZER cold_tok")
    except ValueError:
        pass


@pytest.fixture(scope="module")
def cold(warm, spark, smoke_dir):
    """Session 2: fresh SparkSession + fresh Engine, warehouse intact."""
    spark2 = spark.newSession()
    register_views(spark2, smoke_dir)
    return Engine(spark2, model_dir=warm.model_dir)


def test_cold_predict_serves_without_rebuild(cold, warm):
    cold.spark.sql(_LABELED).createOrReplaceTempView("orders_cold_lab")
    scored = cold.execute("PREDICT USING MODEL cold_clf FROM orders_cold_lab")
    assert "prediction" in scored.columns
    got = {r.o_orderkey: r.prediction for r in scored.collect()}
    want = {
        r.o_orderkey: r.prediction
        for r in warm.execute(
            "PREDICT USING MODEL cold_clf FROM orders_cold_lab"
        ).collect()
    }
    assert got == want and len(got) > 0


def test_cold_search_lsh_adopts_probe_only(cold, warm):
    assert "cold_idx" not in cold.indexes  # nothing pre-loaded
    res = cold.execute("SEARCH SIMILAR USING INDEX cold_idx(threshold=1.15)")
    # adoption happened, serving frames are the stored tables
    assert cold.indexes["cold_idx"]["tables"] == ["cold_idx_tbl"]
    assert cold.indexes["cold_idx"]["owned"] == []
    # probe-only: the executed plan reads the bucketed table — no
    # bucket-key build stage re-keys the source
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "cold_idx_tbl" in plan
    assert _rows(res) == _rows(
        warm.execute("SEARCH SIMILAR USING INDEX cold_idx(threshold=1.15)")
    )


def test_cold_search_ivf_adopts_probe_only(cold, warm):
    res = cold.execute(
        "SEARCH SIMILAR USING INDEX cold_ivf(n_probe=8, query_mod=97) TOP 10"
    )
    assert cold.indexes["cold_ivf"]["tables"] == [
        "cold_ivf_tbl",
        "cold_ivf_tbl_centroids",
    ]
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "cold_ivf_tbl" in plan
    assert _rows(res) == _rows(
        warm.execute(
            "SEARCH SIMILAR USING INDEX cold_ivf(n_probe=8, query_mod=97)"
            " TOP 10"
        )
    )


def test_cold_refresh_adopted_index(cold):
    """REFRESH on an adopted index works (no new rows here — the
    source is unchanged — but the full anti-join path runs)."""
    out = cold.execute("REFRESH INDEX cold_idx").collect()[0]
    assert out.new_rows == 0


def test_cold_tokenize_serves_stored_merges(cold, warm):
    got = cold.execute("TOKENIZE documents USING cold_tok_tbl")
    want = warm.execute("TOKENIZE documents USING cold_tok_tbl")
    assert _rows(got.select("doc_id", "n_tokens")) == _rows(
        want.select("doc_id", "n_tokens")
    )


def test_cold_drop_adopted_index_clears_registry(warm, spark, smoke_dir):
    """A third fresh session can DROP a stored index it never built:
    tables and the registry row go away; a fourth session sees it as
    unknown."""
    warm.execute(
        "CREATE INDEX cold_tmp ON embeddings USING lsh STORED AS cold_tmp_tbl"
    )
    s3 = spark.newSession()
    register_views(s3, smoke_dir)
    e3 = Engine(s3)
    assert e3.execute("DROP INDEX cold_tmp") == {"dropped": "cold_tmp"}
    assert not s3.catalog.tableExists("cold_tmp_tbl")
    e4 = Engine(spark.newSession())
    with pytest.raises(ValueError, match="Unknown index"):
        e4.execute("SEARCH SIMILAR USING INDEX cold_tmp")
    # the warm engine's in-memory record is now stale by design (the
    # storage was dropped by another session) — clean it up
    warm.indexes.pop("cold_tmp", None)
