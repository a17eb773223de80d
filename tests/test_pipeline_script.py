"""End-to-end pretraining-data pipeline THROUGH THE DSL SURFACE: the
statement family composes — quality gate → benchmark decontamination
→ exact dedup → packing → sharding — with intermediate results
flowing between statements as views (the way a 100-TB driver script
would chain them). The operator-level twin is the oracle-checked
``pipeline_pretraining_corpus`` query; this test proves the
STATEMENTS compose with coherent invariants at every stage.
"""

import pytest

from declarativeml_spark.engine import Engine
from declarativeml_spark.sources.catalog import register_views


@pytest.fixture(scope="module")
def engine(spark, smoke_dir):
    register_views(spark, smoke_dir)
    return Engine(spark)


def test_pretraining_pipeline_chains_through_views(engine, spark):
    docs = spark.table("documents")
    n0 = docs.count()

    # 1. quality gate: drop the bottom ~20% by linear margin (the
    # margin's absolute sign is calibration-dependent; a rank gate is
    # the realistic budget-selection form)
    scored = engine.execute("SCORE QUALITY documents")
    cut = scored.approxQuantile("margin", [0.2], 0.0)[0]
    keep_q = scored.filter(scored.margin >= cut).select("doc_id")
    docs.join(keep_q, "doc_id").createOrReplaceTempView("p1_docs")
    n1 = spark.table("p1_docs").count()
    assert 0 < n1 <= n0

    # 2. decontamination against a benchmark slice
    docs.filter("doc_id % 23 = 5").createOrReplaceTempView("p_bench")
    decon = engine.execute("DECONTAMINATE p1_docs AGAINST p_bench THRESHOLD 3")
    flagged = decon.filter("contaminated").select("doc_id")
    n_flagged = flagged.count()
    spark.table("p1_docs").join(
        flagged, "doc_id", "left_anti"
    ).createOrReplaceTempView("p2_docs")
    n2 = spark.table("p2_docs").count()
    assert n2 == n1 - n_flagged and n2 > 0

    # 3. exact dedup: one canonical doc per fingerprint group
    groups = engine.execute("DEDUPLICATE p2_docs USING exact")
    keep_d = groups.select(groups.canonical_id.alias("doc_id"))
    spark.table("p2_docs").join(keep_d, "doc_id").createOrReplaceTempView(
        "p3_docs"
    )
    n3 = spark.table("p3_docs").count()
    assert n3 == groups.count()  # one survivor per group
    assert 0 < n3 <= n2

    # 4. packing: every surviving doc lands in exactly one chunk plan row
    packed = engine.execute("PACK p3_docs INTO 128 TOKEN CHUNKS BUCKETS 4")
    assert packed.select("doc_id").distinct().count() == n3
    assert packed.count() == n3
    assert packed.filter(
        "chunk_offset < 0 OR chunk_offset >= 128"
    ).count() == 0

    # 5. sharding: all survivors assigned, every shard populated
    sharded = engine.execute("SHARD p3_docs INTO 8 SHARDS")
    assert sharded.count() == n3
    per_shard = {r[0]: r[1] for r in sharded.groupBy("shard").count().collect()}
    assert set(per_shard) == set(range(8))
    # round-robin rank sharding: balanced within one row
    assert max(per_shard.values()) - min(per_shard.values()) <= 1

    # the pipeline actually filtered something end to end (the corpus
    # has dup/contaminated/low-quality rows by construction)
    assert n3 < n0
