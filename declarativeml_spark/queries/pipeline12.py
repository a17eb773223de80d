"""Training-data pipeline operators, part 12 (round 11).

**Portable HyperLogLog distinct-count audit** — the cardinality
sketch a 100 TB pipeline runs instead of ``COUNT(DISTINCT …)``
(vocabulary growth tracking, per-source key audits, join-key
cardinality estimation before plan selection). Unlike the builtin
HLL++ surface (``approx_distinct_parts``, tolerance-boolean-gated
because its registers are engine-private), this sketch is built from
md5 with shared-dialect SQL (operators/sketch.py), so the DuckDB
oracle replays the register plane and the estimate bit-for-bit and
the driver's value hash covers the sketch itself.

Scale design: the sketch path shuffles at most ``m=256`` register
rows per group (``GROUP BY (source, idx) MAX(rho)`` partial-
aggregates map-side), never the keys; registers merge by MAX so
per-partition planes union freely. The exact-distinct comparator
exists only as the audit column at test scale — at 100 TB you ship
the registers alone.

Reference parity: the reference has no sketch operators (spec-only,
reference README.md:87-89); beyond-parity extension per SURVEY.md
§2.11, next to the count-min-sketch row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from declarativeml_spark.operators import sketch as SK
from declarativeml_spark.operators.textops import stable_round
from declarativeml_spark.queries.registry import query
from declarativeml_spark.sources.catalog import load_table

# Audited keys: word bigrams per source (~700 distinct per source at
# sf0.01 against m=256 registers, so the bias-corrected raw branch
# does real work at sf0.01/0.1 while sf0.001's sparser plane exercises
# the linear-counting branch).
_BIGRAMS_SPARK = (
    "CASE WHEN size(ts) >= 2 THEN transform(sequence(1, size(ts) - 1),"
    " i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"
    " ELSE slice(ts, 1, 0) END"
)
_BIGRAMS_DUCK = (
    "list_transform(range(1, len(ts)), i -> concat(ts[i], ' ', ts[i + 1]))"
)


def _hll_est() -> str:
    return SK.hll_estimate_expr("s_int", "registers_nonzero")


def _hll_oracle() -> str:
    est = _hll_est()
    rel = (
        f"abs({est} - CAST(exact_distinct AS DOUBLE))"
        f" / CAST(exact_distinct AS DOUBLE)"
    )
    return f"""
    WITH raw AS (
      SELECT source, bg
      FROM (SELECT source, string_split(text, ' ') AS ts FROM documents),
           UNNEST({_BIGRAMS_DUCK}) AS u(bg)
    ),
    hashed AS (SELECT source, bg, md5(bg) AS h FROM raw),
    regs AS (
      SELECT source, {SK.hll_idx_expr('h')} AS idx,
             MAX({SK.hll_rho_expr('h')}) AS reg
      FROM hashed GROUP BY source, {SK.hll_idx_expr('h')}
    ),
    sk AS (
      SELECT source, COUNT(*) AS registers_nonzero,
             {SK.hll_sint_agg_expr()} AS s_int
      FROM regs GROUP BY source
    ),
    exact AS (
      SELECT source, COUNT(DISTINCT bg) AS exact_distinct
      FROM raw GROUP BY source
    )
    SELECT s.source AS source, exact_distinct, registers_nonzero,
           {stable_round(est, 4)} AS hll_estimate,
           {stable_round(rel, 6)} AS rel_error
    FROM sk s JOIN exact x ON s.source = x.source
    ORDER BY source
    """


@query("hll_distinct_audit", oracle=_hll_oracle())
def hll_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source bigram cardinality: portable-HLL estimate vs exact.

    Columns: source, exact_distinct, registers_nonzero,
    hll_estimate (stable-rounded, 4), rel_error (stable-rounded, 6).

    The register aggregation is the deployment path: md5 → (idx, rho)
    inside the scan projection, ``GROUP BY (source, idx) MAX(rho)``
    with map-side partial max (≤256 rows per source cross the wire),
    then a 256-row-per-source fold into the integer harmonic sum.
    The exact ``COUNT(DISTINCT)`` leg is the audit comparator only.
    """
    docs = load_table(spark, sf_dir, "documents")
    raw = (
        docs.select("source", F.split(F.col("text"), " ").alias("ts"))
        .select("source", F.explode(F.expr(_BIGRAMS_SPARK)).alias("bg"))
    )
    hashed = raw.select("source", "bg", F.expr("md5(bg)").alias("h"))
    regs = hashed.groupBy(
        "source", F.expr(SK.hll_idx_expr("h")).alias("idx")
    ).agg(F.expr(f"MAX({SK.hll_rho_expr('h')})").alias("reg"))
    sk = regs.groupBy("source").agg(
        F.count("*").alias("registers_nonzero"),
        F.expr(SK.hll_sint_agg_expr()).alias("s_int"),
    )
    exact = raw.groupBy("source").agg(
        F.countDistinct("bg").alias("exact_distinct")
    )
    est = _hll_est()
    rel = (
        f"abs({est} - CAST(exact_distinct AS DOUBLE))"
        f" / CAST(exact_distinct AS DOUBLE)"
    )
    return sk.join(exact, "source").select(
        "source",
        "exact_distinct",
        "registers_nonzero",
        F.expr(stable_round(est, 4)).alias("hll_estimate"),
        F.expr(stable_round(rel, 6)).alias("rel_error"),
    )
