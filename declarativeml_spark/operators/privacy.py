"""Structural-plane privacy audits (k-anonymity).

Complements operators/pii.py: pii.py scrubs the CONTENT plane
(emails, SSNs inside text); this module audits the STRUCTURAL plane
— whether the combination of released columns re-identifies users
even after ids are dropped (Sweeney 2002). The DSL surface is
``AUDIT ANONYMITY <source> ON col[, col...] [RISK k]``; the
oracle-checked twin over a behavioural profile is
queries/pipeline8.py::events_k_anonymity.

Scale: one hash aggregation over the quasi-identifier columns —
map-side combinable, output bounded by the QI-combination
cardinality, never by the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame, qi_cols: list[str], risk: int = 5
) -> DataFrame:
    """Equivalence-class report over the quasi-identifier columns:
    one row per distinct QI combination with its member count and an
    ``at_risk`` flag (count < ``risk``). A release is k-anonymous at
    k = ``risk`` iff no row is flagged.

    Deterministic: a plain groupBy — no sampling, no ordering
    dependence.
    """
    if not qi_cols:
        raise ValueError("k-anonymity needs at least one quasi-identifier column")
    if not isinstance(risk, int) or isinstance(risk, bool) or risk <= 0:
        raise ValueError("RISK must be a positive class-size threshold")
    missing = [c for c in qi_cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"quasi-identifier column(s) {missing} not in {df.columns}"
        )
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        (F.count(F.lit(1)) < risk).alias("at_risk"),
    )
