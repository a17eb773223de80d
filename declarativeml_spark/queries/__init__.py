from declarativeml_spark.queries.registry import ORACLES, QUERIES, query

__all__ = ["QUERIES", "ORACLES", "query"]

# Importing the modules below populates the registry.
from declarativeml_spark.queries import (  # noqa: E402,F401
    pipeline,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
)
