"""Streaming model serving: the Spark analogue of a DEPLOY endpoint.

The reference *specifies* deployment as a served endpoint with a
latency/throughput config (reference: DSL.md:57-66 — `DEPLOY MODEL
… WITH CONFIGURATION {'max_latency': '50ms', …}`) and a deployment
worker (DISTRIBUTED.md:348-415). The idiomatic Spark form is a
Structured Streaming scoring job: ``readStream`` source →
feature derivation → ``PipelineModel.transform`` (MLlib transforms
are streaming-safe: pure per-row expression pipelines) →
``writeStream`` sink. Latency config maps to the micro-batch
trigger; throughput comes from source partitioning.

Scale: the scoring pipeline is stateless per row, so it parallelizes
to any number of executors; the model broadcast is one-time per
query. Watermarks/state are only needed upstream (sessionization),
never for scoring itself.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from declarativeml_spark.ml.models import registry_load


def serve_model_stream(
    spark: SparkSession,
    model_name: str,
    stream_df: DataFrame,
    *,
    features: Optional[list[str]] = None,
    base: Optional[str] = None,
    query_name: Optional[str] = None,
    trigger_seconds: Optional[float] = None,
    once: bool = False,
) -> StreamingQuery:
    """Score a streaming DataFrame with a registered model.

    Returns the running :class:`StreamingQuery`; results land in an
    in-memory sink queryable as ``query_name`` (a production
    deployment swaps the sink for Kafka/a table — same handle).

    ``features``: the feature expressions stored in the model's
    registry metadata (pass explicitly to skip the metadata lookup).
    ``trigger_seconds``: micro-batch cadence — the `max_latency`
    deploy-config analogue.
    """
    if not stream_df.isStreaming:
        raise ValueError("serve_model_stream needs a streaming DataFrame")
    model = registry_load(spark, model_name, base=base)
    if features is None:
        # models trained with derived expressions assemble from
        # materialized __feat_i columns (plans/builder.py) — without
        # rebuilding them here the VectorAssembler's inputs are
        # missing from the stream and the query fails at start
        from declarativeml_spark.ml.models import registry_meta

        features = registry_meta(model_name, base=base).get("features")
    if features:
        from declarativeml_spark.plans.builder import build_features

        stream_df = build_features(stream_df, features).df
    scored = model.transform(stream_df)
    query_name = query_name or f"serving_{model_name}"
    writer = (
        scored.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
