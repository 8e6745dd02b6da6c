"""Operator library. Importing this package registers every declared
query in litebase_spark.catalog.REGISTRY."""

from litebase_spark.operators import (  # noqa: F401
    asof,
    dedup,
    functions_cov,
    graph,
    layout,
    multimodal,
    pipeline,
    profiling,
    recursion,
    relational,
    similarity,
    skew,
    spatial,
    streaming_batch,
    text,
    text_trigram,
    tpch,
)
