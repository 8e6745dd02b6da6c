"""Operator library. Importing this package registers every declared
query in litebase_spark.catalog.REGISTRY."""

from litebase_spark.operators import (  # noqa: F401
    asof,
    dedup,
    functions_cov,
    layout,
    multimodal,
    pipeline,
    recursion,
    relational,
    similarity,
    skew,
    spatial,
    streaming_batch,
    text,
    tpch,
)
