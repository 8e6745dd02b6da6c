"""Operator library. Importing this package registers every declared
query in litebase_spark.catalog.REGISTRY."""

from litebase_spark.operators import (  # noqa: F401
    dedup,
    multimodal,
    relational,
    similarity,
    streaming_batch,
    text,
)
