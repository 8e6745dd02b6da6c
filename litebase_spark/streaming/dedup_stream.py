"""Streaming near-duplicate filter: continuous-ingestion minhash dedup.

`stream_dedup` (streaming_batch.py / dropDuplicates-with-watermark)
handles EXACT duplicate suppression natively. Near-dup suppression has
no built-in: the state is a minhash signature index that must grow with
the accepted corpus and be probed by every arriving batch. This module
implements it as a foreachBatch pipeline around the SAME banded-join
kernel as the batch operators (dedup.py: minhash_signatures /
band_signatures / dedup_incremental_minhash semantics):

  per microbatch:
    1. signature the batch (Arrow kernel, narrow map),
    2. probe the accumulated band index on (band, bucket) — the only
       shuffle, keyed exactly like the batch operator,
    3. reject batch docs with est Jaccard >= threshold vs the index
       (batch-internal dups resolve against the lowest accepted doc_id),
    4. append the survivors' banded signatures to the index.

State contract at scale: the index is a TABLE partitioned by (band,
bucket) — bounded by the accepted corpus, not the stream; each batch
shuffles only itself plus the touched buckets. Idempotence mirrors
ForeachBatchUpsertSink: replayed batch ids are skipped. On a lake
format the append is a transactional commit; here it is an in-memory
DataFrame union kept checkpointed (the swap point is `_append` alone).

The semantics are deliberately identical to running
dedup_incremental_minhash with the accepted-so-far corpus as the index
— test_streaming asserts stream == sequential-batch replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from litebase_spark.operators.dedup import (
    N_BANDS,
    N_HASHES,
    band_signatures,
    minhash_signatures,
)


class StreamingMinhashDedup:
    """foreachBatch near-dup filter with a growing signature index."""

    def __init__(
        self, spark: SparkSession, threshold: float = 0.4
    ) -> None:
        self.spark = spark
        self.threshold = threshold
        self._index: DataFrame | None = None  # (doc_id, sig, band, bucket)
        self.accepted: list[DataFrame] = []
        self.rejected: list[DataFrame] = []
        self.applied_batches: list[int] = []

    # -- core batch step (also the unit under parity test) ----------------

    def apply(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.applied_batches:
            return  # replayed after restart
        rows_per_band = N_HASHES // N_BANDS
        sigs = minhash_signatures(
            batch_df.select("doc_id", "text")
        ).localCheckpoint(eager=True)
        banded = band_signatures(sigs, N_BANDS, rows_per_band)

        est = (
            F.size(
                F.filter(
                    F.zip_with(
                        "i.sig", "n.sig", lambda x, y: (x == y).cast("int")
                    ),
                    lambda v: v == 1,
                )
            ).cast("double")
            / N_HASHES
        )

        def probe(new_side: DataFrame, idx_side: DataFrame) -> DataFrame:
            """doc_ids of new_side matching idx_side at >= threshold."""
            return (
                idx_side.alias("i")
                .join(
                    new_side.alias("n"),
                    (F.col("i.band") == F.col("n.band"))
                    & (F.col("i.bucket") == F.col("n.bucket"))
                    & (F.col("i.doc_id") != F.col("n.doc_id")),
                )
                .filter(est >= self.threshold)
                .select(F.col("n.doc_id").alias("doc_id"))
                .distinct()
            )

        # vs the accumulated index
        dup_ids = (
            probe(banded, self._index)
            if self._index is not None
            else self.spark.createDataFrame([], "doc_id long")
        )
        # batch-internal: a doc loses only to a LOWER-id batch doc that
        # itself survives the index (sequential-arrival semantics within
        # the batch, resolved set-wise like the engine's upsert dedup)
        survivors_banded = banded.join(dup_ids, "doc_id", "left_anti")
        internal = (
            survivors_banded.alias("i")
            .join(
                survivors_banded.alias("n"),
                (F.col("i.band") == F.col("n.band"))
                & (F.col("i.bucket") == F.col("n.bucket"))
                & (F.col("i.doc_id") < F.col("n.doc_id")),
            )
            .filter(est >= self.threshold)
            .select(F.col("n.doc_id").alias("doc_id"))
            .distinct()
        )
        all_dups = dup_ids.unionByName(internal).distinct().localCheckpoint(
            eager=True
        )
        kept_banded = banded.join(all_dups, "doc_id", "left_anti")
        self._append(kept_banded)
        self.accepted.append(
            batch_df.select("doc_id").join(all_dups, "doc_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        self.rejected.append(all_dups)
        self.applied_batches.append(batch_id)

    def _append(self, banded: DataFrame) -> None:
        banded = banded.localCheckpoint(eager=True)
        self._index = (
            banded
            if self._index is None
            else self._index.unionByName(banded)
        )

    # -- results -----------------------------------------------------------

    def accepted_ids(self) -> list[int]:
        out: set[int] = set()
        for df in self.accepted:
            out.update(r["doc_id"] for r in df.collect())
        return sorted(out)

    def rejected_ids(self) -> list[int]:
        out: set[int] = set()
        for df in self.rejected:
            out.update(r["doc_id"] for r in df.collect())
        return sorted(out)

    def attach(self, stream: DataFrame, **trigger_kwargs):
        """Start a structured stream through the filter."""
        return (
            stream.writeStream.foreachBatch(self.apply)
            .trigger(**(trigger_kwargs or {"availableNow": True}))
            .start()
        )
