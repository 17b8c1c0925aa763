"""CdcEngine: the end-to-end pipeline (the Spark-native ``TableStoreSinkTask``).

Reference hot loop (``TableStoreSinkTask.java:106-122`` →
``TableStoreSinkWriter.java:215-272``): route → transform (PK extraction,
projection, row-change decision) → bucketed ordered write → flush → report
errants → commit offsets.  Here the same stages are one declarative plan per
micro-batch:

    events → validate/classify (Catalyst exprs) → split errant/clean
           → DLQ append                         → fold/MERGE into LakeTable
           → snapshot commit with embedded batch manifest (exactly-once)

``apply_batch`` is the ``foreachBatch`` body; ``replay`` drives a batch
change log through ordered micro-batches (offset-range sliced) and is the
crash-resume surface (a re-run skips committed batch_ids).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import RuntimeErrorTolerance, SinkConfig
from kafka_connect_tablestore_spark.lake.table import LakeTable
from kafka_connect_tablestore_spark.operators.rowchange import (
    dlq_rows,
    enforce_tolerance,
    split_errant,
    validate_and_classify,
)


class CdcEngine:
    def __init__(
        self,
        spark: SparkSession,
        config: SinkConfig,
        lake_root: str,
        table: str = "repos",
        attr_fields: tuple[str, ...] = ("commit", "lang", "content"),
    ) -> None:
        self.spark = spark
        self.config = config
        self.attr_fields = attr_fields
        self.table = LakeTable(spark, lake_root, table, config, attr_fields)

    # ------------------------------------------------------------ one batch
    def apply_batch(self, events: DataFrame, batch_id: str) -> dict:
        """Apply one micro-batch; returns the committed manifest entry."""
        classified = validate_and_classify(events, self.config, self.attr_fields)
        clean, errant = split_errant(classified, self.config)
        enforce_tolerance(errant, self.config)
        if self.config.tolerance is RuntimeErrorTolerance.ALL:
            self.table.append_dlq(dlq_rows(errant), batch_id)
        return self.table.merge_batch(clean, batch_id)

    # -------------------------------------------------------------- replay
    def replay(
        self,
        events: DataFrame,
        n_batches: int = 1,
        batch_prefix: str = "replay",
    ) -> list[dict]:
        """Replay a change log as ``n_batches`` ordered micro-batches.

        Batches are sliced by offset range (offsets are monotone in event
        order), so batch k strictly precedes batch k+1 — the micro-batch
        equivalent of the reference's in-order ``put()`` calls.  Committed
        batch_ids are skipped, so re-running after a crash is exactly-once.
        """
        manifests: list[dict] = []
        if n_batches <= 1:
            return [self.apply_batch(events, f"{batch_prefix}-0")]
        lo, hi = events.select(F.min("offset"), F.max("offset")).first()
        if lo is None:
            return manifests
        span = math.ceil((hi - lo + 1) / n_batches)
        for k in range(n_batches):
            b = events.where(
                (F.col("offset") >= lo + k * span) & (F.col("offset") < lo + (k + 1) * span)
            )
            manifests.append(self.apply_batch(b, f"{batch_prefix}-{k}"))
        return manifests

    def state(self) -> DataFrame:
        return self.table.read()
