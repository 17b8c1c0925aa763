"""kafka_connect_tablestore_spark — a from-scratch PySpark-native CDC /
incremental-ingest engine with the query and data-processing capabilities of
the ``aliyun/kafka-connect-tablestore`` Kafka Connect sink connector.

This is NOT a port. The reference (Java, per-record loop) tells us WHAT to
compute — the row-change model (PUT/UPDATE/DELETE with primary-key
extraction), topic→table routing, column whitelisting, type conversion,
dead-lettering, ordered last-writer-wins application — and we re-express each
of those semantics as declarative PySpark DataFrame plans executed by
Catalyst/Tungsten, applied as MERGE-style upserts into a bucketed lake table
(Iceberg-compatible layout with a pure-parquet fallback backend so no
external jars are required).

Layout
------
- ``config``            sink configuration (insert/delete/pk modes, whitelist, routing)
- ``sources``           deterministic synthetic CDC change-log generator + readers
- ``functions``         vectorized scalar functions (hashing, casts, text analysis)
- ``operators``         dataflow operators (S1..S21 of SURVEY.md §2 + pipeline ops)
- ``plans``             merge/fold semantics and schema evolution
- ``lake``              LakeTable storage (bucketed parquet snapshots, manifests)
- ``streaming``         Structured Streaming micro-batch orchestration
- ``engine``            the end-to-end CDC engine (batch apply + replay)
- ``oracle``            pure-Python sequential replay oracle for golden tests
"""

__version__ = "0.1.0"

from kafka_connect_tablestore_spark.config import (  # noqa: F401
    DeleteMode,
    InsertMode,
    PrimaryKeyMode,
    RuntimeErrorTolerance,
    SinkConfig,
)
