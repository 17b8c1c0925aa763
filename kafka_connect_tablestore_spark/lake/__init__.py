from kafka_connect_tablestore_spark.lake.table import LakeTable  # noqa: F401
