from kafka_connect_tablestore_spark.streaming.pipeline import start_cdc_stream  # noqa: F401
