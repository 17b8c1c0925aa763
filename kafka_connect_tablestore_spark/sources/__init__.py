from kafka_connect_tablestore_spark.sources.synth import synth_changelog  # noqa: F401
