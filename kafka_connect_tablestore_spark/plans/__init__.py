from kafka_connect_tablestore_spark.plans.merge import fold_state, merge_into_state  # noqa: F401
