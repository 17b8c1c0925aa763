from kafka_connect_tablestore_spark.operators.rowchange import (  # noqa: F401
    split_errant,
    validate_and_classify,
)
from kafka_connect_tablestore_spark.operators.lww import (  # noqa: F401
    lww_dedup_window,
    lww_dedup_salted,
)
