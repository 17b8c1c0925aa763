from kafka_connect_tablestore_spark.functions.hashing import (  # noqa: F401
    content_sha256,
    sha256_pandas,
)
from kafka_connect_tablestore_spark.functions.casts import cast_column_lattice  # noqa: F401
