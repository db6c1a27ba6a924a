"""Custom distributed operators Spark lacks as built-ins.

Each is a composition of DataFrame primitives (option (a) of the
custom-operator ladder: composition > pandas-UDF > mapPartitions),
designed so no stage depends on an unpartitioned global ordering.
"""

from kafka_stream_faust_deprecated_spark.operators.range_frame import (
    global_range_count,
)

__all__ = ["global_range_count"]
