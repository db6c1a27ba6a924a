from kafka_stream_faust_deprecated_spark.streaming.sma import (
    sma_aggregate,
    build_kafka_sma_job,
    build_file_sma_query,
)
from kafka_stream_faust_deprecated_spark.streaming.windows import (
    tumbling_aggregate,
    sliding_aggregate,
    sessionize,
    streaming_dedup,
    stream_stream_join,
)
from kafka_stream_faust_deprecated_spark.streaming.sinks import (
    idempotent_parquet_sink,
    read_sink,
    read_upsert_table,
    upsert_latest_sink,
)
from kafka_stream_faust_deprecated_spark.streaming.metrics import ProgressRecorder

__all__ = [
    "sma_aggregate",
    "build_kafka_sma_job",
    "build_file_sma_query",
    "tumbling_aggregate",
    "sliding_aggregate",
    "sessionize",
    "streaming_dedup",
    "stream_stream_join",
    "idempotent_parquet_sink",
    "read_sink",
    "upsert_latest_sink",
    "read_upsert_table",
    "ProgressRecorder",
]
