from kafka_stream_faust_deprecated_spark.sources.tick_source import (
    StockTickDataSource,
    register_tick_source,
    tick_payload,
)

__all__ = ["StockTickDataSource", "register_tick_source", "tick_payload"]
