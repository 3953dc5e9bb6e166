from stock_market_data_pipeline_spark.streaming.sources import (
    file_stream,
    kafka_stream,
    rate_ticks,
)
from stock_market_data_pipeline_spark.streaming.pipeline import (
    stream_sliding_metrics,
    stream_windowed_analytics,
)

__all__ = [
    "file_stream",
    "kafka_stream",
    "rate_ticks",
    "stream_sliding_metrics",
    "stream_windowed_analytics",
]
