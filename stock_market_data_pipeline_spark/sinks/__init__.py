from stock_market_data_pipeline_spark.sinks.lake import (
    merge_upsert,
    write_partitioned,
)

__all__ = ["merge_upsert", "write_partitioned"]
