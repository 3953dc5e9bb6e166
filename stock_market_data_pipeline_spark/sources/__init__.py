from stock_market_data_pipeline_spark.sources.batch import (
    read_csv_lake,
    read_parquet_lake,
    read_table,
)
from stock_market_data_pipeline_spark.sources.ticks import ticks_from_events

__all__ = ["read_csv_lake", "read_parquet_lake", "read_table", "ticks_from_events"]
