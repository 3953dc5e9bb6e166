from stock_market_data_pipeline_spark.sinks.lake import (
    merge_upsert,
    merge_upsert_bucketed,
    write_partitioned,
)
from stock_market_data_pipeline_spark.sinks.warehouse import (
    build_merge_plan,
    merge_to_warehouse,
)

__all__ = [
    "merge_upsert",
    "merge_upsert_bucketed",
    "write_partitioned",
    "build_merge_plan",
    "merge_to_warehouse",
]
