"""stock_market_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark reimplementation of the query and data-processing
capabilities of the reference repo ``atulpandey02/stock-market-data-pipeline``
(see SURVEY.md for the full operator inventory), extended with the operators a
large-scale LLM-training-data pipeline needs (dedup, similarity search,
multimodal columns, text analysis).

Design stance (SURVEY.md §7):

* Pure, composable ``DataFrame -> DataFrame`` operator functions; no script
  duplication, no hidden state.
* Declarative plans only — Catalyst/Tungsten/AQE do the optimizing. No RDDs,
  no row-at-a-time Python UDFs in any hot path (Arrow-batched ``mapInPandas``
  only where built-ins genuinely can't express the semantics, e.g. multimodal
  decode stubs).
* Batch and streaming share one transform library (per *Structured Streaming*,
  SIGMOD 2018): every batch operator here can run under ``readStream`` or
  inside ``foreachBatch``.
* Every operator is designed partition-parallel for 100 TB: no ``collect()``
  in operators, no ``coalesce(1)`` defaults, broadcast hints for dimension
  tables, salting/AQE for skew.
"""

from stock_market_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
