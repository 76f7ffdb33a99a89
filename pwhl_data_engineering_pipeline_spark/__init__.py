"""pwhl_data_engineering_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference repo ``romanesquibel562/pwhl_data_engineering_pipeline``
(a pandas + BigQuery star-schema ETL project), re-expressed as a library of
composable PySpark DataFrame operators, a Spark SQL layer, a data-quality
contract API, and large-scale LLM-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal column plumbing).

Design principles (see SURVEY.md):
- DataFrame/SQL first: declare logical plans, let Catalyst + AQE pick physical
  strategy (broadcast joins, partial aggregation, partition pruning).
- Zero row-at-a-time Python UDFs in hot paths; native ``pyspark.sql.functions``
  everywhere the semantics allow, Arrow-batched pandas UDFs otherwise.
- Explicit StructType schemas; never ``inferSchema`` in production paths.
- Null-safe SQL semantics (``try_*`` / non-ANSI): division by zero and failed
  casts yield NULL, matching BigQuery SAFE_DIVIDE / pandas errors="coerce".
- Designed for 100 TB: partition-by-date writes, sort-within-partition
  clustering, broadcast hints for small dims, salting/AQE for skew.
"""

__version__ = "0.1.0"
