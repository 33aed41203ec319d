"""datacamp_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of the Stiivi/Datacamp-ETL
reference framework (Ruby, SQL-pushdown-to-MySQL) as an idiomatic
PySpark engine: DataFrame/Spark-SQL data plane, a thin Python control
plane (jobs, bundles, schedules, defaults, batches), plus large-scale
training-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Package map
-----------
- ``session``    SparkSession factory with scale-appropriate defaults
- ``operators``  data-plane operators (mapping DSL, loading, CDC diff,
                 dedup, similarity, text analysis, multimodal)
- ``sources``    connection registry, readers, parallel HTTP download
- ``functions``  shared column-expression helpers
- ``plans``      plan-inspection utilities (pushdown/broadcast asserts)
- ``streaming``  incremental loads + Structured Streaming operators
- ``metadata``   control-plane store (schedules, defaults, status, batches)
- ``jobs``       Job state machine, bundle registry, ETL manager
"""

__version__ = "0.1.0"
