"""Control-plane metadata store.

Reference system tables (``install/etl_tables.mysql.sql:1-54``):
``etl_batches``, ``etl_job_status``, ``etl_defaults``,
``etl_schedules`` (+ legacy ``etl_jobs`` for the monitoring view).
"""

from datacamp_etl_spark.metadata.store import MetadataStore  # noqa: F401
from datacamp_etl_spark.metadata.defaults import ETLDefaults  # noqa: F401
