"""Sources & sinks: warehouse tables, connection registry, readers,
parallel HTTP download pipeline."""

from datacamp_etl_spark.sources.warehouse import Warehouse  # noqa: F401
from datacamp_etl_spark.sources.registry import RepositoryManager  # noqa: F401
