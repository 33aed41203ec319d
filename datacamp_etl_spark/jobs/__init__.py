"""Job control plane: state machine, bundles, manager/scheduler."""

from datacamp_etl_spark.jobs.job import Job, JobFailure  # noqa: F401
from datacamp_etl_spark.jobs.loading_job import LoadingJob  # noqa: F401
from datacamp_etl_spark.jobs.extraction_job import ExtractionJob  # noqa: F401
