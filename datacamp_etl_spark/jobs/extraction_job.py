"""Extraction job base class (reference ``lib/etl/extraction.rb``).

The reference's ``Extraction`` adds only a naming convention
(``FooExtraction`` -> job name ``foo``, ``extraction.rb:23-30``) and the
``output_tables``/``temporary_tables``/``enumeration_tables`` readers
(``extraction.rb:24``). Extractions land raw data in staging, usually
via the download pipeline (O8) + ``spark.read``.
"""

from __future__ import annotations

from datacamp_etl_spark.jobs.job import Job

__all__ = ["ExtractionJob"]


class ExtractionJob(Job):
    job_type = "extraction"

    def __init__(self, manager, bundle=None):
        super().__init__(manager, bundle)
        self.output_tables: list[str] = []
        self.temporary_tables: list[str] = []
        self.enumeration_tables: list[str] = []

    @property
    def staging(self):
        return self.manager.staging
