"""Bundle discovery/loading (O1/O2) + CLI (O7) — mirrors the
reference's etl_manager_test bundle fixtures."""

from __future__ import annotations

import os
import textwrap

import pytest

from datacamp_etl_spark.jobs.bundle import JobBundleManager


def _write_bundle(root, name, code, info=None):
    d = root / f"{name}.etl"
    d.mkdir(parents=True)
    (d / f"{name}.py").write_text(textwrap.dedent(code))
    if info is not None:
        (d / "info.yml").write_text(info)
    return d


@pytest.fixture()
def bundles(tmp_path):
    jobs1 = tmp_path / "jobs"
    jobs2 = tmp_path / "another_jobs_dir"
    # explicit job_class via info.yml (test/jobs/test.etl)
    _write_bundle(
        jobs1,
        "test",
        """
        from datacamp_etl_spark.jobs.job import Job

        class TestJob(Job):
            def run(self):
                if self.argument == "fail":
                    self.fail("requested failure")
        """,
        info="full_name: Test job\njob_type: python\njob_class: TestJob\n",
    )
    # convention-named class, no info.yml (test/jobs/no_info.etl)
    _write_bundle(
        jobs1,
        "no_info",
        """
        from datacamp_etl_spark.jobs.job import Job

        class NoInfoETLJob(Job):
            def run(self):
                pass
        """,
    )
    # wrong superclass must raise (test/jobs/wrong_superclass.etl)
    _write_bundle(
        jobs1,
        "wrong_superclass",
        """
        class WrongSuperclassETLJob:
            pass
        """,
    )
    # second search-path dir (test/another_jobs_dir/test2.etl)
    _write_bundle(
        jobs2,
        "test2",
        """
        from datacamp_etl_spark.jobs.job import Job

        class Test2ETLJob(Job):
            def run(self):
                pass
        """,
    )
    return JobBundleManager([str(jobs1), str(jobs2)])


def test_available_jobs_across_search_path(bundles):
    assert bundles.available_jobs() == ["no_info", "test", "test2", "wrong_superclass"]


def test_explicit_job_class(bundles):
    cls = bundles.job_class("test")
    assert cls.__name__ == "TestJob"


def test_convention_class_name(bundles):
    cls = bundles.job_class("no_info")
    assert cls.__name__ == "NoInfoETLJob"


def test_second_search_path(bundles):
    assert bundles.job_class("test2").__name__ == "Test2ETLJob"


def test_wrong_superclass_raises(bundles):
    with pytest.raises(RuntimeError, match="not a Job subclass"):
        bundles.job_class("wrong_superclass")


def test_unknown_bundle_raises(bundles):
    with pytest.raises(KeyError):
        bundles.bundle_with_name("nope")


def test_bundle_cache(bundles):
    assert bundles.bundle_with_name("test") is bundles.bundle_with_name("test")


def test_manager_runs_bundle_job(manager, bundles):
    manager.bundle_manager = bundles
    job = manager.run_named_job("test", "pass")
    assert job.status == "ok"
    job2 = manager.run_named_job("test", "fail")
    assert job2.status == "failed"
    assert job2.message == "requested failure"


def test_monitoring_view(manager):
    job_id = manager.store.insert(
        "etl_jobs", {"name": "demo", "is_enabled": 1, "job_type": "python"}
    )
    import datetime

    manager.store.insert(
        "etl_job_status",
        {
            "job_name": "demo",
            "job_id": job_id,
            "status": "ok",
            "start_time": datetime.datetime(2026, 1, 1, 10, 0, 0),
            "end_time": datetime.datetime(2026, 1, 1, 10, 0, 5),
        },
    )
    rows = manager.monitoring_view().collect()
    assert len(rows) == 1
    assert rows[0]["name"] == "demo"
    assert rows[0]["duration_sec"] == 5.0
