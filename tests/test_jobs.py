"""Job state machine (O3) + scheduler (O5) — mirrors the reference's
etl_manager_test / job_running_test shapes."""

from __future__ import annotations

import datetime

from datacamp_etl_spark.jobs.job import Job


class PassJob(Job):
    ran = False

    def run(self):
        type(self).ran = True


class FailJob(Job):
    def run(self):
        self.fail("it failed")


class BoomJob(Job):
    def run(self):
        raise RuntimeError("boom")


class PhaseJob(Job):
    def run(self):
        self.phase = "waiting"
        self.phase = "finalize"


def test_job_ok_transitions(manager):
    job = PassJob(manager)
    job.launch_with_argument()
    assert PassJob.ran
    assert job.status == "ok"
    df = manager.store.read("etl_job_status")
    assert list(df["status"]) == ["ok"]
    assert df.iloc[0]["job_name"] == "pass"
    assert df.iloc[0]["start_time"] is not None
    assert df.iloc[0]["end_time"] is not None


def test_job_fail_records_message(manager):
    job = FailJob(manager)
    job.launch_with_argument()
    assert job.status == "failed"
    df = manager.store.read("etl_job_status")
    assert df.iloc[0]["message"] == "it failed"


def test_job_exception_caught_unless_debug(manager):
    job = BoomJob(manager)
    job.launch_with_argument()
    assert job.status == "failed"
    assert "boom" in job.message

    job2 = BoomJob(manager)
    raised = False
    try:
        job2.launch_with_argument(options={"debug": True})
    except RuntimeError:
        raised = True
    assert raised


def test_job_phases_persisted(manager):
    job = PhaseJob(manager)
    job.launch_with_argument()
    df = manager.store.read("etl_job_status")
    assert df.iloc[0]["phase"] == "finalize"


def test_job_name_convention():
    class CustomerDataLoading(Job):
        pass

    class FooExtraction(Job):
        pass

    class BarETLJob(Job):
        pass

    assert CustomerDataLoading.job_name() == "customer_data"
    assert FooExtraction.job_name() == "foo"
    assert BarETLJob.job_name() == "bar"


# -- scheduler matrix (test/etl_manager_test.rb:52-90; FIXTURES.md §1) --

def _seed_schedules(manager):
    rows = [
        dict(job_name="daily", is_enabled=1, schedule="daily", force_run=0, run_order=1),
        dict(job_name="mon_job", is_enabled=1, schedule="monday", force_run=0, run_order=2),
        dict(job_name="sat_job", is_enabled=1, schedule="saturday", force_run=0, run_order=3),
        dict(job_name="forced", is_enabled=1, schedule="monday", force_run=1, run_order=4),
        dict(job_name="forced", is_enabled=0, schedule="monday", force_run=1, run_order=5),
        dict(job_name="forced", is_enabled=0, schedule="daily", force_run=0, run_order=6),
    ]
    for r in rows:
        manager.store.insert("etl_schedules", r)


def test_scheduling_matrix(manager):
    _seed_schedules(manager)
    # 2026-08-10 is a Monday / 2026-08-15 a Saturday / 2026-08-11 a Tuesday
    monday = datetime.date(2026, 8, 10)
    saturday = datetime.date(2026, 8, 15)
    tuesday = datetime.date(2026, 8, 11)
    assert len(manager.planned_schedules(tuesday)) == 2   # daily + forced
    assert len(manager.planned_schedules(monday)) == 3    # daily, mon, forced
    assert len(manager.planned_schedules(saturday)) == 3  # daily, sat, forced
    assert len(manager.forced_schedules()) == 1
    # ordering by run_order
    assert list(manager.planned_schedules(monday)["run_order"]) == [1, 2, 4]


def test_run_scheduled_jobs_end_to_end(manager):
    # job_running_test.rb:14-55 shape: pass/fail/fail -> 1 effective run
    manager.register_job(PassJob, "pass")
    manager.register_job(FailJob, "fail")
    manager.store.insert(
        "etl_schedules",
        dict(job_name="pass", is_enabled=1, schedule="daily", force_run=0, run_order=1),
    )
    manager.store.insert(
        "etl_schedules",
        dict(job_name="fail", argument="x", is_enabled=1, schedule="daily", force_run=0, run_order=2),
    )
    jobs = manager.run_scheduled_jobs()
    assert [j.status for j in jobs] == ["ok", "failed"]
    statuses = manager.store.read("etl_job_status")
    assert sorted(statuses["status"]) == ["failed", "ok"]
    # last_run_date stamped -> not planned again today
    assert len(manager.planned_schedules()) == 0


def test_forced_schedule_resets_after_run(manager):
    manager.register_job(PassJob, "pass")
    manager.store.insert(
        "etl_schedules",
        dict(job_name="pass", is_enabled=1, schedule="monday", force_run=1, run_order=1),
    )
    tuesday = datetime.date(2026, 8, 11)
    jobs = manager.run_scheduled_jobs(tuesday)
    assert len(jobs) == 1
    # FIXME from etl_manager.rb:140 implemented: force_run cleared
    df = manager.store.read("etl_schedules")
    assert int(df.iloc[0]["force_run"]) == 0
    assert len(manager.planned_schedules(tuesday)) == 0
