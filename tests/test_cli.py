"""CLI (O7) driven end-to-end through main()."""

from __future__ import annotations

import textwrap

from datacamp_etl_spark.cli import main


def _setup(tmp_path):
    jobs = tmp_path / "jobs"
    jobs.mkdir()
    bundle = jobs / "hello.etl"
    bundle.mkdir()
    (bundle / "hello.py").write_text(
        textwrap.dedent(
            """
            from datacamp_etl_spark.jobs.job import Job

            class HelloETLJob(Job):
                def run(self):
                    if self.argument == "fail":
                        self.fail("no")
            """
        )
    )
    repos = tmp_path / "repos"
    repos.mkdir()
    (repos / "conns.yml").write_text(
        "local_parquet:\n  adapter: parquet\n  path: /root/testdata/sf0.001\n"
    )
    cfg = tmp_path / "config.yml"
    cfg.write_text(
        textwrap.dedent(
            f"""
            warehouse_path: {tmp_path}/warehouse
            job_search_path: {jobs}
            connection_search_path: {repos}
            etl_files_path: {tmp_path}/files
            """
        )
    )
    return str(cfg)


def test_cli_initialize_list_run(tmp_path, capsys, spark):
    cfg = _setup(tmp_path)

    assert main(["-c", cfg, "initialize"]) == 0
    assert "initialized" in capsys.readouterr().out

    assert main(["-c", cfg, "list-jobs"]) == 0
    assert "hello" in capsys.readouterr().out

    assert main(["-c", cfg, "run", "hello"]) == 0
    assert "hello: ok" in capsys.readouterr().out

    assert main(["-c", cfg, "run", "hello", "fail"]) == 1
    assert "hello: failed" in capsys.readouterr().out


def test_cli_connection_search_path_alias(tmp_path, capsys, spark):
    # config.yml.example documents connection_search_path while bin/etl
    # read repository_search_path — both must work (SURVEY §2.11 O7).
    cfg = _setup(tmp_path)
    assert main(["-c", cfg, "list-connections"]) == 0
    assert "local_parquet" in capsys.readouterr().out
