"""CLI entry point (reference O7, ``bin/etl:29-223``).

Commands: ``list-jobs``, ``list-connections``, ``run <job> [arg]``,
``run-scheduled``, ``list-schedule``, ``initialize``; flags
``-c/--config``, ``-d/--debug``, ``-F/--force``. Config keys honored
(``config.yml.example:16-46``): ``job_search_path``,
``repository_search_path`` / ``connection_search_path`` (the reference
documents one and reads the other — both are supported, SURVEY §2.11),
``etl_files_path``, ``log_file``, ``warehouse_path``.

Usage: ``python -m datacamp_etl_spark.cli <command> [...]``
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Any

__all__ = ["main", "build_manager"]


def _load_config(path: str | None) -> dict[str, Any]:
    if not path:
        return {}
    try:
        import yaml  # type: ignore
    except ImportError:
        raise SystemExit("config files require pyyaml")
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return data if isinstance(data, dict) else {}


def build_manager(config: dict[str, Any], *, debug: bool = False):
    from datacamp_etl_spark.jobs.bundle import JobBundleManager
    from datacamp_etl_spark.jobs.manager import ETLManager
    from datacamp_etl_spark.session import get_spark
    from datacamp_etl_spark.sources.registry import RepositoryManager

    base = config.get("warehouse_path", os.path.join(os.getcwd(), "warehouse"))
    spark = get_spark("datacamp-etl-spark-cli")
    manager = ETLManager(
        spark,
        base,
        etl_files_path=config.get("etl_files_path"),
        log_file=config.get("log_file"),
        debug=debug,
    )
    bundles = JobBundleManager(_as_list(config.get("job_search_path")))
    manager.bundle_manager = bundles

    repo_path = _as_list(
        config.get("repository_search_path")
        or config.get("connection_search_path")
    )
    manager.repositories = RepositoryManager(repo_path)
    return manager


def _as_list(v: Any) -> list[str]:
    if v is None:
        return []
    if isinstance(v, str):
        return [v]
    return [str(x) for x in v]


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="etl", description="datacamp_etl_spark command line tool"
    )
    parser.add_argument("-c", "--config", help="YAML config file")
    parser.add_argument("-d", "--debug", action="store_true")
    parser.add_argument("-F", "--force", action="store_true")
    sub = parser.add_subparsers(dest="command", required=True)

    sub.add_parser("list-jobs")
    sub.add_parser("list-connections")
    run_p = sub.add_parser("run")
    run_p.add_argument("job")
    run_p.add_argument("argument", nargs="?")
    sub.add_parser("run-scheduled")
    sub.add_parser("list-schedule")
    sub.add_parser("initialize")

    args = parser.parse_args(argv)
    config = _load_config(args.config)
    manager = build_manager(config, debug=args.debug)

    if args.command == "list-jobs":
        for name in manager.bundle_manager.available_jobs():
            print(name)
    elif args.command == "list-connections":
        for name in manager.repositories.names():
            print(name)
    elif args.command == "initialize":
        manager.create_etl_manager_structures(force=args.force)
        print("system tables initialized")
    elif args.command == "list-schedule":
        df = manager.planned_schedules()
        for _, row in df.iterrows():
            print(f"{row['run_order']}\t{row['job_name']}\t{row['schedule']}")
    elif args.command == "run":
        try:
            job = manager.run_named_job(
                args.job, args.argument, options={"debug": args.debug}
            )
        except KeyError as e:
            print(f"error: {e.args[0] if e.args else e}", file=sys.stderr)
            return 2
        print(f"{job.name}: {job.status}")
        return 0 if job.status == "ok" else 1
    elif args.command == "run-scheduled":
        jobs = manager.run_scheduled_jobs()
        for job in jobs:
            print(f"{job.name}: {job.status}")
        return 0 if all(j.status == "ok" for j in jobs) else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
