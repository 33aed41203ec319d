"""Physical-plan assertions over ``explain()`` output."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "assert_filter_pushed",
    "assert_column_pruned",
    "assert_broadcast_join",
    "assert_no_cartesian",
    "count_exchanges",
]


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All ``PushedFilters: [...]`` entries from the parquet scans."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets each scan actually reads (``ReadSchema``)."""
    text = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = {
            c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()
        }
        out.append(cols)
    return out


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    """The scan must carry a pushed filter on ``column``."""
    filters = pushed_filters(df)
    if not any(column in f for f in filters):
        raise AssertionError(
            f"no pushed filter on {column!r}; PushedFilters={filters}\n"
            + explain_str(df)
        )


def assert_column_pruned(df: DataFrame, column: str) -> None:
    """No scan may read ``column`` (projection pruning worked)."""
    for cols in read_schema_columns(df):
        if column in cols:
            raise AssertionError(
                f"column {column!r} not pruned from scan; ReadSchema={cols}"
            )


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    text = explain_str(df)
    n = text.count("BroadcastHashJoin") + text.count("BroadcastNestedLoopJoin")
    if n < at_least:
        raise AssertionError(
            f"expected >= {at_least} broadcast joins, found {n}\n" + text
        )


def assert_no_cartesian(df: DataFrame) -> None:
    text = explain_str(df)
    if "CartesianProduct" in text:
        raise AssertionError("plan contains CartesianProduct\n" + text)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (lower = better, given
    equal semantics). Counts both simple-mode ("Exchange
    hashpartitioning(...)") and formatted-mode ("(3) Exchange") nodes;
    ReusedExchange is free and not counted."""
    text = explain_str(df)
    n = len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
            text,
        )
    )
    if n:
        return n
    return len(re.findall(r"\(\d+\) Exchange\b", text))


def partition_filters(df: DataFrame) -> list[str]:
    """All ``PartitionFilters: [...]`` entries from the scans (non-empty
    only) — proof that partition pruning reached the file index."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", text):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out
