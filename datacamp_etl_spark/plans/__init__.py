"""Plan-inspection utilities: verify the physical plan is the one you
want (pushdown reached the scan, small sides broadcast, codegen on).

The reference had no optimizer to inspect (SURVEY §4); these helpers
are the engine's guardrails that Catalyst produced the intended plan —
used in tests so scale regressions (a lost broadcast, a filter that
stopped pushing down) fail CI instead of surfacing at 100 TB.
"""

from datacamp_etl_spark.plans.explain import (  # noqa: F401
    explain_str,
    pushed_filters,
    partition_filters,
    read_schema_columns,
    assert_filter_pushed,
    assert_column_pruned,
    assert_broadcast_join,
    assert_no_cartesian,
    count_exchanges,
)
