"""Registry-wide physical-plan audit: no query may plan a cartesian
product, and nested-loop joins are allowed only where the broadcast
side is bounded by construction (scalar aggregates, fixed rate
tables, bounded time spines) — the patterns that stay cheap at any
data scale. A new entry here needs a written justification."""

from __future__ import annotations

import pytest

from datacamp_etl_spark.queries import QUERIES

#: BroadcastNestedLoopJoin allowlist: query -> why the broadcast side
#: cannot scale with the data.
ALLOWED_BNLJ = {
    "q11_top_value_parts": "1-row scalar threshold (sum * fraction)",
    "q20_top_quantity_suppliers": "1-row scalar (half of avg quantity)",
    "q22_dormant_customers": "1-row scalar (avg positive balance)",
    "tfidf_topk_terms": "1-row corpus stats (N docs)",
    "bm25_search": "1-row corpus stats (N docs, avg doc length)",
    "hybrid_search_rrf": "inherits bm25_search's 1-row corpus-stats "
    "broadcast; both fusion pools are TakeOrdered-bounded",
    "cosine_near_dup": "documented exact=True verification variant; "
    "the default scale path is cosine_near_dup_lsh",
    "temperature_mix": "per-source sampling-rate table (|sources| rows)",
    "gapfill_hourly_events": "hour spine bounded by the queried range",
}


def _plannable(name: str) -> bool:
    # Streaming queries execute on construction (AvailableNow drain);
    # their plans are covered by their own tests.
    return not name.startswith(("streaming_", "stateful_"))


@pytest.mark.parametrize(
    "name", [n for n in sorted(QUERIES) if _plannable(n)]
)
def test_no_unbounded_join_explosion(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in phys, f"{name} plans a cartesian"
    if "BroadcastNestedLoop" in phys:
        assert name in ALLOWED_BNLJ, (
            f"{name} plans BroadcastNestedLoopJoin but has no bounded-"
            f"broadcast justification in ALLOWED_BNLJ"
        )
