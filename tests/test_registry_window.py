"""Registry-window hygiene (VERDICT r6 item #1, r7 items #1/#3).

The round driver oracle-adjudicates only the FIRST-50 prefix of the
``QUERIES`` registry. From round 8 the registry order is a
deterministic rotation driven by the adjudication ledger
(``datacamp_etl_spark/adjudication.py``): never-adjudicated entries
first (so every new operator is driver-checked on its first round),
then everything else ascending by last-adjudicated round. These tests
pin that contract so a regression (entry missing from the ledger
update, rotation accidentally dropped) fails loudly.
"""

from __future__ import annotations

from datacamp_etl_spark.adjudication import LAST_ADJUDICATED
from datacamp_etl_spark.queries import ORACLE, PINNED_FRONT, QUERIES

WINDOW = 50


def test_new_entries_lead_the_registry():
    """Entries with no driver record yet must occupy the registry
    front, inside the adjudication window."""
    names = list(QUERIES)
    new = [n for n in names if n not in LAST_ADJUDICATED]
    assert len(new) + len(PINNED_FRONT) <= WINDOW, (
        f"{len(new)} never-adjudicated + {len(PINNED_FRONT)} pinned "
        f"entries exceed the {WINDOW}-slot window; stagger additions"
    )
    assert names[: len(new)] == new, (
        "never-adjudicated entries are not front-loaded: rotation broken"
    )


def test_pinned_entries_follow_the_new_block():
    """Manual front-loads (latest driver row non-green, fix shipped)
    slot right after the never-adjudicated block so the driver
    re-checks them THIS round instead of at their ledger rank."""
    names = list(QUERIES)
    new = [n for n in names if n not in LAST_ADJUDICATED]
    pinned = [p for p in PINNED_FRONT if p in LAST_ADJUDICATED]
    assert names[len(new) : len(new) + len(pinned)] == pinned, (
        "pinned entries are not immediately after the new block"
    )


def test_rotation_is_least_recently_adjudicated_first():
    """After the new + pinned entries, staleness must be
    non-decreasing: the window always holds the entries the driver
    has seen least recently."""
    rounds = [
        LAST_ADJUDICATED[n]
        for n in QUERIES
        if n in LAST_ADJUDICATED and n not in PINNED_FRONT
    ]
    assert rounds == sorted(rounds), (
        "adjudicated entries are not ordered by last-checked round"
    )


def test_ledger_covers_only_known_entries():
    unknown = set(LAST_ADJUDICATED) - set(QUERIES)
    assert not unknown, f"ledger references unknown entries: {unknown}"


def test_every_query_has_oracle():
    """All registry entries are hash-gated (VERDICT r7 item #2 closed
    the last rows-only entry, hll_incremental_distinct)."""
    rows_only = {n for n in QUERIES if n not in ORACLE}
    assert not rows_only, (
        f"unexpected rows-only entries (no oracle_sql): {rows_only}"
    )
