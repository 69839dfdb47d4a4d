"""Regression guard for the driver's 50-query correctness window.

The external driver value-checks only the first 50 ``queries()``
entries against ``oracle_sql()``.  A query whose oracle is missing can
only ever produce a weaker rows-only check, so parking one inside the
window permanently wastes a driver slot (this bit round 4: the two
t-digest quantile queries sat in-window as ``no_oracle`` for a full
round).  This test pins the invariant the round-4 verdict asked for
(Next round #6): every in-window query has a value oracle unless it is
on the explicit allowlist below — so future registry growth cannot
silently push value-checkable queries into the tail or re-seat a
rows-only query in the window.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __ray_entry__ as entry

DRIVER_WINDOW = 50

# Queries allowed inside the window WITHOUT a value oracle.  Empty by
# design: rows-only queries (approximate sketches, stateful streaming)
# belong in the tail where tests/test_tail_oracles.py still executes
# them.  Add a name here only with a comment explaining why a rows-only
# check deserves one of the 50 driver slots.
NO_ORACLE_ALLOWLIST: frozenset[str] = frozenset()


def test_window_queries_all_have_value_oracles():
    names = list(entry.queries())
    window = names[:DRIVER_WINDOW]
    oracles = entry.oracle_sql()
    missing = [
        n
        for n in window
        if (n not in oracles or not oracles[n]) and n not in NO_ORACLE_ALLOWLIST
    ]
    assert not missing, (
        f"driver-window queries without a value oracle (move them to the "
        f"tail or allowlist them with justification): {missing}"
    )


def test_window_is_full():
    # A registry shorter than the window would silently shrink driver
    # coverage; the registry has been >50 since round 3.
    assert len(list(entry.queries())) >= DRIVER_WINDOW


def test_oracle_keys_subset_of_queries():
    # An oracle entry whose query was renamed/removed is dead weight and
    # usually signals a botched rotation.
    q = set(entry.queries())
    dangling = [k for k in entry.oracle_sql() if k not in q]
    assert not dangling, f"oracle_sql entries with no matching query: {dangling}"
