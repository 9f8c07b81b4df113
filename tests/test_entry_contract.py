"""Driver-contract consistency: queries() and oracle_sql() must stay in
lockstep (every query either has an oracle or is knowingly rows-only)."""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_query_has_an_oracle():
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    # no stale oracles for removed queries
    assert oracles <= qs
    # all current queries are oracle-checked (none intentionally
    # rows-only right now — update this list if one becomes so)
    rows_only: set[str] = set()
    assert qs - oracles == rows_only


def test_oracle_sql_is_static_text():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_queries_are_callables():
    for name, fn in entry.queries().items():
        assert callable(fn), name
