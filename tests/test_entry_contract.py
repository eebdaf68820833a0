"""Driver-contract consistency: the oracle map must stay aligned with
the queries map (a dangling oracle key silently drops a correctness
check), and every gate entry must be documented in SURVEY §2."""

import __spark_entry__ as entry


def test_oracle_keys_subset_of_queries():
    qs = set(entry.queries().keys())
    os_ = set(entry.oracle_sql().keys())
    dangling = os_ - qs
    assert not dangling, f"oracle entries without a query: {sorted(dangling)}"


def test_no_empty_oracle_sql():
    for k, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), k


def test_pytest_only_entries_are_the_known_set():
    # entries WITHOUT an oracle are the weaker rows-only checks; keep
    # the list explicit so a forgotten oracle is a loud diff, not drift
    qs = set(entry.queries().keys())
    os_ = set(entry.oracle_sql().keys())
    assert qs - os_ == set(), (
        "queries without an oracle (add one, or move the check here "
        f"with a written reason): {sorted(qs - os_)}")
