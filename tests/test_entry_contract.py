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


def test_gate_front_window_carries_the_core_operators():
    # the driver evaluates exactly the FIRST 50 queries() entries; the
    # window must carry the SURVEY §2 core + BM25/search + pipeline ops
    keys = list(entry.queries().keys())[:50]
    for must in ("tsp_query_matches", "ts_semantic_headline", "bm25_topk",
                 "bm25_topk_indexed", "search_batch",
                 "bm25_phrase_filtered", "dedup_minhash_lsh",
                 "decontaminate_report", "prepare_corpus",
                 "source_mix_weights", "ts_fast_headline",
                 "ts_fast_headline_cover_density"):
        assert must in keys, f"{must} fell out of the driver gate window"


def test_check_oracle_forced_mismatch_dumps_first_diff():
    """Forensics contract (round-5): the gate-replica's comparison record
    carries the concrete diverging rows on hash mismatch, so a
    driver-only flake is diagnosable from the committed artifact."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "check_oracle", os.path.join(os.path.dirname(__file__),
                                     "..", "scripts", "check_oracle.py"))
    co = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(co)

    # value mismatch: one differing cell -> kind=values + both rows
    r = co.compare_result(["a", "b"], [(1, 2), (3, 4)],
                          ["a", "b"], [(1, 2), (3, 5)])
    assert not r["hash_match"] and r["rows_match"] and r["schema_match"]
    fd = r["first_diff"]
    assert fd["kind"] == "values" and fd["n_differing"] == 1
    assert fd["spark"] == ["3", "4"] and fd["oracle"] == ["3", "5"]

    # row-count mismatch -> kind=rows + the one-sided samples
    r = co.compare_result(["a"], [(1,)], ["a"], [(1,), (2,)])
    assert not r["rows_match"]
    assert r["first_diff"]["kind"] == "rows"
    assert r["first_diff"]["oracle_only"] == [["2"]]

    # schema mismatch -> kind=columns with both column lists
    r = co.compare_result(["a"], [(1,)], ["b"], [(1,)])
    assert not r["schema_match"]
    assert r["first_diff"] == {"kind": "columns",
                               "spark": ["a"], "oracle": ["b"]}

    # green entry -> no forensics key at all
    r = co.compare_result(["a"], [(1,)], ["a"], [(1,)])
    assert r["hash_match"] and "first_diff" not in r
