import pytest

from pg_ts_semantic_headline_spark.plans.query_compiler import (
    ts_rewrite,
    ts_rewrite_rules_df,
    get_default_text_search_config,
    phraseto_tspquery,
    set_default_text_search_config,
    to_tspquery,
    websearch_to_tspquery,
)


def test_default_config_arity_overloads():
    """The reference's arity-reduced overloads infer the session default
    config (to_tspquery.sql:36-45, ts_semantic_headline.sql:77-90)."""
    assert get_default_text_search_config() == "english"
    one = to_tspquery("running & jumps")
    two = to_tspquery("english", "running & jumps")
    assert one.phrases == two.phrases and one.config == "english"
    p1 = phraseto_tspquery("the running dogs")
    p2 = phraseto_tspquery("english", "the running dogs")
    assert p1.phrases == p2.phrases

    set_default_text_search_config("simple")
    try:
        assert to_tspquery("running").phrases[0].items == (("running", 1),)
    finally:
        set_default_text_search_config("english")


class TestToTspquery:
    def test_distance_ops_and_or(self):
        q = to_tspquery("english", "best<2>time|worst<2>time")
        assert len(q.phrases) == 2
        assert q.phrases[0].items == (("best", 1), ("time", 3))
        assert q.phrases[1].items == (("worst", 1), ("time", 3))
        assert q.root.op == "or"

    def test_stemming_applied(self):
        q = to_tspquery("english", "running & jumps")
        assert q.phrases[0].items == (("run", 1),)
        assert q.phrases[1].items == (("jump", 1),)

    def test_stopword_dropped_from_boolean(self):
        q = to_tspquery("english", "the & fat & rats")
        assert [p.items for p in q.phrases] == [(("fat", 1),), (("rat", 1),)]

    def test_stopword_in_phrase_keeps_gap(self):
        q = to_tspquery("english", "fat<->the<->rat")
        assert q.phrases[0].items == (("fat", 1), ("rat", 3))

    def test_negation_dropped_from_highlight_phrases(self):
        q = to_tspquery("english", "cat & !dog")
        assert [p.items for p in q.phrases] == [(("cat", 1),)]
        assert q.root.op == "and"

    def test_intraword_delimiter_becomes_distance_op(self):
        q = to_tspquery("english", "child-bearing")
        assert q.phrases[0].items == (("child", 1), ("bear", 2))

    def test_duplicate_phrases_deduped(self):
        q = to_tspquery("english", "cat|cat")
        assert len(q.phrases) == 1

    def test_render(self):
        q = to_tspquery("english", "best<2>time")
        assert q.phrases[0].render() == "'best' <2> 'time'"
        q2 = to_tspquery("english", "fat<->rat")
        assert q2.phrases[0].render() == "'fat' <-> 'rat'"


class TestPhrasetoTspquery:
    def test_plain_phrase(self):
        q = phraseto_tspquery("english", "decide negatively")
        assert q.phrases[0].items == (("decid", 1), ("negat", 2))

    def test_stopwords_leave_gaps(self):
        q = phraseto_tspquery("english", "fortune, through the kingdom")
        assert q.phrases[0].items == (("fortun", 1), ("kingdom", 4))

    def test_leading_stopword_normalized(self):
        q = phraseto_tspquery("english", "the fat rat")
        assert q.phrases[0].items == (("fat", 1), ("rat", 2))

    def test_long_phrase_gaps(self):
        q = phraseto_tspquery("english", "gallop came fast and furiously up the hill")
        # gallop(1) came(2) fast(3) [and] furiously(5) [up the] hill(8)
        assert q.phrases[0].items == (
            ("gallop", 1), ("came", 2), ("fast", 3), ("furious", 5), ("hill", 8))

    def test_hyphenated_term(self):
        q = phraseto_tspquery("english", "child-bearing")
        assert q.phrases[0].items == (("child", 1), ("bear", 2))

    def test_german_phrase(self):
        q = phraseto_tspquery("german", "bleibenden Gäste zecht")
        assert q.phrases[0].items == (("bleibend", 1), ("gast", 2), ("zecht", 3))

    def test_all_stopwords_empty(self):
        q = phraseto_tspquery("english", "the of and")
        assert q.phrases == () and q.root is None

    def test_phrase_table_rows(self):
        q = to_tspquery("english", "best<2>time|worst<2>time")
        rows = q.phrase_table()
        assert (0, "best", 1, 2, 2, "'best' <2> 'time'") in rows
        assert (1, "time", 3, 2, 2, "'worst' <2> 'time'") in rows
        assert q.lexemes == ("best", "time", "worst")


def _render(n):
    if n is None:
        return "<empty>"
    if n.op == "phrase":
        return n.phrase.render()
    if n.op == "not":
        return "!(" + _render(n.children[0]) + ")"
    sep = " & " if n.op == "and" else " | "
    return "(" + sep.join(_render(c) for c in n.children) + ")"


class TestWebsearchToTspquery:
    """PG doc examples (§12.3.2 websearch_to_tsquery) plus the
    never-raises contract."""

    def test_plain_words_and(self):
        assert _render(websearch_to_tspquery(
            "english", "The fat rats").root) == "('fat' & 'rat')"

    def test_quoted_phrase_and_negation(self):
        q = websearch_to_tspquery("english", '"supernovae stars" -crab')
        assert _render(q.root) == "('supernova' <-> 'star' & !('crab'))"
        # negated branch never reaches highlighting
        assert [p.render() for p in q.phrases] == ["'supernova' <-> 'star'"]

    def test_or_between_phrases(self):
        q = websearch_to_tspquery("english", '"sad cat" or "fat rat"')
        assert _render(q.root) == "('sad' <-> 'cat' | 'fat' <-> 'rat')"

    def test_negated_phrase(self):
        q = websearch_to_tspquery("english", 'signal -"segmentation fault"')
        assert _render(q.root) == "('signal' & !('segment' <-> 'fault'))"

    def test_garbage_never_raises(self):
        q = websearch_to_tspquery("english", '""" )( dummy \\ query <->')
        assert _render(q.root) == "('dummi' & 'queri')"

    def test_operator_chars_are_plain_text(self):
        q = websearch_to_tspquery("english", "cat & dog | !rat (bat)")
        assert _render(q.root) == "('cat' & 'dog' & 'rat' & 'bat')"

    def test_dangling_or_dropped(self):
        assert _render(websearch_to_tspquery("english", "fat or").root) == "'fat'"
        assert _render(websearch_to_tspquery("english", "or cat").root) == "'cat'"
        assert websearch_to_tspquery("english", "or or or").root is None

    def test_negation_first_alternative(self):
        assert _render(websearch_to_tspquery(
            "simple", "-cat or dog").root) == "(!('cat') | 'dog')"

    def test_stopword_units_vanish(self):
        assert websearch_to_tspquery("english", "-the").root is None
        assert _render(websearch_to_tspquery(
            "english", "the fat or the").root) == "'fat'"

    def test_stopword_gaps_in_quoted_phrase(self):
        q = websearch_to_tspquery("english", '"fortune, through the kingdom"')
        assert q.phrases[0].items == (("fortun", 1), ("kingdom", 4))

    def test_intraword_delimiter_repo_convention(self):
        # documented deviation: repo's to_tspquery intra-word convention
        q = websearch_to_tspquery("english", "child-bearing rats")
        assert _render(q.root) == "('child' <-> 'bear' & 'rat')"

    def test_unclosed_quote_falls_back_to_words(self):
        q = websearch_to_tspquery("english", 'sad "cat dog')
        assert _render(q.root) == "('sad' & 'cat' & 'dog')"

    def test_arity_one_uses_session_default(self):
        assert get_default_text_search_config() == "english"
        assert _render(websearch_to_tspquery("The fat rats").root) \
            == "('fat' & 'rat')"

    def test_lexemes_exclude_negated(self):
        q = websearch_to_tspquery("english", '"fat rat" -cat or dog')
        assert q.lexemes == ("fat", "rat", "dog")


class TestTsRewrite:
    """PG `ts_rewrite` semantics (pg docs §12.4.2.1) on compiled trees."""

    def _q(self, s):
        return to_tspquery("simple", s)

    def _key(self, q):
        from pg_ts_semantic_headline_spark.plans.query_compiler import \
            _canon_key
        return None if q.root is None else _canon_key(q.root)

    def test_single_term_substitution(self):
        # PG: ts_rewrite('a & b', 'a', 'foo|bar') = 'b & ( foo | bar )'
        out = ts_rewrite(self._q("a & b"),
                         [(self._q("a"), self._q("foo|bar"))])
        assert self._key(out) == self._key(self._q("b & (foo|bar)"))
        # phrase list refreshed for highlighting
        assert {p.items for p in out.phrases} == {
            (("b", 1),), (("foo", 1),), (("bar", 1),)}

    def test_operand_order_ignored(self):
        out = ts_rewrite(self._q("b | a"),
                         [(self._q("a | b"), self._q("x"))])
        assert self._key(out) == self._key(self._q("x"))

    def test_subset_match_in_group(self):
        # 'a & b' rewrites inside 'b & a & c'
        out = ts_rewrite(self._q("b & a & c"),
                         [(self._q("a & b"), self._q("x"))])
        assert self._key(out) == self._key(self._q("x & c"))

    def test_nested_same_op_flattening(self):
        out = ts_rewrite(self._q("(a & b) & c"),
                         [(self._q("b & c"), self._q("x"))])
        assert self._key(out) == self._key(self._q("a & x"))

    def test_rewrite_under_negation(self):
        out = ts_rewrite(self._q("!a & b"), [(self._q("a"), self._q("c"))])
        assert self._key(out) == self._key(self._q("!c & b"))

    def test_empty_substitute_deletes(self):
        from pg_ts_semantic_headline_spark.plans.query_compiler import \
            empty_tspquery
        out = ts_rewrite(self._q("a & b"),
                         [(self._q("b"), empty_tspquery("simple"))])
        assert self._key(out) == self._key(self._q("a"))
        out2 = ts_rewrite(self._q("a"),
                          [(self._q("a"), empty_tspquery("simple"))])
        assert out2.root is None and out2.phrases == ()

    def test_phrases_are_atomic(self):
        # a sub-phrase of a longer phrase never matches
        out = ts_rewrite(self._q("x <-> y <-> z"),
                         [(self._q("x <-> y"), self._q("q"))])
        assert self._key(out) == self._key(self._q("x <-> y <-> z"))
        # but an exact phrase match does
        out2 = ts_rewrite(self._q("(x <-> y) & w"),
                          [(self._q("x <-> y"), self._q("q"))])
        assert self._key(out2) == self._key(self._q("q & w"))

    def test_self_referential_rule_terminates(self):
        # 'a' -> 'a | b' converges because duplicate branches collapse
        out = ts_rewrite(self._q("a & c"),
                         [(self._q("a"), self._q("a | b"))])
        assert self._key(out) == self._key(self._q("(a | b) & c"))

    def test_rules_apply_in_order(self):
        out = ts_rewrite(self._q("a"), [
            (self._q("a"), self._q("b")),
            (self._q("b"), self._q("c")),
        ])
        assert self._key(out) == self._key(self._q("c"))

    def test_empty_target_raises(self):
        import pytest
        from pg_ts_semantic_headline_spark.plans.query_compiler import \
            empty_tspquery
        with pytest.raises(ValueError):
            ts_rewrite(self._q("a"), [(empty_tspquery("simple"),
                                       self._q("b"))])

    def test_rules_df_form(self, spark):
        rules = spark.createDataFrame(
            [("sort", "sort | quicksort"), ("merge", "blend")],
            "target string, substitute string")
        out = ts_rewrite_rules_df(self._q("merge & sort"), rules)
        assert self._key(out) == \
            self._key(self._q("blend & (sort | quicksort)"))

    def test_rules_df_cap(self, spark):
        import pytest
        rules = spark.createDataFrame(
            [(f"t{i}", "x") for i in range(5)],
            "target string, substitute string")
        with pytest.raises(ValueError, match="max_rules"):
            ts_rewrite_rules_df(self._q("a"), rules, max_rules=3)


class TestTsqueryUtilities:
    """PG tsquery utility parity: numnode / querytree / tsquery_phrase
    (PG docs §9.13 examples pinned)."""

    def test_numnode_pg_examples(self):
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            empty_tspquery, numnode, to_tspquery)
        q = lambda s: to_tspquery("simple", s)
        assert numnode(q("(fat & rat) | cat")) == 5
        assert numnode(q("fat & rat")) == 3
        assert numnode(q("foo & !bar")) == 4
        assert numnode(q("cat")) == 1
        assert numnode(q("a <-> b")) == 3
        assert numnode(q("a <2> b <-> c")) == 5
        assert numnode(empty_tspquery("simple")) == 0

    def test_querytree_pg_examples(self):
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            querytree, to_tspquery)
        q = lambda s: to_tspquery("simple", s)
        assert querytree(q("foo & !bar")) == "'foo'"
        assert querytree(q("!defined")) == "T"
        assert querytree(q("a & b")) == "'a' & 'b'"
        # OR with a negated arm cannot narrow an index scan -> T
        assert querytree(q("a | !b")) == "T"
        assert querytree(q("(a | !b) & c")) == "'c'"
        assert querytree(q("a <-> b")) == "'a' <-> 'b'"

    def test_render_roundtrip_through_compiler(self):
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            render_tspquery, to_tspquery)
        for s in ("a & (b | !c)", "x <2> y", "!(a | b) & c"):
            q1 = to_tspquery("simple", s)
            rendered = render_tspquery(q1.root)
            q2 = to_tspquery("simple", rendered)
            assert render_tspquery(q2.root) == rendered, s

    def test_tsquery_phrase(self):
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            TSQueryParseError, phraseto_tspquery, render_tspquery,
            to_tspquery, tsquery_phrase)
        fat = to_tspquery("simple", "fat")
        cat = to_tspquery("simple", "cat")
        assert render_tspquery(tsquery_phrase(fat, cat).root) \
            == "'fat' <-> 'cat'"
        assert render_tspquery(tsquery_phrase(fat, cat, 10).root) \
            == "'fat' <10> 'cat'"
        # multi-lexeme left operand: distance accumulates from its end
        ab = phraseto_tspquery("simple", "alpha beta")
        out = tsquery_phrase(ab, cat, 2)
        assert render_tspquery(out.root) \
            == "'alpha' <-> 'beta' <2> 'cat'"
        with pytest.raises(TSQueryParseError):
            tsquery_phrase(to_tspquery("simple", "a & b"), cat)
        with pytest.raises(TSQueryParseError):
            tsquery_phrase(fat, to_tspquery("english", "cat"))
        with pytest.raises(ValueError):
            tsquery_phrase(fat, cat, -1)

    def test_tsquery_phrase_is_searchable(self, spark):
        # the composed phrase drives the ordinary phrase-match plan
        from pg_ts_semantic_headline_spark.plans.analyze import with_analysis
        from pg_ts_semantic_headline_spark.plans.matches import (
            tsp_query_matches)
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            to_tspquery, tsquery_phrase)
        docs = with_analysis(spark.createDataFrame(
            [(1, "the fat black cat sat"), (2, "fat dogs and a cat"),
             (3, "cat fat")], ["doc_id", "content"]), "content", "simple")
        # 'fat <2> cat': cat exactly two positions after fat
        q = tsquery_phrase(to_tspquery("simple", "fat"),
                           to_tspquery("simple", "cat"), 2)
        got = {r["doc_id"]
               for r in tsp_query_matches(docs, q, match_limit=10)
               .select("doc_id").distinct().collect()}
        assert got == {1}


class TestTsqueryContains:
    """tsquery @> in the boolean-aware (ts_rewrite-consistent) reading."""

    def _q(self, s):
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            to_tspquery)
        return to_tspquery("simple", s)

    def test_containment_cases(self):
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            empty_tspquery, tsquery_contains)
        q = self._q
        assert tsquery_contains(q("a & b & c"), q("b & a"))      # subset
        assert tsquery_contains(q("a & b"), q("a"))              # operand
        assert tsquery_contains(q("!(a & b) | c"), q("a & b"))   # under !
        assert tsquery_contains(q("a & a"), q("a"))              # dedupe
        assert not tsquery_contains(q("a | b"), q("a & b"))      # op differs
        assert not tsquery_contains(q("a & b"), q("a & b & c"))  # superset
        # phrases are atomic, like ts_rewrite
        assert not tsquery_contains(q("a <-> b <-> c"), q("a <-> b"))
        assert tsquery_contains(q("(a <-> b) | c"), q("a <-> b"))
        # empty-query edges
        assert tsquery_contains(q("a"), empty_tspquery("simple"))
        assert not tsquery_contains(empty_tspquery("simple"), q("a"))

    def test_contains_iff_rewrite_fires(self):
        # the documented contract: containment <=> ts_rewrite changes
        # the query (for a rule whose substitute differs from its target)
        import itertools
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            render_tspquery, ts_rewrite, tsquery_contains)
        q = self._q
        shapes = ["a", "a & b", "a | b", "b & a & c", "!(a & b)",
                  "a <-> b", "(a | b) & c", "a & (b | c)"]
        target = q("a & b")
        sub = q("zzz")
        for s in shapes:
            query = q(s)
            fired = (render_tspquery(ts_rewrite(query, [(target, sub)]).root)
                     != render_tspquery(query.root))
            assert tsquery_contains(query, target) == fired, s


class TestPlaintoTspquery:
    """PG doc examples (§12.3.2 plainto_tsquery): words AND-ed, operators
    are punctuation, never raises."""

    def test_pg_doc_example(self):
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            plainto_tspquery)
        assert _render(plainto_tspquery(
            "english", "The Fat Rats").root) == "('fat' & 'rat')"

    def test_operators_are_punctuation(self):
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            plainto_tspquery)
        q = plainto_tspquery("english", "The Fat & Rats:C")
        assert _render(q.root) == "('fat' & 'rat' & 'c')"

    def test_all_stopwords_empty(self):
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            plainto_tspquery)
        q = plainto_tspquery("english", "the and of")
        assert q.root is None and q.phrases == ()

    def test_single_word(self):
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            plainto_tspquery)
        q = plainto_tspquery("simple", "Window")
        assert _render(q.root) == "'window'"

    def test_duplicates_kept_in_tree(self):
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            plainto_tspquery)
        q = plainto_tspquery("simple", "sort the sort")
        assert _render(q.root) == "('sort' & 'the' & 'sort')"
        # phrases dedup for highlighting like every other constructor
        assert len(q.phrases) == 2

    def test_arity_one_uses_default_config(self):
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            get_default_text_search_config, plainto_tspquery,
            set_default_text_search_config)
        prev = get_default_text_search_config()
        try:
            set_default_text_search_config("simple")
            assert _render(plainto_tspquery(
                "The Rats").root) == "('the' & 'rats')"
        finally:
            set_default_text_search_config(prev)
