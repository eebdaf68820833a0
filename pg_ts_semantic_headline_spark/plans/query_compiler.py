"""Driver-side TSQuery compiler.

Queries are tiny, so everything here runs on the driver and the result is
broadcast into distributed plans. This replaces the reference's query-side
function stack:

- `to_tspquery`          (/root/reference/sql/to_tspquery.sql:19-33): unaccent,
  then twice rewrite intra-word delimiter characters into a `<1>` distance
  operator so 'seek-ing' queries match the split haystack.
- `phraseto_tspquery`    (/root/reference/sql/phraseto_tspquery.sql:17-25):
  canonicalize a human phrase with the *same* pipeline as documents, emit a
  distance-chained phrase (stopwords dropped, positional gaps preserved).
- `tsquery_to_tsvector` / `tsquery_to_table`
  (/root/reference/sql/tsquery_to_tsvector.sql:21-54, tsquery_to_table.sql:18-33):
  flatten the boolean query into a list of positional phrase patterns
  (negated terms dropped), each exploded to (lexeme, relative position).

The boolean structure (AND/OR/NOT over phrases) is *kept* for document-level
match filtering, while highlighting treats all positive phrases as a
disjunction, exactly like the reference.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..functions.lexize import analyze_text_simple, lexize_word
from ..functions.unaccent import unaccent

# PG: '(\w)([^[:alnum:]&^<>|\s]+)(\w)' — [:alnum:] excludes underscore, so
# '_' is a delimiter; \w includes it, hence the explicit alternation.
_RE_INTRAWORD_DELIM = re.compile(r"(\w)((?:[^\w&^<>|!()'\s]|_)+)(\w)")
_RE_DIST_OP = re.compile(r"<(\d+)>|<->")
_RE_CAMEL_Q1 = re.compile(r"(?<=[a-z0-9])(?=[A-Z])")
_RE_CAMEL_Q2 = re.compile(r"(?<=[A-Z])(?=[A-Z][a-z])")
_RE_TOKEN = re.compile(
    r"\s*(?:(?P<open>\()|(?P<close>\))|(?P<and>&)|(?P<or>\|)|(?P<not>!)"
    r"|(?P<dist><(?:\d+|-)>)|(?P<quoted>'(?:[^']|'')*')|(?P<word>[^\s&|!()<>']+))"
)


@dataclass(frozen=True)
class Phrase:
    """A positional phrase pattern: lexemes at 1-based relative positions.

    `items` is a tuple of (lexeme, position); positions preserve stopword
    gaps ('fortune, through the kingdom' → fortune:1 kingdom:4).

    `prefix_slots` marks positions whose lexeme is a tsquery PREFIX
    (`'spar':*`): the lexeme matches every dictionary term it prefixes.
    Prefix phrases cannot be matched directly — expand them against an
    index dictionary first (`plans.search.expand_query_prefixes`), which
    rewrites the query into a plain OR over concrete phrases.
    """
    items: tuple[tuple[str, int], ...]
    prefix_slots: tuple[int, ...] = ()

    @property
    def length(self) -> int:
        return len(self.items)

    @property
    def span(self) -> int:
        if not self.items:
            return 0
        ps = [p for _, p in self.items]
        return max(ps) - min(ps)

    def render(self) -> str:
        if not self.items:
            return ""
        star = set(self.prefix_slots)

        def term(lex: str, pos: int) -> str:
            return f"'{lex}':*" if pos in star else f"'{lex}'"

        parts = [term(self.items[0][0], self.items[0][1])]
        for (_, p0), (lex, p1) in zip(self.items, self.items[1:]):
            gap = p1 - p0
            parts.append("<->" if gap == 1 else f"<{gap}>")
            parts.append(term(lex, p1))
        return " ".join(parts)


@dataclass(frozen=True)
class Node:
    """Boolean AST node: op in {'phrase','and','or','not'}."""
    op: str
    children: tuple = field(default_factory=tuple)
    phrase: Phrase | None = None


@dataclass(frozen=True)
class CompiledQuery:
    config: str
    raw: str
    root: Node | None           # boolean tree (None = empty query)
    phrases: tuple[Phrase, ...]  # DISTINCT positive phrases, for highlighting

    @property
    def lexemes(self) -> tuple[str, ...]:
        """All positive lexemes (for posting pruning)."""
        seen: dict[str, None] = {}
        for ph in self.phrases:
            for lex, _ in ph.items:
                seen.setdefault(lex)
        return tuple(seen)

    @property
    def has_prefixes(self) -> bool:
        """True when any phrase — incl. inside negated branches, which
        `phrases` drops — carries a `:*` prefix slot. Such a query must
        be expanded against an index dictionary before matching
        (`plans.search.expand_query_prefixes`)."""
        def walk(node) -> bool:
            if node is None:
                return False
            if node.op == "phrase":
                return bool(node.phrase.prefix_slots)
            return any(walk(c) for c in node.children)
        return walk(self.root)

    def phrase_table(self) -> list[tuple[int, str, int, int, int, str]]:
        """Rows (phrase_id, lexeme, rel_pos, length, span, phrase_query) —
        the broadcastable analog of TSQUERY_TO_TABLE."""
        rows = []
        for pid, ph in enumerate(self.phrases):
            rendered = ph.render()
            for lex, pos in ph.items:
                rows.append((pid, lex, pos, ph.length, ph.span, rendered))
        return rows


class TSQueryParseError(ValueError):
    pass


def _tokenize_query(text: str):
    pos, n = 0, len(text)
    while pos < n:
        m = _RE_TOKEN.match(text, pos)
        if not m or m.end() == pos:
            rest = text[pos:].strip()
            if not rest:
                return
            raise TSQueryParseError(f"cannot parse tsquery near {rest[:20]!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "quoted":
            val = val[1:-1].replace("''", "'")
        yield kind, val


class _Parser:
    """Recursive-descent parser for tsquery syntax.

    Grammar:  or_expr  := and_expr ('|' and_expr)*
              and_expr := seq_expr ('&' seq_expr)*
              seq_expr := unary (('<->'|'<n>') unary)*
              unary    := '!' unary | '(' or_expr ')' | term
    """

    def __init__(self, tokens, config: str):
        self.toks = list(tokens)
        self.i = 0
        self.config = config

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _unexpected(self, kind, val):
        if kind is None:
            return TSQueryParseError("unexpected end of tsquery")
        return TSQueryParseError(f"unexpected token {kind}:{val!r}")

    def parse(self):
        node = self._or()
        if self.i < len(self.toks):
            raise self._unexpected(*self.toks[self.i])
        return node

    def _or(self):
        parts = [self._and()]
        while self._peek()[0] == "or":
            self._next()
            parts.append(self._and())
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else ("or", parts)

    def _and(self):
        parts = [self._seq()]
        while self._peek()[0] == "and":
            self._next()
            parts.append(self._seq())
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else ("and", parts)

    def _seq(self):
        # sequence of terms joined by distance operators → one phrase
        first = self._unary()
        items = [(first, 0)]  # (node, gap-from-previous)
        while self._peek()[0] == "dist":
            _, d = self._next()
            gap = 1 if d == "<->" else int(d[1:-1])
            items.append((self._unary(), gap))
        if len(items) == 1:
            return first
        return ("seq", items)

    def _unary(self):
        kind, val = self._peek()
        if kind == "not":
            self._next()
            return ("not", self._unary())
        if kind == "open":
            self._next()
            node = self._or()
            if self._next()[0] != "close":
                raise TSQueryParseError("unbalanced parenthesis")
            return node
        if kind in ("word", "quoted"):
            self._next()
            # PG's quoted-prefix form tokenizes the label separately
            # ("'spar':*" → quoted + word ":*"): re-attach it
            nkind, nval = self._peek()
            if nkind == "word" and re.fullmatch(r":\*?[A-Da-d]*", nval):
                self._next()
                val += nval
            return ("term", val)
        raise self._unexpected(kind, val)


# tsquery label suffix on a term: ':*' (prefix match), ':AB..' (weight
# restriction), or ':*AB..' (both). Weights have no engine analog (no
# per-position labels by design — see README "Porting setweight") and
# raise rather than silently changing the query's meaning. NB a
# mid-word ':' between word chars ('cat:A') never reaches this check:
# the reference's own intra-word-delimiter rule (to_tspquery.sql:26-27)
# turns it into a <1> phrase link first, and we mirror that; weights
# raise in label position ("'cat':A", trailing ':A' after a quoted
# term) where the reference regex does not rewrite them.
_RE_LABEL_SUFFIX = re.compile(r"^(.*?):(\*?)([A-Da-d]*)$")


def _split_prefix_marker(word: str) -> tuple[str, bool]:
    """(bare_word, is_prefix) from a raw term token; raises on weight
    labels and on a bare marker with no word in front of it."""
    m = _RE_LABEL_SUFFIX.match(word)
    if not m or (not m.group(2) and not m.group(3)):
        return word, False
    base, star, weights = m.groups()
    if weights:
        raise TSQueryParseError(
            f"weight labels in tsquery term {word!r} are not supported: "
            "the index stores no per-position labels — use the fielded "
            "index (build_fielded_index/bm25f_topk) for field-restricted "
            "search; see README 'Porting setweight from PG'")
    if not base:
        raise TSQueryParseError(f"dangling prefix marker {word!r}")
    return base, bool(star)


def _lexize_tree(node, config: str):
    """Lexize raw terms; stopwords vanish but keep positional gaps in
    sequences (PG: 'a <-> the <-> b' → 'a <2> b'). A ':*' suffix marks
    the slot as a prefix; like PG, the word is still lexized first
    (to_tsquery('english','running:*') → 'run':*), and a prefix-marked
    stopword vanishes like any stopword."""
    if node is None:
        return None
    op = node[0]
    if op == "term":
        word, star = _split_prefix_marker(node[1])
        lex = lexize_word(word, config)
        if lex is None:
            return None
        return Node("phrase", phrase=Phrase(((lex, 1),),
                                            prefix_slots=(1,) if star else ()))
    if op == "not":
        child = _lexize_tree(node[1], config)
        return Node("not", (child,)) if child is not None else None
    if op == "seq":
        pos, items, stars = 0, [], []
        for idx, (child, gap) in enumerate(node[1]):
            pos = 1 if idx == 0 else pos + gap
            lex = star = None
            if child[0] == "term":
                word, star = _split_prefix_marker(child[1])
                lex = lexize_word(word, config)
            elif child[0] == "not":
                lex = None  # negation inside phrase: treated as gap
            else:
                raise TSQueryParseError("nested groups inside phrases unsupported")
            if lex is not None:
                items.append((lex, pos))
                if star:
                    stars.append(pos)
        if not items:
            return None
        base = min(p for _, p in items)
        norm = tuple((lx, p - base + 1) for lx, p in items)
        slots = tuple(p - base + 1 for p in stars)
        return Node("phrase", phrase=Phrase(norm, prefix_slots=slots))
    # and / or
    children = [_lexize_tree(c, config) for c in node[1]]
    children = [c for c in children if c is not None]
    if not children:
        return None
    if len(children) == 1:
        return children[0]
    return Node(op, tuple(children))


def _collect_positive_phrases(node: Node | None) -> list[Phrase]:
    """querytree() analog: drop negated branches, flatten to phrase list."""
    if node is None:
        return []
    if node.op == "phrase":
        return [node.phrase]
    if node.op == "not":
        return []
    out: list[Phrase] = []
    for c in node.children:
        out.extend(_collect_positive_phrases(c))
    return out


def _dedupe(phrases: list[Phrase]) -> tuple[Phrase, ...]:
    seen, out = set(), []
    for ph in phrases:
        key = (ph.items, ph.prefix_slots)
        if key not in seen:
            seen.add(key)
            out.append(ph)
    return tuple(out)


# Session default config — the engine's analog of PostgreSQL's
# default_text_search_config GUC, backing the reference's arity-reduced
# overloads (/root/reference/sql/to_tspquery.sql:36-45,
# ts_fast_headline.sql:75-88): call to_tspquery("term") / a one-arg
# phraseto_tspquery and the session default applies.
_DEFAULT_CONFIG = "english"


def set_default_text_search_config(config: str) -> None:
    global _DEFAULT_CONFIG
    _DEFAULT_CONFIG = config


def get_default_text_search_config() -> str:
    return _DEFAULT_CONFIG


def to_tspquery(config: str, query_string: str | None = None) -> CompiledQuery:
    """Compile tsquery-syntax text ('best<2>time|worst<2>time'). With one
    argument, the session default config applies (the reference's arity-2
    overload, to_tspquery.sql:36-45)."""
    if query_string is None:
        config, query_string = _DEFAULT_CONFIG, config
    s = " " + unaccent(query_string) + " "
    # twice, to catch terms with multiple delimited substrings (seek-ing-ly)
    s = _RE_INTRAWORD_DELIM.sub(r"\1\2<1>\3", s)
    s = _RE_INTRAWORD_DELIM.sub(r"\1\2<1>\3", s)
    from ..functions.lexize import base_config
    if base_config(config) == "code":
        # camelCase boundaries become <1> phrase links, the query-side
        # mirror of the analyzer's camel_mark split
        s = _RE_CAMEL_Q1.sub("<1>", s)
        s = _RE_CAMEL_Q2.sub("<1>", s)
    raw_tree = _Parser(_tokenize_query(s), config).parse()
    root = _lexize_tree(raw_tree, config)
    phrases = _dedupe(_collect_positive_phrases(root))
    return CompiledQuery(config, query_string, root, phrases)


def _phrase_node(text: str, config: str) -> Node | None:
    """Analyze free text into one positional-phrase Node (None when every
    word lexizes away) — the shared core of phraseto/websearch phrases."""
    lexemes = analyze_text_simple(text, config)
    items = tuple(
        (lex, pos) for pos, lex in enumerate(lexemes, start=1) if lex is not None
    )
    if not items:
        return None
    base = min(p for _, p in items)
    return Node("phrase", phrase=Phrase(tuple((lx, p - base + 1)
                                              for lx, p in items)))


def plainto_tspquery(config: str, text: str | None = None) -> CompiledQuery:
    """PostgreSQL's `plainto_tsquery`: parse and normalize the text, then
    AND every surviving lexeme — PG docs §12.3.2 describe it as phraseto
    with `&` inserted between words instead of `<->`, and that is exactly
    how it is built here: the same whole-text analyzer pass as
    `phraseto_tspquery` (so punctuation and stopwords behave identically),
    each surviving lexeme becoming a single-lexeme phrase under one AND.
    `plainto_tsquery('english', 'The Fat Rats')` → `fat & rat`.
    Operators in the input (`& | ! <->`) are plain punctuation — this
    function never raises. Duplicated words stay duplicated in the tree
    (PG keeps `sort & sort`); `phrases` dedups for highlighting like every
    other constructor. Deviation (repo-wide analyzer discipline): a
    compound like `child-bearing` contributes its split parts as
    independent AND terms, where PG would also AND the whole compound.
    With one argument, the session default config applies."""
    if text is None:
        config, text = _DEFAULT_CONFIG, config
    lexemes = analyze_text_simple(unaccent(text), config)
    nodes = tuple(Node("phrase", phrase=Phrase(((lx, 1),)))
                  for lx in lexemes if lx is not None)
    root = (None if not nodes
            else nodes[0] if len(nodes) == 1 else Node("and", nodes))
    phrases = _dedupe(_collect_positive_phrases(root))
    return CompiledQuery(config, text, root, phrases)


def websearch_to_tspquery(config: str, text: str | None = None) -> CompiledQuery:
    """PostgreSQL's `websearch_to_tsquery`: the end-user search-box syntax
    (pg docs §12.3.2; the reference inherits it from core PG — it has no
    file of its own, so this is the engine's arity/semantics parity with
    `websearch_to_tsquery(regconfig, text)`):

    - unquoted words are AND-ed;
    - `"quoted text"` becomes a positional phrase (stopwords drop but
      keep their gaps, exactly like `phraseto_tspquery`);
    - `-word` / `-"phrase"` negates the unit that follows (no space);
    - the bare word `or` (any case) is the OR operator between AND-groups;
    - every other character is plain text: `& | ! ( ) < >` have no special
      meaning, and the function NEVER raises a parse error.

    Deviations from PG, both following this repo's established analyzer:
    an unquoted compound like `child-bearing` becomes the `<1>`-gapped
    phrase `to_tspquery` produces (PG emits compound+parts), and an `or`
    with a missing operand is dropped rather than literalized.
    With one argument, the session default config applies."""
    if text is None:
        config, text = _DEFAULT_CONFIG, config
    s = unaccent(text)
    units: list = []          # Node|('OR',)|None entries, in reading order
    i, n = 0, len(s)
    while i < n:
        if s[i].isspace():
            i += 1
            continue
        neg = False
        if s[i] == "-":
            i += 1
            while i < n and s[i] == "-":
                i += 1
            if i >= n or s[i].isspace():
                continue              # bare '-' is punctuation: ignored
            neg = True
        if s[i] == '"':
            j = s.find('"', i + 1)
            if j == -1:
                # unclosed quote: PG treats the '"' as punctuation and the
                # rest as plain unquoted words ('""" dummy query' → AND)
                i += 1
                continue
            seg, i = s[i + 1:j], j + 1
            node = _phrase_node(seg, config)
        else:
            j = i
            while j < n and not s[j].isspace() and s[j] != '"':
                j += 1
            word, i = s[i:j], j
            if not neg and word.lower() == "or":
                units.append(("OR",))
                continue
            node = _phrase_node(word, config)
        if node is not None and neg:
            node = Node("not", (node,))
        units.append(node)            # None (all-stopword unit) kept as a
        #                               no-op so '-the' vanishes silently
    # split on OR markers; AND within a group, OR across non-empty groups
    groups: list[list[Node]] = [[]]
    for u in units:
        if u == ("OR",):
            groups.append([])
        elif u is not None:
            groups[-1].append(u)
    alts = [g[0] if len(g) == 1 else Node("and", tuple(g))
            for g in groups if g]
    root = (None if not alts
            else alts[0] if len(alts) == 1 else Node("or", tuple(alts)))
    phrases = _dedupe(_collect_positive_phrases(root))
    return CompiledQuery(config, text, root, phrases)


def _canon_key(node: Node) -> tuple:
    """Hashable canonical form: AND/OR children are flattened (nested
    same-op nodes absorbed), order-insensitive and DUPLICATE-FREE, and a
    group left with one distinct operand keys as that operand — so
    `a & b` / `b & a`, `a & (b & c)` / `(a & b) & c`, and `a & a` / `a`
    all get the same key (mirroring `_make_group`'s rebuild, which drops
    duplicate branches and collapses singleton groups: the two
    normalizations MUST agree or degenerate targets never match).
    Phrases are atomic (a sub-phrase of a longer phrase never matches)."""
    if node.op == "phrase":
        return ("p", node.phrase.items, node.phrase.prefix_slots)
    if node.op == "not":
        return ("!", _canon_key(node.children[0]))
    # flatten on child KEYS, not child nodes: a child whose own dedupe
    # collapsed it to a same-op group (`(a|b) & (a|b)` inside an OR) must
    # still be absorbed, or the key would depend on the original nesting
    keys: set[tuple] = set()
    for c in node.children:
        k = _canon_key(c)
        if k[0] == node.op:
            keys.update(k[1])
        else:
            keys.add(k)
    if len(keys) == 1:
        return next(iter(keys))
    return (node.op, tuple(sorted(keys)))


def _make_group(op: str, children: list[Node]) -> Node | None:
    """AND/OR node from already-rewritten children: flatten nested
    same-op groups, drop duplicate branches (x|x = x, x&x = x)."""
    flat: list[Node] = []
    seen: set[tuple] = set()
    stack = list(reversed(children))
    while stack:
        c = stack.pop()
        if c.op == op:
            stack.extend(reversed(c.children))
            continue
        k = _canon_key(c)
        if k not in seen:
            seen.add(k)
            flat.append(c)
    if not flat:
        return None
    return flat[0] if len(flat) == 1 else Node(op, tuple(flat))


def _subtree_ids(node: Node | None) -> set[int]:
    """ids of every node object in a tree (the substitute is inserted as
    the SAME object everywhere, so identity marks substituted material)."""
    out: set[int] = set()
    stack = [node] if node is not None else []
    while stack:
        n = stack.pop()
        out.add(id(n))
        if n.op != "phrase":
            stack.extend(n.children)
    return out


def _rewrite_node(node: Node | None, tkey: tuple, t_want: set | None,
                  sub: Node | None, protected: set[int]) -> Node | None:
    """One bottom-up pass of a single (target, substitute) rule.
    Matches (a) any subtree canonically equal to the target, and (b) for
    an AND/OR target, any subset of a same-op group's operands equal to
    the target's operand set (PG: rewriting 'a & b' inside 'b & a & c'
    yields 'substitute & c'). `t_want` is the target's canonical operand
    key set when the CANONICAL target is a group, else None (a degenerate
    `a & a` target collapses to `a` and matches like it). `sub=None`
    (empty substitute query) deletes the matched subtree. Operand sets
    are duplicate-free on both sides — `_canon_key`/`_make_group` dedupe
    — so subset containment is plain set logic.

    The whole-subtree check runs BEFORE descending (and again after the
    rebuild): a self-similar tree like `a & a & (a & !(a))` canonically
    equals its own inner group, and bottom-up-only matching would consume
    the inner occurrence first, leaving the root unmatched.

    `protected` holds ids of substituted material (PG's QTN_NOCHANGE
    flag, tsquery_rewrite.c): within one rule, matching never re-enters
    what that rule already inserted, so a substitute containing its own
    target ('a' → 'a | (a & b)') inserts once instead of re-expanding
    every fixpoint pass."""
    if node is None or id(node) in protected:
        return node
    if _canon_key(node) == tkey:
        return sub
    if node.op == "not":
        child = _rewrite_node(node.children[0], tkey, t_want, sub,
                              protected)
        node = Node("not", (child,)) if child is not None else None
    elif node.op in ("and", "or"):
        kids = [_rewrite_node(c, tkey, t_want, sub, protected)
                for c in node.children]
        node = _make_group(node.op, [c for c in kids if c is not None])
        if (node is not None and t_want is not None
                and node.op == tkey[0]):
            # subset match on the flattened group's operands, substituted
            # material excluded (its ids are protected)
            have = [(_canon_key(c), c) for c in node.children]
            free = {k for k, c in have if id(c) not in protected}
            if t_want <= free:
                picked: set[tuple] = set()
                keep = []
                for k, c in have:
                    if (k in t_want and k not in picked
                            and id(c) not in protected):
                        picked.add(k)
                    else:
                        keep.append(c)
                if sub is not None:
                    keep.append(sub)
                node = _make_group(node.op, keep)
    if (node is not None and id(node) not in protected
            and _canon_key(node) == tkey):
        return sub
    return node


def ts_rewrite(query: CompiledQuery,
               rules: "list[tuple[CompiledQuery, CompiledQuery]]",
               max_passes: int = 10) -> CompiledQuery:
    """PG `ts_rewrite(query, target, substitute)` over compiled queries
    (pg docs §12.4.2.1; the reference inherits it from core PG): every
    subexpression of `query` matching a rule's target is replaced by
    that rule's substitute. Matching is boolean-aware — operand order is
    ignored and an AND/OR target matches a subset of a same-op group
    ('a & b' rewrites inside 'b & a & c') — but phrases are atomic.
    A rule whose substitute compiled to the empty query deletes the
    matched subexpression.

    Rules apply in order, each run to a canonical fixpoint (bounded by
    `max_passes`); within one rule, substituted material is never
    re-matched (PG's QTN_NOCHANGE discipline), so self-referential rules
    like 'a' → 'a | b' insert once and terminate. Driver side and
    O(|tree|·|rules|·passes) — queries are tiny; the rules TABLE form is
    `ts_rewrite_rules_df`."""
    root = query.root
    for target, sub in rules:
        if target.root is None:
            raise ValueError("ts_rewrite target compiled to an empty query")
        tkey = _canon_key(target.root)
        t_want = set(tkey[1]) if tkey[0] in ("and", "or") else None
        protected = _subtree_ids(sub.root)
        for _ in range(max_passes):
            before = None if root is None else _canon_key(root)
            root = _rewrite_node(root, tkey, t_want, sub.root, protected)
            after = None if root is None else _canon_key(root)
            if after == before:
                break
    phrases = _dedupe(_collect_positive_phrases(root))
    return CompiledQuery(query.config, query.raw, root, phrases)


def require_no_prefixes(query: CompiledQuery, context: str) -> None:
    """Loud guard for plans that cannot see an index dictionary: a `:*`
    prefix query reaching them would otherwise silently behave as an
    exact-lexeme query."""
    if isinstance(query, CompiledQuery) and query.has_prefixes:
        raise ValueError(
            f"{context} cannot evaluate a ':*' prefix query directly; "
            "expand it against an index first: "
            "plans.search.expand_query_prefixes(index, query)")


def render_tspquery(node: Node | None) -> str:
    """Text form of a compiled boolean tree — tsquery-syntax output like
    PG casting a tsquery back to text ('' for the empty query)."""
    def rend(n: Node, nested: bool) -> str:
        if n.op == "phrase":
            s = n.phrase.render()
            return f"({s})" if nested and n.phrase.length > 1 else s
        if n.op == "not":
            return "!" + rend(n.children[0], True)
        sep = " & " if n.op == "and" else " | "
        s = sep.join(rend(c, True) for c in n.children)
        return f"({s})" if nested else s

    return "" if node is None else rend(node, False)


def numnode(query: CompiledQuery) -> int:
    """PG `numnode(tsquery)`: lexeme + operator node count — 0 for the
    empty query, 5 for '(fat & rat) | cat'. Phrases count each link as
    one operator ('a <2> b' = 3 nodes) and n-ary groups count their
    n − 1 binary operators, matching PG's binary storage."""
    def cnt(n: Node | None) -> int:
        if n is None:
            return 0
        if n.op == "phrase":
            return 2 * n.phrase.length - 1
        if n.op == "not":
            return 1 + cnt(n.children[0])
        return sum(cnt(c) for c in n.children) + (len(n.children) - 1)

    return cnt(query.root)


def querytree(query: CompiledQuery) -> str:
    """PG `querytree(tsquery)`: the index-usable positive part of the
    query as text. NOT branches drop; an AND keeps its remaining
    children, but an OR with a dropped arm drops entirely (a `!x` arm
    matches almost every document, so the OR cannot narrow an index
    scan — PG's clean_NOT rule). 'T' when nothing usable remains."""
    def pos(n: Node | None) -> Node | None:
        if n is None or n.op == "not":
            return None
        if n.op == "phrase":
            return n
        kids = [pos(c) for c in n.children]
        if n.op == "or":
            if any(k is None for k in kids):
                return None
        else:
            kids = [k for k in kids if k is not None]
            if not kids:
                return None
        return kids[0] if len(kids) == 1 else Node(n.op, tuple(kids))

    p = pos(query.root)
    return "T" if p is None else render_tspquery(p)


def tsquery_phrase(q1: CompiledQuery, q2: CompiledQuery,
                   distance: int = 1) -> CompiledQuery:
    """PG `tsquery_phrase(q1, q2[, distance])`: the phrase query
    'q1 <distance> q2' — q2's match must END `distance` positions after
    q1's match end, so tsquery_phrase(to_tspquery('fat'),
    to_tspquery('cat'), 10) renders 'fat <10> cat' and composing onto a
    multi-lexeme left operand accumulates from its last position.

    Both operands must be plain phrase queries (what to_tspquery /
    phraseto_tspquery produce for words and phrases); PG's general
    boolean-operand distribution is out of scope and raises."""
    if int(distance) < 0:
        raise ValueError("distance must be >= 0")
    if q1.config != q2.config:
        raise TSQueryParseError(
            f"operand configs differ: {q1.config!r} vs {q2.config!r}")
    for q in (q1, q2):
        if q.root is None or q.root.op != "phrase":
            raise TSQueryParseError(
                "tsquery_phrase operands must be plain phrase queries "
                f"(got {render_tspquery(q.root)!r})")
    left, right = q1.root.phrase, q2.root.phrase
    left_max = max(p for _, p in left.items)
    shift = left_max + int(distance) - 1
    items = left.items + tuple((lx, p + shift) for lx, p in right.items)
    phrase = Phrase(items)
    raw = f"({q1.raw}) <{int(distance)}> ({q2.raw})"
    return CompiledQuery(q1.config, raw, Node("phrase", phrase=phrase),
                         (phrase,))


def tsquery_contains(a: CompiledQuery, b: CompiledQuery) -> bool:
    """PG `tsquery @> tsquery` in the boolean-aware reading `ts_rewrite`
    uses: True when some subexpression of `a` canonically equals `b`
    (operand order and duplicates ignored), including a subset of a
    same-op group's operands — 'b & a & c' contains 'a & b'. This is
    exactly the test that decides whether ts_rewrite(a, rule(b → s))
    would fire, so it shares the rewrite machinery's canonical keys.
    (PG core's tsq_mcontains is WEAKER — a bag-of-lexemes check that
    ignores operators; this one respects boolean structure.) Phrases are
    atomic, like ts_rewrite: 'a <-> b <-> c' does not contain 'a <-> b'.
    The empty query is contained in everything; nothing non-empty is
    contained in the empty query."""
    if b.root is None:
        return True
    if a.root is None:
        return False
    tkey = _canon_key(b.root)
    t_want = (set(tkey[1])
              if isinstance(tkey[0], str) and tkey[0] in ("and", "or")
              else None)

    def walk(n: Node) -> bool:
        nk = _canon_key(n)
        if nk == tkey:
            return True
        # subset rule on the flattened operand set (canon keys absorb
        # nested same-op groups, so this sees 'b & a & c' as one set)
        if (t_want is not None and nk[0] == tkey[0]
                and t_want <= set(nk[1])):
            return True
        if n.op == "phrase":
            return False
        return any(walk(c) for c in n.children)

    return walk(a.root)


def empty_tspquery(config: str | None = None) -> CompiledQuery:
    """The empty query (PG `''::tsquery`): matches nothing; as a
    ts_rewrite substitute it deletes the matched subexpression.
    (`to_tspquery('')` raises, like PG's `to_tsquery('')`.)"""
    return CompiledQuery(config or _DEFAULT_CONFIG, "", None, ())


def ts_rewrite_rules_df(query: CompiledQuery, rules_df,
                        target_col: str = "target",
                        substitute_col: str = "substitute",
                        max_rules: int = 100_000) -> CompiledQuery:
    """PG's `ts_rewrite(query, 'SELECT target, substitute FROM ...')`
    form: rules live in a (target, substitute) tsquery-syntax table.
    The rules table is dictionary-scale by construction (it is authored
    by humans), so it is collected to the driver — bounded by
    `max_rules`, loudly, because an unbounded collect is how driver
    OOMs happen. Rules apply in (target, substitute) lexical order so
    the rewrite is deterministic regardless of table partitioning."""
    rows = rules_df.select(target_col, substitute_col) \
                   .limit(max_rules + 1).collect()
    if len(rows) > max_rules:
        raise ValueError(
            f"rules table exceeds max_rules={max_rules}; ts_rewrite rules "
            "are driver-side — split or raise the cap explicitly")
    compiled = sorted(
        ((r[target_col], r[substitute_col]) for r in rows),
        key=lambda p: (p[0], p[1]))
    rules = [(to_tspquery(query.config, t),
              to_tspquery(query.config, s) if s and s.strip()
              else empty_tspquery(query.config))
             for t, s in compiled]
    return ts_rewrite(query, rules)


def phraseto_tspquery(config: str, phrase_text: str | None = None) -> CompiledQuery:
    """Compile a plain human phrase; stopwords drop but keep their gaps.
    With one argument, the session default config applies."""
    if phrase_text is None:
        config, phrase_text = _DEFAULT_CONFIG, config
    lexemes = analyze_text_simple(phrase_text, config)
    items = tuple(
        (lex, pos) for pos, lex in enumerate(lexemes, start=1) if lex is not None
    )
    if items:
        base = min(p for _, p in items)
        items = tuple((lx, p - base + 1) for lx, p in items)
        phrase = Phrase(items)
        root = Node("phrase", phrase=phrase)
        phrases = (phrase,)
    else:
        root, phrases = None, ()
    return CompiledQuery(config, phrase_text, root, phrases)
