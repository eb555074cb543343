"""Grammar meta-test: prove the scrp grammar is LL(1)/predictive and
non-left-recursive — a port of the reference's grammar proof
(/root/reference/tests/grammar_tests.rs:122-343 over grammar.txt).

Guards `plans/parser.py` (a recursive-descent LL(1) parser) against a
refactor that silently breaks predictiveness: if two productions of a
nonterminal ever share a predict-set token, single-token lookahead no
longer suffices and the parser's dispatch becomes order-dependent.

The grammar below is grammar.txt as *implemented* (parser.rs and our
parser.py agree on both deviations from the written grammar):
- no `,` selector-combinator (grammar.txt:39 lists it; neither parser
  accepts it — SURVEY.md §2.2);
- `selector_list` in the `element` rule is the written grammar's typo
  for `selector` (grammar.txt defines no selector_list rule);
- `selector_combinator` is NOT nullable here, because the implemented
  parsers make the descendant combinator unreachable: the fragment
  loop peeks *through* whitespace (parser.rs:268-272 /
  parser.py:171-184), so `li .special` maximal-munches into the one
  compound fragment `li.special`.  With grammar.txt's nullable
  combinator the grammar is genuinely NOT LL(1): predict of
  `named_selector_list2 -> ε` would contain FIRST(named_selector) =
  {., #, ID} via FOLLOW, colliding with the recursive production —
  this very computation finds that conflict if you re-add [EPS] to
  selector_combinator.  (The reference's own meta-test passes on the
  written grammar only because its FOLLOW propagation never enters
  non-nullable nonterminals, so the conflict chain
  named_selector_list2 ← named_selector_list ← selector_fragment is
  cut short.)  Maximal-munch IS the LL(1) resolution, and this file
  proves the munched grammar predictive.
"""

EPS = ""  # empty production marker
EOF = "EOF"

# nonterminal -> list of productions; UPPERCASE/punctuation = terminal
GRAMMAR: dict[str, list[list[str]]] = {
    "program": [["statement_list", EOF]],
    "statement_list": [["statement", "statement_list"], [EPS]],
    "statement": [["ID", ":", "rvalue", "filter_list", ";"]],
    "rvalue": [["element"], ["leaf"]],
    "element": [
        ["maybe_url", "selector", "{", "statement_list", "}", "qualifier"]
    ],
    "inline": [["<", "leaf", "filter_list", ">"]],
    "maybe_url": [["inline"], [EPS]],
    "selector": [["selector_fragment", "selector_combinator_list"]],
    "named_selector": [[".", "ID"], ["#", "ID"], ["ID"]],
    "named_selector_list": [["named_selector", "named_selector_list2"]],
    "named_selector_list2": [
        ["named_selector", "named_selector_list2"],
        [EPS],
    ],
    "selector_fragment": [["named_selector_list"], ["*"]],
    "selector_combinator_list": [
        ["selector_combinator", "selector_fragment", "selector_combinator_list"],
        [EPS],
    ],
    "selector_combinator": [["+"], [">"], ["~"]],
    "qualifier": [["?"], ["*"], [EPS]],
    "filter_list": [["|", "filter", "qualifier", "filter_list"], [EPS]],
    "filter": [
        ["ID", "(", "arg_list", ")"],
        ["[", "ID", ":", "leaf", "filter_list", "]"],
    ],
    "value": [["leaf"], ["inline"]],
    "arg_list": [["ID", ":", "value", "arg_list2"], [EPS]],
    "arg_list2": [[",", "arg_list"], [EPS]],
    "leaf": [["variable"], ["INT"], ["FLOAT"], ["STRING"]],
    "variable": [["$", "ID"]],
}

START = "program"


def is_terminal(sym: str, g=None) -> bool:
    g = GRAMMAR if g is None else g
    return sym not in g and sym != EPS


def compute_nullable(g=None) -> set[str]:
    g = GRAMMAR if g is None else g
    nullable: set[str] = set()
    changed = True
    while changed:
        changed = False
        for nt, prods in g.items():
            if nt in nullable:
                continue
            for prod in prods:
                if all(s == EPS or s in nullable for s in prod):
                    nullable.add(nt)
                    changed = True
                    break
    return nullable


def compute_first(nullable: set[str], g=None) -> dict[str, set[str]]:
    g = GRAMMAR if g is None else g
    first: dict[str, set[str]] = {nt: set() for nt in g}
    changed = True
    while changed:
        changed = False
        for nt, prods in g.items():
            for prod in prods:
                for sym in prod:
                    if sym == EPS:
                        break
                    if is_terminal(sym, g):
                        if sym not in first[nt]:
                            first[nt].add(sym)
                            changed = True
                        break
                    if not first[sym] <= first[nt]:
                        first[nt] |= first[sym]
                        changed = True
                    if sym not in nullable:
                        break
    return first


def first_of_seq(
    seq: list[str], nullable: set[str], first: dict[str, set[str]], g=None
) -> tuple[set[str], bool]:
    """(FIRST(seq), seq fully nullable?)"""
    g = GRAMMAR if g is None else g
    out: set[str] = set()
    for sym in seq:
        if sym == EPS:
            continue
        if is_terminal(sym, g):
            out.add(sym)
            return out, False
        out |= first[sym]
        if sym not in nullable:
            return out, False
    return out, True


def compute_follow(
    nullable: set[str], first: dict[str, set[str]], g=None
) -> dict[str, set[str]]:
    g = GRAMMAR if g is None else g
    follow: dict[str, set[str]] = {nt: set() for nt in g}
    changed = True
    while changed:
        changed = False
        for nt, prods in g.items():
            for prod in prods:
                for i, sym in enumerate(prod):
                    if is_terminal(sym, g) or sym == EPS:
                        continue
                    rest = prod[i + 1 :]
                    fset, rest_nullable = first_of_seq(rest, nullable, first, g)
                    if not fset <= follow[sym]:
                        follow[sym] |= fset
                        changed = True
                    if rest_nullable and not follow[nt] <= follow[sym]:
                        follow[sym] |= follow[nt]
                        changed = True
    return follow


def compute_predict_sets(g=None) -> dict[str, list[set[str]]]:
    g = GRAMMAR if g is None else g
    nullable = compute_nullable(g)
    first = compute_first(nullable, g)
    follow = compute_follow(nullable, first, g)
    predict: dict[str, list[set[str]]] = {}
    for nt, prods in g.items():
        sets = []
        for prod in prods:
            fset, prod_nullable = first_of_seq(prod, nullable, first, g)
            if prod_nullable:
                fset = fset | follow[nt]
            sets.append(fset)
        predict[nt] = sets
    return predict


def test_grammar_not_left_recursive():
    """A nonterminal must never (nullably) derive a leftmost self —
    the reference panics on this inside predict_sets
    (grammar_tests.rs:128-195)."""
    nullable = compute_nullable()
    # leftmost-reachability graph: nt -> nonterminals reachable at the
    # start of one of its productions (through nullable prefixes)
    edges: dict[str, set[str]] = {nt: set() for nt in GRAMMAR}
    for nt, prods in GRAMMAR.items():
        for prod in prods:
            for sym in prod:
                if sym == EPS or is_terminal(sym):
                    break
                edges[nt].add(sym)
                if sym not in nullable:
                    break
    # transitive closure; a self-loop = left recursion
    for k in GRAMMAR:
        for a in GRAMMAR:
            if k in edges[a]:
                edges[a] |= edges[k]
    offenders = [nt for nt in GRAMMAR if nt in edges[nt]]
    assert not offenders, f"left-recursive nonterminals: {offenders}"


def test_grammar_is_predictive():
    """LL(1): for every nonterminal, the predict sets of its
    productions are pairwise disjoint (grammar_tests.rs:318-343)."""
    predict = compute_predict_sets()
    conflicts = []
    for nt, sets in predict.items():
        seen: set[str] = set()
        for i, s in enumerate(sets):
            inter = seen & s
            if inter:
                conflicts.append((nt, i, sorted(inter)))
            seen |= s
    assert not conflicts, f"non-predictive productions: {conflicts}"


def test_predict_sets_match_parser_dispatch():
    """The computed predict sets must agree with the token sets
    parser.py actually dispatches on — ties the proof to the code."""
    predict = compute_predict_sets()
    by_prod = {
        nt: {i: s for i, s in enumerate(sets)}
        for nt, sets in predict.items()
    }
    # rvalue → element on {<, ., #, ID, *}: parser.py:70 checks
    # (ID, LESS, DOT, HASH) — `*` deliberately omitted (the reference's
    # un-eaten-Star quirk, parser.rs:263 / parser.py:168-170)
    assert by_prod["rvalue"][0] == {"<", ".", "#", "ID", "*"}
    assert by_prod["rvalue"][1] == {"$", "INT", "FLOAT", "STRING"}
    # leaf dispatch (parser.py:74-85)
    assert by_prod["leaf"][0] == {"$"}
    # filter: call vs select-filter (parser.py:209-224)
    assert by_prod["filter"][0] == {"ID"}
    assert by_prod["filter"][1] == {"["}
    # statement_list loops while lookahead is ID (parser.py:54-58)
    assert by_prod["statement_list"][0] == {"ID"}
    assert EOF in by_prod["statement_list"][1]
    assert "}" in by_prod["statement_list"][1]


def test_written_grammar_conflict_is_real():
    """Re-adding grammar.txt's nullable selector_combinator must
    surface the named_selector_list2 LL(1) conflict this machinery is
    built to catch — proving the checker has teeth and documenting WHY
    the implemented parsers maximal-munch compound fragments."""
    g = {nt: [list(p) for p in prods] for nt, prods in GRAMMAR.items()}
    g["selector_combinator"].append([EPS])
    predict = compute_predict_sets(g)
    sets = predict["named_selector_list2"]
    overlap = sets[0] & sets[1]
    assert {".", "#", "ID"} <= overlap, overlap
