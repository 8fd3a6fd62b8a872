"""Query op-tree parser — the engine's AdvancedOpTree analogue.

The reference parses queries with the vendored
``liboscar::AdvancedOpTree::parse`` (apps/main.cpp:177-179,
src/static-htm-index.cpp:211-212) into a Node AST with string leaves,
region/cell leaves, geometry leaves, unary ops and binary set ops
(taxonomy: include/hic/static-htm-index.h:197-299; SURVEY.md §2.8).

Grammar (this engine's spec):

    expr    := primary (op primary)*          # left-assoc, equal precedence
    op      := '+' (union) | '-' (difference) | '^' (sym-diff)
             | '/' or juxtaposition (intersection)
    primary := '(' expr ')' | '$full(' expr ')' | leaf
    leaf    := '"exact"' | word | word* | *word | *word* (affix → query type,
                StringCompleter::normalize analogue,
                include/hic/static-htm-index.h:213-216)
             | $region:NAME | $cell:ID | $item:TERM
             | $rect:lat0,lon0,lat1,lon1 | $poly:lat,lon,lat,lon,...
             | $point:lat,lon | $near:lat,lon,k

STRING / STRING_REGION / STRING_ITEM leaf flavors follow the reference
($item: restricts matches to item payloads; $region: to region names).
Geometry leaves and NEAR are engine extensions the reference throws on
(static-htm-index.h:233-244) but the north rule requires.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.tokenize import normalize_term


class Node:
    pass


@dataclass
class TermLeaf(Node):
    value: str
    qt: str = "exact"  # exact | prefix | suffix | substring
    flavor: str = "mixed"  # mixed | region | item


@dataclass
class RegionLeaf(Node):
    name: str


@dataclass
class CellLeaf(Node):
    cell_id: int


@dataclass
class RectLeaf(Node):
    lat0: float
    lon0: float
    lat1: float
    lon1: float


@dataclass
class PolyLeaf(Node):
    ring: list = field(default_factory=list)  # [(lat, lon), ...]


@dataclass
class PointLeaf(Node):
    lat: float
    lon: float


@dataclass
class NearLeaf(Node):
    lat: float
    lon: float
    k: int


@dataclass
class AllToFull(Node):
    child: Node = None


@dataclass
class Dilate(Node):
    km: float = 0.0
    child: Node = None


@dataclass
class SetOp(Node):
    op: str = " "  # '+' | ' ' | '-' | '^'
    left: Node = None
    right: Node = None


class ParseError(ValueError):
    pass


_OPS = {"+", "-", "^", "/"}


def _tokenize(q: str) -> list[str]:
    out: list[str] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
            continue
        if c in "()+-^/":
            out.append(c)
            i += 1
            continue
        if c == '"':
            j = q.find('"', i + 1)
            if j < 0:
                raise ParseError(f"unterminated quote at {i}")
            out.append(q[i: j + 1])
            i = j + 1
            continue
        j = i
        while j < n and not q[j].isspace() and q[j] not in '()+^/"':
            j += 1
        out.append(q[i:j])
        i = j
    return out


def _parse_word_leaf(tok: str) -> TermLeaf:
    flavor = "mixed"
    if tok.startswith("$region:"):
        rest = tok[len("$region:"):]
        return RegionLeaf(rest)
    if tok.startswith("$item:"):
        flavor = "item"
        tok = tok[len("$item:"):]
    if tok.startswith('"') and tok.endswith('"') and len(tok) >= 2:
        body = normalize_term(tok[1:-1])
        words = body.split()
        if len(words) > 1:
            # multi-word phrase ≈ AND of its tokens (term identity is
            # tokenizer-level in this engine; documented approximation —
            # the reference's trie can hold multi-word tag values)
            node: Node = TermLeaf(words[0], "exact", flavor)
            for w in words[1:]:
                node = SetOp(" ", node, TermLeaf(w, "exact", flavor))
            return node
        return TermLeaf(body, "exact", flavor)
    # affix markers → query type (normalize(), static-htm-index.h:213-216)
    pre = tok.startswith("*")
    suf = tok.endswith("*") and len(tok) > 1
    core = tok.strip("*")
    if pre and suf:
        qt = "substring"
    elif suf:
        qt = "prefix"
    elif pre:
        qt = "suffix"
    else:
        qt = "exact"
    return TermLeaf(normalize_term(core), qt, flavor)


def _parse_special(tok: str) -> Node:
    body = tok[1:]
    kind, _, rest = body.partition(":")
    if kind == "region":
        # STRING_REGION semantics: affix markers search region NAMES by
        # query type (the reference's region-payload string leaf)
        if rest.startswith("*") or rest.endswith("*"):
            leaf = _parse_word_leaf(rest)
            leaf.flavor = "region"
            return leaf
        return RegionLeaf(rest)
    if kind == "cell":
        return CellLeaf(int(rest))
    if kind == "rect":
        a = [float(x) for x in rest.split(",")]
        if len(a) != 4:
            raise ParseError(f"$rect needs 4 numbers: {tok}")
        return RectLeaf(*a)
    if kind == "poly":
        a = [float(x) for x in rest.split(",")]
        if len(a) < 6 or len(a) % 2:
            raise ParseError(f"$poly needs >=3 lat,lon pairs: {tok}")
        return PolyLeaf([(a[i], a[i + 1]) for i in range(0, len(a), 2)])
    if kind == "point":
        a = [float(x) for x in rest.split(",")]
        if len(a) != 2:
            raise ParseError(f"$point needs lat,lon: {tok}")
        return PointLeaf(*a)
    if kind == "near":
        a = rest.split(",")
        if len(a) != 3:
            raise ParseError(f"$near needs lat,lon,k: {tok}")
        return NearLeaf(float(a[0]), float(a[1]), int(a[2]))
    if kind == "item":
        return _parse_word_leaf(tok)
    raise ParseError(f"unknown special leaf {tok!r}")


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ParseError("unexpected end of query")
        self.i += 1
        return t

    def parse_expr(self) -> Node:
        left = self.parse_primary()
        while True:
            t = self.peek()
            if t is None or t == ")":
                return left
            if t in _OPS:
                self.next()
                op = " " if t == "/" else t
                right = self.parse_primary()
                left = SetOp(op, left, right)
            else:
                # juxtaposition = intersection (reference: ' ' op)
                right = self.parse_primary()
                left = SetOp(" ", left, right)

    def parse_primary(self) -> Node:
        t = self.next()
        if t == "(":
            e = self.parse_expr()
            if self.next() != ")":
                raise ParseError("expected ')'")
            return e
        if t == "$full" or t == "$full(":
            # tokenizer splits '$full(' into '$full' '(' when spaced;
            # accept both forms
            if t == "$full":
                if self.next() != "(":
                    raise ParseError("$full needs parentheses")
            e = self.parse_expr()
            if self.next() != ")":
                raise ParseError("expected ')' after $full")
            return AllToFull(e)
        if t.startswith("$dilate:"):
            # CELL_DILATION analogue — an engine extension (the reference
            # parses the op but throws in every interpreter,
            # static-htm-index.h:253-267):  $dilate:KM ( expr )
            try:
                km = float(t[len("$dilate:"):])
            except ValueError:
                raise ParseError(f"bad dilation distance in {t!r}") from None
            if self.next() != "(":
                raise ParseError("$dilate:KM needs parentheses")
            e = self.parse_expr()
            if self.next() != ")":
                raise ParseError("expected ')' after $dilate")
            return Dilate(km, e)
        if t in _OPS or t == ")":
            raise ParseError(f"unexpected token {t!r}")
        if t.startswith("$") and not t.startswith("$item:"):
            if t.startswith("$full("):
                # '$full(foo' glued — retokenize
                raise ParseError("put spaces around $full( ... )")
            return _parse_special(t)
        return _parse_word_leaf(t)


def parse(query: str) -> Node:
    toks = _tokenize(query)
    if not toks:
        raise ParseError("empty query")
    p = _Parser(toks)
    node = p.parse_expr()
    if p.peek() is not None:
        raise ParseError(f"trailing tokens from {p.toks[p.i:]}")
    return node
