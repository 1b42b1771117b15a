"""Gremlin *text* front-end — parse a query string into gie.Traversal calls.

The reference executes textual Gremlin: a client submits a string and the
compiler builds the operator tree before lowering it to the QueryFlow
dataflow (/root/reference/interactive_engine/compiler/src/main/java/com/
alibaba/graphscope/gaia/plan/translator/TraversalTranslator.java and the
step tree under .../gaia/plan/strategy/; lifecycle SURVEY.md §3.3). A user
porting a reference notebook calls ``graphscope.gremlin(g).execute("g.V()
...")`` — this module is that entry point for the step vocabulary gie.py
already executes. It is a *front-end only*: every step lowers to the same
fluent methods, so a parsed query and its fluent twin produce the
byte-identical Catalyst plan (tests assert hash equality).

Supported grammar (the gie.py step vocabulary)::

    query     := 'g' ('.' step)+
    step      := NAME '(' args? ')'
    args      := arg (',' arg)*
    arg       := literal | predicate | anonymous
    anonymous := ('__' '.')? step ('.' step)*          # sub-traversal
    predicate := ('P' '.')? PREDNAME '(' literal (',' literal)* ')'
    literal   := 'str' | "str" | int | float | true | false

Steps: V E hasLabel has out in both outE inE bothE inV outV bothV otherV
values valueMap properties count sum max min mean fold groupCount group
as select where union not choose dedup order limit range sample repeat
times until emit path simplePath by desc asc math cache identity
withSack sackBy sack.
Predicates: eq neq gt gte lt lte within without between inside outside.

Modulators attach to the preceding step exactly as in Gremlin:
``order().by(key, desc)``, ``groupCount().by(key)``,
``group().by(key).by(agg)``, ``repeat(X).times(n)/.until(P)/.emit()``
(plus the pre-positioned ``emit().repeat(X)`` / ``until(P).repeat(X)``
forms). ``path()`` / ``simplePath()`` auto-arm path tracking at the
source, as Gremlin's implicit path semantics do.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.gie import Traversal, tag, traversal
from linkgraph.property import PropertyGraph


class GremlinParseError(ValueError):
    pass


# ------------------------------------------------------------------ lexer

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
      | (?P<number>-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+)
      | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<punct>[().,])
    )""",
    re.VERBOSE,
)


def _lex(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        if text[pos].isspace():
            pos += 1
            continue
        m = _TOKEN.match(text, pos)
        if not m:
            raise GremlinParseError(
                f"unexpected character {text[pos]!r} at offset {pos}: "
                f"...{text[max(0, pos - 20):pos + 10]}..."
            )
        if m.end() == m.start():  # trailing whitespace only
            break
        for kind in ("string", "number", "name", "punct"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
        pos = m.end()
    return out


# ------------------------------------------------------------------ parser

@dataclass
class _Step:
    name: str
    args: list = field(default_factory=list)


@dataclass
class _Anon:
    """Anonymous sub-traversal argument (``__.out('x').has(...)``)."""

    steps: list[_Step] = field(default_factory=list)


@dataclass
class _Pred:
    """Predicate argument (``P.gt(29)`` / bare ``gt(29)``)."""

    name: str
    args: list = field(default_factory=list)


_PREDICATES = {
    "eq", "neq", "gt", "gte", "lt", "lte",
    "within", "without", "between", "inside", "outside",
}

# step names valid at the head of an anonymous traversal (bare form,
# without the __. prefix) — anything the evaluator can apply mid-chain
_ANON_HEADS = {
    "out", "in", "both", "outE", "inE", "bothE", "inV", "outV", "bothV",
    "otherV", "has", "hasLabel", "values", "dedup", "order", "limit",
    "range", "sample", "repeat", "not", "count", "simplePath", "where",
    "as", "select", "union", "choose", "loops", "identity",
}


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], text: str):
        self.toks = tokens
        self.i = 0
        self.text = text

    def _peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, None)

    def _eat(self, kind: str | None = None, value: str | None = None):
        t = self._peek()
        if t[0] is None:
            raise GremlinParseError(f"unexpected end of query: {self.text!r}")
        if kind and t[0] != kind or value and t[1] != value:
            raise GremlinParseError(
                f"expected {value or kind}, got {t[1]!r} (token {self.i}) in {self.text!r}"
            )
        self.i += 1
        return t

    def parse_query(self) -> list[_Step]:
        k, v = self._eat("name")
        if v != "g":
            raise GremlinParseError(f"query must start with 'g', got {v!r}")
        steps = []
        while self._peek() == ("punct", "."):
            self._eat("punct", ".")
            steps.append(self.parse_step())
        if self.i != len(self.toks):
            k, v = self._peek()
            raise GremlinParseError(f"trailing input at {v!r} in {self.text!r}")
        if not steps:
            raise GremlinParseError("empty traversal: expected g.V()... or g.E()...")
        return steps

    def parse_step(self) -> _Step:
        _, name = self._eat("name")
        self._eat("punct", "(")
        args = []
        if self._peek() != ("punct", ")"):
            args.append(self.parse_arg())
            while self._peek() == ("punct", ","):
                self._eat("punct", ",")
                args.append(self.parse_arg())
        self._eat("punct", ")")
        return _Step(name, args)

    def parse_arg(self):
        kind, val = self._peek()
        if kind == "string":
            self.i += 1
            return self._unquote(val)
        if kind == "number":
            self.i += 1
            return float(val) if ("." in val or "e" in val or "E" in val) else int(val)
        if kind == "name":
            if val in ("true", "false"):
                self.i += 1
                return val == "true"
            if val in ("desc", "asc", "decr", "incr"):  # Order enum literals
                self.i += 1
                return val
            # P.pred(...) | __.chain | pred(...) | bare-step chain
            if val == "P" and self._peek(1) == ("punct", "."):
                self.i += 2
                step = self.parse_step()
                return _Pred(step.name, step.args)
            if val == "__":
                self.i += 1
                chain = []
                while self._peek() == ("punct", "."):
                    self._eat("punct", ".")
                    chain.append(self.parse_step())
                if not chain:
                    raise GremlinParseError("'__' must be followed by steps")
                return _Anon(chain)
            if self._peek(1) == ("punct", "("):
                if val in _PREDICATES:
                    step = self.parse_step()
                    return _Pred(step.name, step.args)
                if val in _ANON_HEADS:
                    chain = [self.parse_step()]
                    while self._peek() == ("punct", "."):
                        self._eat("punct", ".")
                        chain.append(self.parse_step())
                    return _Anon(chain)
            raise GremlinParseError(f"cannot parse argument starting at {val!r}")
        raise GremlinParseError(f"cannot parse argument at token {val!r}")

    @staticmethod
    def _unquote(s: str) -> str:
        body = s[1:-1]
        return body.replace("\\'", "'").replace('\\"', '"').replace("\\\\", "\\")


# --------------------------------------------------------------- evaluator

def _pred_fn(p: _Pred):
    """Predicate → callable(Column) -> Column (the has()-value form)."""
    a = p.args
    if p.name == "eq":
        return lambda c: c == a[0]
    if p.name == "neq":
        return lambda c: c != a[0]
    if p.name == "gt":
        return lambda c: c > a[0]
    if p.name == "gte":
        return lambda c: c >= a[0]
    if p.name == "lt":
        return lambda c: c < a[0]
    if p.name == "lte":
        return lambda c: c <= a[0]
    if p.name == "within":
        return lambda c: c.isin(list(a))
    if p.name == "without":
        return lambda c: ~c.isin(list(a))
    if p.name == "between":  # [a, b) — Gremlin's between
        return lambda c: (c >= a[0]) & (c < a[1])
    if p.name == "inside":  # (a, b)
        return lambda c: (c > a[0]) & (c < a[1])
    if p.name == "outside":
        return lambda c: (c < a[0]) | (c > a[1])
    raise GremlinParseError(f"unknown predicate {p.name!r}")


_RENAMED = {"in": "in_", "as": "as_", "not": "not_", "range": "range_"}


def _needs_path(steps: list[_Step]) -> bool:
    if any(s.name in ("path", "simplePath") for s in steps):
        return True
    for s in steps:
        for a in s.args:
            if isinstance(a, _Anon) and _needs_path(a.steps):
                return True
    return False


def _apply_chain(t: Traversal, steps: list[_Step], text: str):
    """Apply parsed steps to a Traversal; returns Traversal or DataFrame."""
    i = 0
    n = len(steps)
    while i < n:
        s = steps[i]
        nxt = steps[i + 1] if i + 1 < n else None
        last = all(st.name in ("by", "times", "emit", "until") for st in steps[i + 1:])

        if isinstance(t, DataFrame):
            raise GremlinParseError(
                f"step {s.name}() follows a terminal step in {text!r}"
            )

        if s.name in ("V", "E"):
            raise GremlinParseError("V()/E() are only valid as the source step")

        # ---- repeat + modulators (both orders) -------------------------
        if s.name in ("emit", "until") and any(
            st.name == "repeat" for st in steps[i:]
        ):
            # pre-positioned modulators: collect until repeat
            emit_first = False
            until_b = None
            while steps[i].name in ("emit", "until"):
                if steps[i].name == "emit":
                    emit_first = True
                else:
                    until_b = _anon_body(steps[i].args[0], text)
                i += 1
                if i >= n:
                    raise GremlinParseError("emit()/until() without repeat()")
            if steps[i].name != "repeat":
                raise GremlinParseError(
                    "emit()/until() must be adjacent to repeat()"
                )
            rep = steps[i]
            i += 1
            times, until_a, emit_after = None, None, False
            while i < n and steps[i].name in ("times", "until", "emit"):
                if steps[i].name == "times":
                    times = int(steps[i].args[0])
                elif steps[i].name == "until":
                    until_a = _anon_body(steps[i].args[0], text)
                else:
                    emit_after = True
                i += 1
            body = _anon_body(rep.args[0], text)
            t = t.repeat(
                body,
                times=times,
                until=until_a or until_b,
                emit=emit_after or emit_first,
                emit_first=emit_first,
                until_first=until_b is not None,
            )
            continue

        if s.name == "repeat":
            body = _anon_body(s.args[0], text)
            i += 1
            times, until_a, emit_after = None, None, False
            while i < n and steps[i].name in ("times", "until", "emit"):
                if steps[i].name == "times":
                    times = int(steps[i].args[0])
                elif steps[i].name == "until":
                    until_a = _anon_body(steps[i].args[0], text)
                else:
                    emit_after = True
                i += 1
            t = t.repeat(body, times=times, until=until_a, emit=emit_after)
            continue

        if s.name == "branch":
            # branch(__.values('age')).option(29, __.t1).option('none', __.t2)
            # — BranchTreeNode routing; 'none' keys the Pick.none catch-all.
            if len(s.args) != 1 or not isinstance(s.args[0], _Anon):
                raise GremlinParseError(
                    "branch() takes one __-traversal selector "
                    "(__.values(key), __.label() or __.id())"
                )
            sel_steps = s.args[0].steps
            if len(sel_steps) != 1 or sel_steps[0].name not in (
                "values",
                "label",
                "id",
            ):
                raise GremlinParseError(
                    "branch() selector must be a single __.values(key) / "
                    "__.label() / __.id() step"
                )
            sel_step = sel_steps[0]
            if sel_step.name == "values":
                selector = sel_step.args[0]
            elif sel_step.name == "label":
                selector = F.col("label")
            else:
                selector = F.col("oid")
            options, none_branch = {}, None
            j = i + 1
            while j < n and steps[j].name == "option":
                oargs = steps[j].args
                if len(oargs) != 2 or not isinstance(oargs[1], _Anon):
                    raise GremlinParseError(
                        "option() takes (token, __-traversal)"
                    )
                if isinstance(oargs[0], str) and oargs[0] == "none":
                    none_branch = _anon_body(oargs[1], text)
                else:
                    options[oargs[0]] = _anon_body(oargs[1], text)
                j += 1
            if not options and none_branch is None:
                raise GremlinParseError("branch() needs at least one option()")
            t = t.branch(selector, options, none=none_branch)
            i = j
            continue

        # ---- keyed aggregations with .by() modulators ------------------
        if s.name == "groupCount":
            by = None
            if nxt is not None and nxt.name == "by":
                by = nxt.args[0]
                i += 1
            t = t.groupCount(by=by)
            i += 1
            continue
        if s.name == "group":
            bys = []
            j = i + 1
            while j < n and steps[j].name == "by":
                bys.append(steps[j].args)
                j += 1
            if not bys:
                raise GremlinParseError("group() needs at least one by(key)")
            key = bys[0][0]
            agg, value = "count", None
            if len(bys) > 1:
                agg = bys[1][0]
                value = bys[1][1] if len(bys[1]) > 1 else None
            t = t.group_by(key, agg=agg, value=value)
            i = j
            continue
        if s.name == "order":
            by, asc = None, True
            if nxt is not None and nxt.name == "by":
                by = nxt.args[0]
                if len(nxt.args) > 1 and str(nxt.args[1]) in ("desc", "decr"):
                    asc = False
                i += 1
            if by is None:
                raise GremlinParseError("order() needs .by(key[, desc])")
            t = t.order(by, ascending=asc)
            i += 1
            continue

        if s.name == "math":
            # math('a + _').by('prop_a').by('prop_for_underscore'): by()
            # modulators map to variables in order of first appearance
            # (Gremlin's modulator convention)
            expr = s.args[0]
            bys = []
            j = i + 1
            while j < n and steps[j].name == "by":
                bys.append(steps[j].args[0])
                j += 1
            varnames = []
            for tok in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", expr):
                if tok not in ("sqrt", "abs", "exp", "log", "ceil", "floor") and tok not in varnames:
                    varnames.append(tok)
            if len(bys) != len(varnames):
                raise GremlinParseError(
                    f"math({expr!r}) has {len(varnames)} variables but "
                    f"{len(bys)} by() modulators"
                )
            t = t.math_(expr, by=dict(zip(varnames, bys)))
            i = j
            continue

        if s.name == "project":
            # project('a','b').by(spec).by(spec): by() count must match;
            # specs are property strings or __-traversals ending in count()
            names = list(s.args)
            if not names or not all(isinstance(a, str) for a in names):
                raise GremlinParseError("project() takes one or more name strings")
            bys = []
            j = i + 1
            while j < n and steps[j].name == "by":
                bys.append(steps[j].args[0])
                j += 1
            if len(bys) != len(names):
                raise GremlinParseError(
                    f"project({', '.join(names)}) has {len(names)} names but "
                    f"{len(bys)} by() modulators"
                )
            specs = {}
            for name, b in zip(names, bys):
                if isinstance(b, _Anon):
                    if not b.steps or b.steps[-1].name != "count":
                        raise GremlinParseError(
                            "project().by(traversal) must end in count() — "
                            "the local-count form is the only by-traversal "
                            "shape supported"
                        )
                    inner = _Anon(b.steps[:-1])
                    specs[name] = _anon_body(inner, text)
                elif isinstance(b, str):
                    specs[name] = b
                else:
                    raise GremlinParseError(
                        "project() by() takes a property name or a "
                        "__-traversal ending in count()"
                    )
            t = t.project(**specs)
            i = j
            continue

        # ---- plain steps ----------------------------------------------
        method = _RENAMED.get(s.name, s.name)
        if s.name == "has":
            if len(s.args) == 2 and isinstance(s.args[1], _Pred):
                t = t.has(s.args[0], _pred_fn(s.args[1]))
            elif len(s.args) == 2:
                t = t.has(s.args[0], s.args[1])
            else:
                raise GremlinParseError("has(prop, value) takes 2 arguments")
        elif s.name == "hasLabel":
            t = t.hasLabel(*s.args)
        elif s.name in ("out", "in", "both", "outE", "inE", "bothE"):
            t = getattr(t, method)(*s.args)
        elif s.name in ("inV", "outV", "bothV", "otherV", "dedup", "simplePath", "path"):
            t = getattr(t, s.name)()
        elif s.name == "identity":
            pass
        elif s.name == "cache":
            t = t.cache()
        elif s.name == "withSack":
            t = t.withSack(s.args[0])
        elif s.name == "sack":
            # terminal sack() / sack().by(key[, agg]) — grouped emission
            if nxt is not None and nxt.name == "by":
                by_key = nxt.args[0]
                agg = nxt.args[1] if len(nxt.args) > 1 else "sum"
                i += 1
                t = t.sack(by=by_key, agg=agg)
            else:
                t = t.sack()
        elif s.name == "sackBy":
            if len(s.args) > 1:
                t = t.sackBy(s.args[0], op=s.args[1])
            else:
                t = t.sackBy(s.args[0])
        elif s.name in ("values", "valueMap", "properties"):
            t = getattr(t, s.name)(*s.args)
        elif s.name == "count":
            t = t.count()
        elif s.name in ("sum", "max", "min"):
            t = getattr(t, s.name + "_")(s.args[0])
        elif s.name == "mean":
            t = t.mean(s.args[0])
        elif s.name == "fold":
            t = t.fold(*s.args)
        elif s.name == "as":
            t = t.as_(s.args[0])
        elif s.name == "select":
            # mid-chain single-tag select keeps traversing; terminal select
            # (possibly multi-tag) returns the tag table
            if last:
                t = t.select(*s.args)
            else:
                if len(s.args) != 1:
                    raise GremlinParseError(
                        "mid-traversal select() takes exactly one tag"
                    )
                t = t.select_(s.args[0])
        elif s.name == "where":
            a = s.args[0]
            if isinstance(a, _Pred) and len(a.args) == 1 and isinstance(a.args[0], str):
                # where(P.eq('a')): compare current element id to tag 'a'
                t = t.where(_where_tag(a))
            elif isinstance(a, _Anon):
                # where(__.out('x')): existential filter by sub-traversal
                t = t.filter_(_anon_body(a, text))
            else:
                raise GremlinParseError(
                    "where() takes P.eq/neq('tag') or a sub-traversal; "
                    "use not() for the negated-traversal form"
                )
        elif s.name == "choose":
            if len(s.args) not in (2, 3):
                raise GremlinParseError(
                    "choose() takes (predicate, trueBranch[, falseBranch])"
                )
            pred = _anon_body(s.args[0], text)
            tb = _anon_body(s.args[1], text)
            fb = _anon_body(s.args[2], text) if len(s.args) == 3 else None
            t = t.choose_traversal(pred, tb, fb)
        elif s.name == "match":
            t = t.match(*[_match_pattern(a, text) for a in s.args])
        elif s.name == "union":
            branches = [_anon_body(a, text) for a in s.args]
            t = t.union(*branches)
        elif s.name == "not":
            t = t.not_(_anon_body(s.args[0], text))
        elif s.name == "optional":
            if len(s.args) != 1:
                raise GremlinParseError("optional() takes exactly one sub-traversal")
            t = t.optional(_anon_body(s.args[0], text))
        elif s.name == "coalesce":
            if not s.args:
                raise GremlinParseError("coalesce() needs at least one sub-traversal")
            t = t.coalesce(*[_anon_body(a, text) for a in s.args])
        elif s.name == "and":
            if not s.args:
                raise GremlinParseError("and() needs at least one sub-traversal")
            t = t.and_(*[_anon_body(a, text) for a in s.args])
        elif s.name == "or":
            if not s.args:
                raise GremlinParseError("or() needs at least one sub-traversal")
            t = t.or_(*[_anon_body(a, text) for a in s.args])
        elif s.name == "limit":
            t = t.limit(int(s.args[0]))
        elif s.name == "range":
            t = t.range_(int(s.args[0]), int(s.args[1]))
        elif s.name == "sample":
            t = t.sample(int(s.args[0]))
        elif s.name in ("aggregate", "store"):
            if len(s.args) != 1 or not isinstance(s.args[0], str):
                raise GremlinParseError(f"{s.name}() takes one collection name")
            t = getattr(t, s.name)(s.args[0])
        elif s.name == "cap":
            if len(s.args) != 1 or not isinstance(s.args[0], str):
                raise GremlinParseError("cap() takes one collection name")
            t = t.cap(s.args[0])
        elif s.name == "barrier":
            t = t.barrier()
        elif s.name == "constant":
            t = t.constant(s.args[0])
        # ---- traversal-embedded vertex programs (terminal; TinkerPop's
        # g.V().outE().pageRank() text forms — the *TreeNode VP family).
        # Each requires an edge frontier exactly like the fluent step.
        elif s.name == "pageRank":
            t = t.page_rank(*s.args)
        elif s.name == "connectedComponent":
            t = t.connected_component()
        elif s.name == "labelPropagation":
            t = t.label_propagation(*[int(a) for a in s.args])
        elif s.name == "peerPressure":
            t = t.peer_pressure(*[int(a) for a in s.args])
        elif s.name == "shortestPath":
            if len(s.args) != 1 or not isinstance(s.args[0], str):
                raise GremlinParseError("shortestPath() takes one source oid")
            t = t.shortest_path(s.args[0])
        elif s.name == "allPath":
            if len(s.args) != 3:
                raise GremlinParseError("allPath() takes (sid, tid, khop)")
            t = t.all_path(s.args[0], s.args[1], int(s.args[2]))
        elif s.name == "id":
            t = t.id_()
        elif s.name == "label":
            t = t.label()
        elif s.name in ("times", "emit", "until", "by"):
            raise GremlinParseError(f"{s.name}() must follow the step it modulates")
        else:
            raise GremlinParseError(f"unsupported step {s.name!r}")
        i += 1
    return t


def _match_pattern(a, text: str):
    """``__.as('a').out('x').as('b')`` → the fluent match() triple
    ``('a', body, 'b')``: first and last steps must be as() bindings, the
    body between them is applied like any sub-traversal."""
    if not isinstance(a, _Anon) or len(a.steps) < 2:
        raise GremlinParseError(
            f"match() patterns must be __.as(start)...as(end) sub-traversals: {text!r}"
        )
    head, tail = a.steps[0], a.steps[-1]
    if head.name != "as" or tail.name != "as":
        raise GremlinParseError(
            f"match() pattern must start and end with as(tag): {text!r}"
        )
    mid = a.steps[1:-1]

    def body(t: Traversal) -> Traversal:
        r = _apply_chain(t, mid, text)
        if isinstance(r, DataFrame):
            raise GremlinParseError(
                f"match() pattern body must not end in a terminal step: {text!r}"
            )
        return r

    return (head.args[0], body, tail.args[0])


def _where_tag(p: _Pred):
    """where(P.eq('a')) / where(P.neq('a')) — current element vs tag."""
    t = p.args[0]
    if p.name == "eq":
        return F.col("oid") == tag(t)
    if p.name == "neq":
        return F.col("oid") != tag(t)
    raise GremlinParseError(f"where(P.{p.name}) unsupported — use eq/neq")


def _anon_body(a, text: str):
    if not isinstance(a, _Anon):
        raise GremlinParseError(f"expected a sub-traversal argument in {text!r}")

    def body(t: Traversal) -> Traversal:
        r = _apply_chain(t, a.steps, text)
        if isinstance(r, DataFrame):
            raise GremlinParseError(
                f"sub-traversal must not end in a terminal step: {text!r}"
            )
        return r

    return body


# ------------------------------------------------------------------ public

class GremlinSession:
    """``gremlin(pg).execute("g.V()...")`` — the reference's interactive
    session analog (graphscope.gremlin() → InteractiveQuery.execute,
    python/graphscope/interactive/query.py in the reference tree)."""

    def __init__(self, pg: PropertyGraph):
        self._g = traversal(pg)

    def execute(self, query: str) -> DataFrame:
        steps = _Parser(_lex(query), query).parse_query()
        src, rest = steps[0], steps[1:]
        if src.name not in ("V", "E"):
            raise GremlinParseError("traversal must start with g.V() or g.E()")
        t = self._g.V(*src.args) if src.name == "V" else self._g.E(*src.args)
        if _needs_path(rest):
            t = t.withPath()
        out = _apply_chain(t, rest, query)
        if isinstance(out, Traversal):
            # bare element frontier: return it as rows (Gremlin toList()),
            # without the internal tag/path bookkeeping columns
            keep = [c for c in out.df.columns if not c.startswith("__")]
            return out.df.select(*keep)
        return out


def gremlin(pg: PropertyGraph) -> GremlinSession:
    return GremlinSession(pg)
