"""CQL-subset compiler.

The reference delegates CQL→SQL to the folio cql-java library
(reference pom.xml:103-104) and defines only which fields are queryable
and how (ReservoirService.java:98-200, CqlFields.java:3-16, SURVEY.md
§2.2). We implement the used subset ourselves:

    cql.allRecords=true
    field = value            (text / uuid exact, numbers)
    field <> value, <, >, <=, >=   (numeric relations)
    term AND term, term OR term, NOT term, parentheses
    ... sortBy field[/sort.descending] [field ...]

The AST compiles two ways: to a Spark ``Column`` (the engine path) and
to an ANSI-SQL WHERE string (the DuckDB oracle path) — both from the
same parse, so the correctness gate exercises the parser itself.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame, functions as F


class CqlError(ValueError):
    pass


def bound(fields: dict, name: str) -> tuple[str, str]:
    """Resolve a binding value to (column, kind). A binding is either a
    plain column name (kind 'text') or a ('column', 'numeric') tuple.
    Typing literals per bound column matches the reference, where
    cql-java emits text comparisons for id-like PG text columns —
    'localId = 0001' must compare as the STRING '0001', not the int 1
    (ADVICE r1: the looks-numeric heuristic matched local_id '1' or
    threw under ANSI string↔int casts)."""
    v = fields[name]
    if isinstance(v, tuple):
        return v
    return (v, "text")


# ---------------------------------------------------------------- AST

@dataclass
class Node:
    def to_column(self, fields: dict[str, str]) -> Column:
        raise NotImplementedError

    def to_sql(self, fields: dict[str, str]) -> str:
        raise NotImplementedError


@dataclass
class AllRecords(Node):
    def to_column(self, fields):
        return F.lit(True)

    def to_sql(self, fields):
        return "TRUE"


@dataclass
class Term(Node):
    field: str
    op: str  # = <> < > <= >=
    value: str

    def _binding(self, fields: dict) -> tuple[str, str]:
        try:
            return bound(fields, self.field)
        except KeyError:
            raise CqlError(
                f"unsupported CQL field: {self.field!r} "
                f"(queryable: {sorted(fields)})"
            ) from None

    def _literal(self, kind: str):
        if kind != "numeric":
            return self.value
        if re.fullmatch(r"-?\d+(\.\d+)?", self.value):
            return float(self.value) if "." in self.value else int(self.value)
        raise CqlError(
            f"numeric field {self.field!r} compared to non-numeric "
            f"value {self.value!r}"
        )

    def to_column(self, fields):
        name, kind = self._binding(fields)
        col = F.col(name)
        lit = F.lit(self._literal(kind))
        return {
            "=": col == lit,
            "==": col == lit,
            "<>": col != lit,
            "<": col < lit,
            ">": col > lit,
            "<=": col <= lit,
            ">=": col >= lit,
        }[self.op]

    def to_sql(self, fields):
        name, kind = self._binding(fields)
        lit = self._literal(kind)
        if isinstance(lit, str):
            lit = "'" + lit.replace("'", "''") + "'"
        op = "=" if self.op == "==" else self.op
        return f"({name} {op} {lit})"


@dataclass
class BoolOp(Node):
    op: str  # AND | OR
    parts: list[Node] = dc_field(default_factory=list)

    def to_column(self, fields):
        out = self.parts[0].to_column(fields)
        for p in self.parts[1:]:
            out = (out & p.to_column(fields)) if self.op == "AND" else (
                out | p.to_column(fields)
            )
        return out

    def to_sql(self, fields):
        joiner = f" {self.op} "
        return "(" + joiner.join(p.to_sql(fields) for p in self.parts) + ")"


@dataclass
class NotOp(Node):
    part: Node

    def to_column(self, fields):
        return ~self.part.to_column(fields)

    def to_sql(self, fields):
        return f"(NOT {self.part.to_sql(fields)})"


@dataclass
class SortSpec:
    field: str
    descending: bool = False


@dataclass
class Query:
    where: Node
    sort: list[SortSpec] = dc_field(default_factory=list)

    def to_column(self, fields: dict[str, str]) -> Column:
        return self.where.to_column(fields)

    def to_sql(self, fields: dict[str, str]) -> str:
        return self.where.to_sql(fields)

    def order_by(self, fields: dict[str, str]) -> list[Column]:
        cols = []
        for s in self.sort:
            name = bound(fields, s.field)[0] if s.field in fields else s.field
            cols.append(F.col(name).desc() if s.descending else F.col(name).asc())
        return cols

    def order_by_sql(self, fields: dict[str, str]) -> str:
        parts = []
        for s in self.sort:
            name = bound(fields, s.field)[0] if s.field in fields else s.field
            parts.append(f"{name} DESC" if s.descending else f"{name} ASC")
        return ", ".join(parts)

    def apply(self, df: DataFrame, fields: dict[str, str]) -> DataFrame:
        out = df.filter(self.to_column(fields))
        ob = self.order_by(fields)
        return out.orderBy(*ob) if ob else out


# ------------------------------------------------------------- parser

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\()|(?P<rparen>\))|
        (?P<op><>|<=|>=|==|=|<|>)|
        (?P<quoted>"(?:[^"\\]|\\.)*")|
        (?P<word>[^\s()=<>"]+)
    )""",
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip():
                raise CqlError(f"cannot tokenize CQL at: {text[pos:]!r}")
            break
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "quoted":
            val = re.sub(r"\\(.)", r"\1", val[1:-1])
        out.append((kind, val))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse_or(self) -> Node:
        left = self.parse_and()
        parts = [left]
        while self.peek()[0] == "word" and self.peek()[1].upper() == "OR":
            self.next()
            parts.append(self.parse_and())
        return parts[0] if len(parts) == 1 else BoolOp("OR", parts)

    def parse_and(self) -> Node:
        parts = [self.parse_not()]
        while self.peek()[0] == "word" and self.peek()[1].upper() == "AND":
            self.next()
            parts.append(self.parse_not())
        return parts[0] if len(parts) == 1 else BoolOp("AND", parts)

    def parse_not(self) -> Node:
        if self.peek()[0] == "word" and self.peek()[1].upper() == "NOT":
            self.next()
            return NotOp(self.parse_not())
        return self.parse_atom()

    def parse_atom(self) -> Node:
        kind, val = self.next()
        if kind == "lparen":
            node = self.parse_or()
            if self.next()[0] != "rparen":
                raise CqlError("missing )")
            return node
        if kind in ("word", "quoted"):
            fieldname = val
            kind2, op = self.peek()
            if kind2 != "op":
                raise CqlError(f"expected relation after field {fieldname!r}")
            self.next()
            kind3, value = self.next()
            if kind3 not in ("word", "quoted"):
                raise CqlError(f"expected value after {fieldname} {op}")
            if fieldname == "cql.allRecords":
                return AllRecords()
            return Term(fieldname, op, value)
        raise CqlError(f"unexpected token {val!r}")


def parse_cql(text: str | None) -> Query:
    """Parse a CQL string; None/empty means all records."""
    if not text or not text.strip():
        return Query(AllRecords())
    # split off the sortBy clause (CQL: "... sortBy f1 f2/sort.descending")
    m = re.search(r"\bsortBy\b", text, re.IGNORECASE)
    sort: list[SortSpec] = []
    if m:
        where_text, sort_text = text[: m.start()], text[m.end():]
        for tok in sort_text.split():
            parts = tok.split("/")
            desc = any(p.lower() == "sort.descending" for p in parts[1:])
            sort.append(SortSpec(parts[0], desc))
    else:
        where_text = text
    if not where_text.strip():
        node: Node = AllRecords()
    else:
        p = _Parser(_tokenize(where_text))
        node = p.parse_or()
        if p.peek()[0] is not None:
            raise CqlError(f"trailing tokens: {p.toks[p.i:]}")
    return Query(node, sort)
