"""Lucene-subset ``query_string`` parser (the mini-language the reference
ships to Elasticsearch verbatim — /root/reference/app/helpers/es.py:238-250;
grammar constructs observed across use_cases/examples/*.conf and
documentation/CONFIG_OUTLIERS.md:40-43):

    bare terms            → full-text match on the indexed text (BM25-scored)
    "quoted phrase"       → phrase match
    field:value           → exact match on a column (`.keyword` semantics)
    field:"some phrase"   → exact match, quoted value
    _exists_:field        → field is not null
    AND / OR / NOT / -    → boolean composition; parentheses group
    adjacency             → default operator (OR, like ES query_string)

The AST compiles three ways, all semantically identical:
- ``to_spark_predicate`` — a Spark ``Column`` boolean (filter context, no
  scoring — ref F1 "bool.filter", es.py:664-710),
- ``to_duckdb_sql``     — the DuckDB oracle predicate,
- ``collect_text_terms``— the bag of scored full-text terms/phrases for the
  BM25 top-k path (scoring only applies to text clauses, like ES).

Field resolution is case-insensitive with ``.keyword`` stripped
(ref X8, app/helpers/utils.py:47-76 resolves dotted keys case-insensitively).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from .tokenizer import phrase_regex, tokenize_py


# --- AST ----------------------------------------------------------------------

@dataclass
class Term:
    text: str


@dataclass
class Phrase:
    text: str


@dataclass
class FieldEq:
    field: str
    value: str


@dataclass
class Exists:
    field: str


@dataclass
class And:
    parts: list


@dataclass
class Or:
    parts: list


@dataclass
class Not:
    part: object


# --- lexer ---------------------------------------------------------------------

_TOKEN_SPEC = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<quoted>"(?P<qbody>[^"]*)") |
        (?P<neg>-) |
        (?P<word>[^\s()":]+) |
        (?P<colon>:)
    )""",
    re.VERBOSE,
)


def _lex(s: str) -> list[tuple[str, str]]:
    out = []
    i = 0
    while i < len(s):
        m = _TOKEN_SPEC.match(s, i)
        if not m:
            raise ValueError(f"query_string lex error at {i}: {s[i:]!r}")
        i = m.end()
        if m.lastgroup is None:
            continue
        for g in ("lparen", "rparen", "neg", "word", "colon"):
            if m.group(g):
                out.append((g, m.group(g)))
                break
        else:
            if m.group("quoted") is not None:
                out.append(("quoted", m.group("qbody")))
    return out


# --- parser (recursive descent) -------------------------------------------------

class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        node = self.or_expr()
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return node

    def or_expr(self):
        parts = [self.and_expr()]
        while True:
            kind, val = self.peek()
            if kind == "word" and val.upper() == "OR":
                self.take()
                parts.append(self.and_expr())
            elif kind in ("lparen", "quoted", "neg", "word") and not (
                kind == "word" and val.upper() in ("AND", "OR", "NOT")
            ):
                # adjacency → default operator OR (ES query_string default)
                parts.append(self.and_expr())
            else:
                break
        return parts[0] if len(parts) == 1 else Or(parts)

    def and_expr(self):
        parts = [self.unary()]
        while True:
            kind, val = self.peek()
            if kind == "word" and val.upper() == "AND":
                self.take()
                parts.append(self.unary())
            else:
                break
        return parts[0] if len(parts) == 1 else And(parts)

    def unary(self):
        kind, val = self.peek()
        if kind == "neg" or (kind == "word" and val.upper() == "NOT"):
            self.take()
            return Not(self.unary())
        return self.atom()

    def atom(self):
        kind, val = self.take()
        if kind == "lparen":
            node = self.or_expr()
            k2, _ = self.take()
            if k2 != "rparen":
                raise ValueError("unbalanced parentheses")
            return node
        if kind == "quoted":
            return Phrase(val)
        if kind == "word":
            nk, _ = self.peek()
            if nk == "colon":
                self.take()
                vk, vv = self.take()
                if vk == "quoted":
                    if val == "_exists_":
                        return Exists(vv)
                    return FieldEq(val, vv)
                if vk == "word":
                    if val == "_exists_":
                        return Exists(vv)
                    return FieldEq(val, vv)
                raise ValueError(f"bad field value after {val}:")
            return Term(val)
        raise ValueError(f"unexpected token {kind}:{val}")


def parse_query_string(s: str):
    toks = _lex(s)
    if not toks:
        raise ValueError("empty query_string")
    return _Parser(toks).parse()


# --- compilers -------------------------------------------------------------------

_NUM_RE = re.compile(r"^-?\d+(\.\d+)?$")


def _resolve_field(field: str, columns: list[str]) -> str:
    """Case-insensitive resolution; `.keyword` suffix stripped (ref X8)."""
    base = field[: -len(".keyword")] if field.endswith(".keyword") else field
    for c in columns:
        if c.lower() == base.lower():
            return c
    raise KeyError(f"field {field!r} not in schema {columns}")


def _term_regex(term: str) -> str:
    toks = tokenize_py(term)
    if not toks:
        return "$^"  # matches nothing
    return phrase_regex(toks)


def to_spark_predicate(node, text_col: str, columns: list[str]) -> Column:
    """Boolean filter-context compilation (no scoring)."""
    if isinstance(node, Term):
        return F.lower(F.col(text_col)).rlike(_term_regex(node.text))
    if isinstance(node, Phrase):
        toks = tokenize_py(node.text)
        if not toks:  # empty phrase "" matches nothing
            return F.lit(False)
        return F.lower(F.col(text_col)).rlike(phrase_regex(toks))
    if isinstance(node, FieldEq):
        c = F.col(_resolve_field(node.field, columns))
        if _NUM_RE.match(node.value):
            return c == F.lit(float(node.value)) if "." in node.value else c == F.lit(int(node.value))
        return c == F.lit(node.value)
    if isinstance(node, Exists):
        return F.col(_resolve_field(node.field, columns)).isNotNull()
    if isinstance(node, And):
        out = to_spark_predicate(node.parts[0], text_col, columns)
        for p in node.parts[1:]:
            out = out & to_spark_predicate(p, text_col, columns)
        return out
    if isinstance(node, Or):
        out = to_spark_predicate(node.parts[0], text_col, columns)
        for p in node.parts[1:]:
            out = out | to_spark_predicate(p, text_col, columns)
        return out
    if isinstance(node, Not):
        return ~to_spark_predicate(node.part, text_col, columns)
    raise TypeError(node)


def to_duckdb_sql(node, text_col: str, columns: list[str]) -> str:
    """Same predicate as ANSI/DuckDB SQL (the correctness oracle)."""
    if isinstance(node, Term):
        return f"regexp_matches(lower({text_col}), '{_term_regex(node.text)}')"
    if isinstance(node, Phrase):
        toks = tokenize_py(node.text)
        if not toks:
            return "FALSE"
        rx = phrase_regex(toks)
        return f"regexp_matches(lower({text_col}), '{rx}')"
    if isinstance(node, FieldEq):
        c = _resolve_field(node.field, columns)
        if _NUM_RE.match(node.value):
            return f"{c} = {node.value}"
        v = node.value.replace("'", "''")
        return f"{c} = '{v}'"
    if isinstance(node, Exists):
        return f"{_resolve_field(node.field, columns)} IS NOT NULL"
    if isinstance(node, And):
        return "(" + " AND ".join(to_duckdb_sql(p, text_col, columns) for p in node.parts) + ")"
    if isinstance(node, Or):
        return "(" + " OR ".join(to_duckdb_sql(p, text_col, columns) for p in node.parts) + ")"
    if isinstance(node, Not):
        return f"(NOT {to_duckdb_sql(node.part, text_col, columns)})"
    raise TypeError(node)


def to_python_predicate(node, text_col: str, columns: list[str]):
    """Oracle-side compilation: row dict → bool (pure Python)."""
    if isinstance(node, Term):
        rx = re.compile(_term_regex(node.text))
        return lambda row: row.get(text_col) is not None and bool(
            rx.search(str(row[text_col]).lower())
        )
    if isinstance(node, Phrase):
        toks = tokenize_py(node.text)
        if not toks:
            return lambda row: False
        rx = re.compile(phrase_regex(toks))
        return lambda row: row.get(text_col) is not None and bool(
            rx.search(str(row[text_col]).lower())
        )
    if isinstance(node, FieldEq):
        c = _resolve_field(node.field, columns)
        if _NUM_RE.match(node.value):
            want = float(node.value)
            return lambda row: row.get(c) is not None and float(row[c]) == want
        return lambda row: row.get(c) == node.value
    if isinstance(node, Exists):
        c = _resolve_field(node.field, columns)
        return lambda row: row.get(c) is not None
    if isinstance(node, And):
        fs = [to_python_predicate(p, text_col, columns) for p in node.parts]
        return lambda row: all(f(row) for f in fs)
    if isinstance(node, Or):
        fs = [to_python_predicate(p, text_col, columns) for p in node.parts]
        return lambda row: any(f(row) for f in fs)
    if isinstance(node, Not):
        f = to_python_predicate(node.part, text_col, columns)
        return lambda row: not f(row)
    raise TypeError(node)


def collect_text_terms(node) -> tuple[list[str], list[str]]:
    """(positive bare terms, positive phrases) for BM25 scoring — negated and
    field clauses contribute filtering only, like ES filter context."""
    terms: list[str] = []
    phrases: list[str] = []

    def walk(n, neg: bool):
        if isinstance(n, Term) and not neg:
            terms.extend(tokenize_py(n.text))
        elif isinstance(n, Phrase) and not neg:
            phrases.append(n.text)
        elif isinstance(n, (And, Or)):
            for p in n.parts:
                walk(p, neg)
        elif isinstance(n, Not):
            walk(n.part, not neg)

    walk(node, False)
    return terms, phrases
