"""Tokenizer-based three-part-name rewriting for :meth:`UCClient.sql`.

The reference hands SQL text verbatim to DuckDB with the Unity
Catalog ATTACHed (``/root/reference/uchelper/client.py:62-81`` and
``:537-544``), so ``FROM unity.default.t`` resolves natively.  This
engine runs on Spark without a catalog plugin on the classpath, so
``catalog.schema.table`` references are rewritten to registered temp
views instead.

A single-regex pass over the raw text can be fooled:

* a ``-- line comment`` containing an apostrophe (``-- don't``)
  makes naive string-literal masking swallow real query text;
* a dotted name inside a ``/* block comment */`` is data, not a
  table reference;
* Spark-style backtick identifiers (`` `my cat`.`sch`.`tbl` ``) and
  ANSI double-quoted identifiers must be unquoted, and quotes may
  contain dots that are not separators;
* ``a.b.c.d`` (a column of a three-part table) must not have its
  ``a.b.c`` prefix rewritten.

This module lexes the query with a small SQL tokenizer (string
literals with ``''`` escapes, line and block comments, double-quote
and backtick quoted identifiers with doubled-quote escapes) and
rewrites only *maximal* identifier chains of exactly three parts,
optionally followed by ``VERSION AS OF <n>`` or ``TIMESTAMP AS OF
'<ts>'`` for time travel.
"""

from __future__ import annotations

import re
from typing import Callable, List, NamedTuple, Optional


class Token(NamedTuple):
    kind: str  # ws | comment | string | dquote | bquote | word | number | punct
    text: str
    start: int
    end: int


_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<comment>--[^\n]* | /\*(?:[^*]|\*(?!/))*\*/)
    | (?P<string>'(?:[^']|'')*')
    | (?P<dquote>"(?:[^"]|"")*")
    | (?P<bquote>`(?:[^`]|``)*`)
    | (?P<word>[A-Za-z_][\w$]*)
    | (?P<number>\d[\w.]*)
    | (?P<punct>.)
    """,
    re.VERBOSE | re.DOTALL,
)

_IDENT_KINDS = frozenset({"word", "dquote", "bquote"})


def tokenize(sql: str) -> List[Token]:
    """Lex ``sql`` into a lossless token stream (concat == input).

    Unterminated strings/quotes degrade gracefully: the opening
    quote lexes as ``punct`` and the rest as ordinary tokens, which
    matches "leave it alone and let Spark raise" behavior downstream.
    """
    return [
        Token(m.lastgroup or "punct", m.group(0), m.start(), m.end())
        for m in _TOKEN_RE.finditer(sql)
    ]


def unquote(tok: Token) -> str:
    """Identifier token -> its bare name."""
    if tok.kind == "dquote":
        return tok.text[1:-1].replace('""', '"')
    if tok.kind == "bquote":
        return tok.text[1:-1].replace("``", "`")
    return tok.text


# resolve(catalog, schema, table, version, timestamp) -> replacement
# text, or None to leave the reference untouched (unknown table:
# parity with the reference, where DuckDB raises on unknown names at
# execution). ``version``/``timestamp`` are mutually exclusive time
# travel (VERSION AS OF n / TIMESTAMP AS OF 'ts').
Resolver = Callable[
    [str, str, str, Optional[int], Optional[str]], Optional[str]
]


def rewrite_three_part_names(
    sql: str,
    resolve: Resolver,
    resolve_meta: Optional[Callable] = None,
) -> str:
    """Rewrite every standalone ``cat.sch.tbl [VERSION AS OF n |
    TIMESTAMP AS OF 'ts']``.

    Chains are matched on *significant* tokens, so whitespace and
    comments are permitted around the dots (``cat . sch/*x*/. tbl``
    is one name). Comments, string literals, and quoted-identifier
    contents are never mistaken for references.

    ``resolve_meta`` (optional) handles FOUR-part chains
    ``cat.sch.tbl.kind [VERSION AS OF n]`` — iceberg-spark's
    metadata-table references (``db.table.files`` etc.). It may
    return None to leave the chain untouched (4-part chains were
    never rewritten before, so unknown kinds keep their old
    behavior).
    """
    tokens = tokenize(sql)
    sig = [i for i, t in enumerate(tokens) if t.kind not in ("ws", "comment")]

    def sig_tok(si: int) -> Optional[Token]:
        return tokens[sig[si]] if 0 <= si < len(sig) else None

    out: List[str] = []
    consumed_until = 0  # index into `tokens`
    si = 0
    while si < len(sig):
        tok = sig_tok(si)
        assert tok is not None
        if tok.kind not in _IDENT_KINDS:
            si += 1
            continue
        # Maximal chain ident (. ident)* starting here; a preceding
        # dot means we are mid-chain of a longer name — skip ahead.
        prev = sig_tok(si - 1)
        if prev is not None and prev.text == ".":
            si += 1
            continue
        chain = [si]
        j = si
        while True:
            dot = sig_tok(j + 1)
            nxt = sig_tok(j + 2)
            if dot is not None and dot.text == "." and nxt is not None and nxt.kind in _IDENT_KINDS:
                chain.append(j + 2)
                j += 2
            else:
                break
        if len(chain) == 3:
            cat, sch, tbl = (unquote(tokens[sig[c]]) for c in chain)
            # optional VERSION AS OF <int> / TIMESTAMP AS OF '<ts>'
            version: Optional[int] = None
            timestamp: Optional[str] = None
            end_si = chain[-1]
            v1, v2, v3, v4 = (sig_tok(j + k) for k in (1, 2, 3, 4))
            as_of = (
                v1 is not None and v1.kind == "word"
                and v2 is not None and v2.kind == "word" and v2.text.upper() == "AS"
                and v3 is not None and v3.kind == "word" and v3.text.upper() == "OF"
                and v4 is not None
            )
            if (
                as_of and v1.text.upper() == "VERSION"
                and v4.kind == "number" and v4.text.isdigit()
            ):
                version = int(v4.text)
                end_si = j + 4
            elif (
                as_of and v1.text.upper() == "TIMESTAMP"
                and v4.kind == "string"
            ):
                timestamp = v4.text[1:-1].replace("''", "'")
                end_si = j + 4
            replacement = resolve(cat, sch, tbl, version, timestamp)
            if replacement is not None:
                first_ti = sig[chain[0]]
                last_ti = sig[end_si]
                out.append(
                    "".join(t.text for t in tokens[consumed_until:first_ti])
                )
                out.append(replacement)
                consumed_until = last_ti + 1
                si = end_si + 1
                continue
        elif len(chain) == 4 and resolve_meta is not None:
            cat, sch, tbl, kind = (
                unquote(tokens[sig[c]]) for c in chain
            )
            version = None
            end_si = chain[-1]
            v1, v2, v3, v4 = (sig_tok(j + k) for k in (1, 2, 3, 4))
            if (
                v1 is not None and v1.kind == "word"
                and v1.text.upper() == "VERSION"
                and v2 is not None and v2.kind == "word"
                and v2.text.upper() == "AS"
                and v3 is not None and v3.kind == "word"
                and v3.text.upper() == "OF"
                and v4 is not None and v4.kind == "number"
                and v4.text.isdigit()
            ):
                version = int(v4.text)
                end_si = j + 4
            replacement = resolve_meta(cat, sch, tbl, kind, version)
            if replacement is not None:
                first_ti = sig[chain[0]]
                last_ti = sig[end_si]
                out.append(
                    "".join(t.text for t in tokens[consumed_until:first_ti])
                )
                out.append(replacement)
                consumed_until = last_ti + 1
                si = end_si + 1
                continue
        si = chain[-1] + 1
    out.append("".join(t.text for t in tokens[consumed_until:]))
    return "".join(out)


def find_top_level_keyword(sql: str, keyword: str) -> int:
    """Offset of the first ``keyword`` word token at paren depth 0
    (outside strings/comments/quotes), or -1. Case-insensitive."""
    depth = 0
    for t in tokenize(sql):
        if t.kind == "punct":
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
        elif t.kind == "word" and depth == 0 and t.text.upper() == keyword.upper():
            return t.start
    return -1


def split_top_level(sql: str, sep: str = ",") -> List[str]:
    """Split on ``sep`` punct tokens at paren depth 0 — commas inside
    function calls, strings, or comments never split."""
    depth = 0
    parts: List[str] = []
    last = 0
    for t in tokenize(sql):
        if t.kind != "punct":
            continue
        if t.text == "(":
            depth += 1
        elif t.text == ")":
            depth -= 1
        elif t.text == sep and depth == 0:
            parts.append(sql[last : t.start])
            last = t.end
    parts.append(sql[last:])
    return parts


def strip_leading_trivia(sql: str) -> str:
    """Drop leading whitespace/comments so statement-verb dispatch
    (INSERT / CREATE TABLE AS) sees the first significant token."""
    for t in tokenize(sql):
        if t.kind not in ("ws", "comment"):
            return sql[t.start:]
    return ""


def find_all_top_level_keyword(sql: str, keyword: str) -> List[int]:
    """All offsets of ``keyword`` word tokens at paren depth 0
    (outside strings/comments/quotes). Case-insensitive."""
    depth = 0
    out: List[int] = []
    for t in tokenize(sql):
        if t.kind == "punct":
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
        elif (
            t.kind == "word" and depth == 0
            and t.text.upper() == keyword.upper()
        ):
            out.append(t.start)
    return out
