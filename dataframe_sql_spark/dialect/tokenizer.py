"""Minimal SQL tokenizer for the dialect shim.

Produces a flat token stream that preserves original text (needed for
the reference's "output column named as typed in the query" behavior,
see /root/reference/dataframe_sql/tests/pandas_sql_functionality_test.py:487-494).
Tokens are rejoined with single spaces, which is valid SQL for every
construct we emit.
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = ["Token", "tokenize", "detokenize"]

_PUNCT = set("(),.;")
# multi-char operators first so `<=` doesn't split into `<` `=`
_OPERATORS = ["->", "<>", "!=", ">=", "<=", "||", "=", ">", "<", "+", "-", "*", "/", "%"]


@dataclass
class Token:
    kind: str  # 'ident' | 'number' | 'string' | 'qident' | 'op' | 'punct' | 'hint'
    text: str

    def lower(self) -> str:
        return self.text.lower()

    def is_kw(self, *words: str) -> bool:
        return self.kind == "ident" and self.text.lower() in words


def tokenize(sql: str) -> list[Token]:
    tokens: list[Token] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c.isspace():
            i += 1
            continue
        if c == "-" and i + 1 < n and sql[i + 1] == "-":  # line comment
            j = sql.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "/" and i + 1 < n and sql[i + 1] == "*":  # block comment
            j = sql.find("*/", i + 2)
            end = n if j < 0 else j + 2
            if i + 2 < n and sql[i + 2] == "+":
                # optimizer hint /*+ ... */ — semantic, must survive
                tokens.append(Token("hint", sql[i:end]))
            i = end
            continue
        if c == "'":  # string literal, '' escape
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            tokens.append(Token("string", sql[i : j + 1]))
            i = j + 1
            continue
        if c in ('"', "`"):  # quoted identifier
            close = c
            j = sql.find(close, i + 1)
            j = n - 1 if j < 0 else j
            inner = sql[i + 1 : j]
            tokens.append(Token("qident", f"`{inner}`"))
            i = j + 1
            continue
        if c.isdigit() or (c == "." and i + 1 < n and sql[i + 1].isdigit()):
            j = i
            seen_dot = False
            while j < n and (sql[j].isdigit() or (sql[j] == "." and not seen_dot)):
                seen_dot = seen_dot or sql[j] == "."
                j += 1
            if j < n and sql[j] in "eE":  # exponent
                k = j + 1
                if k < n and sql[k] in "+-":
                    k += 1
                if k < n and sql[k].isdigit():
                    j = k
                    while j < n and sql[j].isdigit():
                        j += 1
            tokens.append(Token("number", sql[i:j]))
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            tokens.append(Token("ident", sql[i:j]))
            i = j
            continue
        matched = False
        for op in _OPERATORS:
            if sql.startswith(op, i):
                tokens.append(Token("op", op))
                i += len(op)
                matched = True
                break
        if matched:
            continue
        if c in _PUNCT:
            tokens.append(Token("punct", c))
            i += 1
            continue
        # unknown char: pass through as op so nothing is silently dropped
        tokens.append(Token("op", c))
        i += 1
    return tokens


def detokenize(tokens: list[Token]) -> str:
    """Rejoin tokens into SQL. Keeps `a . b` and `f ( x )` forms, which
    Spark SQL parses identically to the compact spellings."""
    out: list[str] = []
    for idx, tok in enumerate(tokens):
        if idx and _needs_space(tokens[idx - 1], tok):
            out.append(" ")
        out.append(tok.text)
    return "".join(out)


def _needs_space(prev: Token, cur: Token) -> bool:
    if prev.text == "." or cur.text == ".":
        return False
    if cur.text in (",", ")", ";"):
        return False
    if prev.text == "(":
        return False
    return True
