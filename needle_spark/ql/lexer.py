"""NeedleQL lexer (reference: /root/reference/src/search/query_lang/
lexer.rs — keyword set at :404-436, token shapes throughout).

Token kinds: KEYWORD, IDENT, NUMBER, STRING ('...'), PARAM ($name),
OP (= != < <= > >=), PUNCT ( ( ) , * ; ), EOF.
"""

from __future__ import annotations

from dataclasses import dataclass

KEYWORDS = {
    "SELECT", "FROM", "WHERE", "AND", "OR", "NOT", "IN", "LIKE", "BETWEEN",
    "IS", "NULL", "LIMIT", "OFFSET", "ORDER", "BY", "ASC", "DESC",
    "SIMILAR", "TO", "EXPLAIN", "ANALYZE", "WITH", "USING", "RAG",
    "RERANK", "SEARCH", "NEAR", "TIME_DECAY", "MATCH", "AS", "OF",
    "INSERT", "INTO", "VALUES", "DELETE", "CREATE", "DROP", "SHOW",
    "COLLECTION", "COLLECTIONS", "VIEW", "MATERIALIZED", "TRUE", "FALSE",
}


class LexError(ValueError):
    pass


@dataclass
class Token:
    kind: str   # KEYWORD | IDENT | NUMBER | STRING | PARAM | OP | PUNCT | EOF
    value: str
    pos: int

    def is_kw(self, *kws: str) -> bool:
        return self.kind == "KEYWORD" and self.value in kws


def tokenize(text: str) -> list[Token]:
    out: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if c == "-" and i + 1 < n and text[i + 1] == "-":  # comment
            while i < n and text[i] != "\n":
                i += 1
            continue
        if c == "'":
            j = i + 1
            buf = []
            while j < n:
                if text[j] == "'":
                    if j + 1 < n and text[j + 1] == "'":  # escaped ''
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(text[j])
                j += 1
            else:
                raise LexError(f"unterminated string at {i}")
            out.append(Token("STRING", "".join(buf), i))
            i = j + 1
            continue
        if c == "$":
            j = i + 1
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            if j == i + 1:
                raise LexError(f"empty parameter name at {i}")
            out.append(Token("PARAM", text[i + 1:j], i))
            i = j
            continue
        if c.isdigit() or (c in "+-" and i + 1 < n and text[i + 1].isdigit()):
            j = i + 1
            while j < n and (text[j].isdigit() or text[j] in ".eE" or
                             (text[j] in "+-" and text[j - 1] in "eE")):
                j += 1
            out.append(Token("NUMBER", text[i:j], i))
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (text[j].isalnum() or text[j] in "_."):
                j += 1
            word = text[i:j]
            up = word.upper()
            if up in KEYWORDS:
                out.append(Token("KEYWORD", up, i))
            else:
                out.append(Token("IDENT", word, i))
            i = j
            continue
        if c in "!<>=":
            two = text[i:i + 2]
            if two in ("!=", "<=", ">=", "<>"):
                out.append(Token("OP", "!=" if two == "<>" else two, i))
                i += 2
                continue
            if c == "!":
                raise LexError(f"unexpected '!' at {i}")
            out.append(Token("OP", c, i))
            i += 1
            continue
        if c in "(),*;":
            out.append(Token("PUNCT", c, i))
            i += 1
            continue
        raise LexError(f"unexpected character {c!r} at {i}")
    out.append(Token("EOF", "", n))
    return out
