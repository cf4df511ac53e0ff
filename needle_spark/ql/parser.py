"""NeedleQL recursive-descent parser (reference: /root/reference/src/
search/query_lang/parser.rs; statement dispatch needleql_executor.rs:
412-609; grammar docs/needleql.md 'Grammar (Simplified BNF)').

Precedence: OR < AND < NOT < primary — metadata.rs:719-730 semantics.
"""

from __future__ import annotations

from needle_spark.ql import ast
from needle_spark.ql.lexer import Token, tokenize


class ParseError(ValueError):
    pass


def _num_from_token(t: Token, as_int: bool = False):
    """NUMBER token -> int/float, with malformed numerics (the lexer
    accepts bare-exponent prefixes like `5E`) surfaced as ParseError —
    the ONE conversion shared by LIMIT/OFFSET/mmr-lambda/literals."""
    try:
        if as_int:
            return int(t.value)
        return float(t.value) if any(ch in t.value for ch in ".eE") \
            else int(t.value)
    except ValueError:
        raise ParseError(
            f"malformed number {t.value!r} at {t.pos}") from None


class Parser:
    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0
        self.script = False  # parse_script: ';' separates statements

    # ------------------------------------------------------- helpers --
    def peek(self) -> Token:
        return self.toks[self.i]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_kw(self, *kws: str) -> Token:
        t = self.next()
        if not t.is_kw(*kws):
            raise ParseError(f"expected {'/'.join(kws)}, got {t.value!r} at {t.pos}")
        return t

    def accept_kw(self, *kws: str) -> bool:
        if self.peek().is_kw(*kws):
            self.i += 1
            return True
        return False

    def expect(self, kind: str, value: str | None = None) -> Token:
        t = self.next()
        if t.kind != kind or (value is not None and t.value != value):
            raise ParseError(f"expected {value or kind}, got {t.value!r} at {t.pos}")
        return t

    def number(self, as_int: bool = False):
        """Expect a NUMBER token and convert it, surfacing malformed
        numerics (e.g. a bare exponent like `5E`, which the lexer
        accepts as a NUMBER prefix) as ParseError rather than a raw
        ValueError — fuzz finding, round 6."""
        return _num_from_token(self.expect("NUMBER"), as_int=as_int)

    def ident(self) -> str:
        t = self.next()
        if t.kind == "IDENT":
            return t.value
        # soft keywords usable as identifiers (e.g. a column named "view")
        if t.kind == "KEYWORD" and t.value in ("COLLECTION", "VIEW", "SEARCH", "MATCH"):
            return t.value.lower()
        raise ParseError(f"expected identifier, got {t.value!r} at {t.pos}")

    # ----------------------------------------------------- statements --
    def parse_statement(self):
        t = self.peek()
        if t.is_kw("EXPLAIN"):
            self.next()
            analyze = self.accept_kw("ANALYZE")
            stmt = self.parse_select()
            stmt.explain, stmt.analyze = True, analyze
            return stmt
        if t.is_kw("SELECT"):
            return self.parse_select()
        if t.is_kw("INSERT"):
            return self.parse_insert()
        if t.is_kw("DELETE"):
            return self.parse_delete()
        if t.is_kw("CREATE"):
            return self.parse_create()
        if t.is_kw("DROP"):
            return self.parse_drop()
        if t.is_kw("SHOW"):
            self.next()
            self.expect_kw("COLLECTIONS")
            self._end()
            return ast.ShowCollectionsStmt()
        if t.is_kw("SEARCH"):
            return self.parse_search_near()
        raise ParseError(f"unexpected statement start: {t.value!r}")

    def parse_search_near(self) -> ast.SelectStmt:
        """SEARCH NEAR $query FROM coll [WHERE ...] [RERANK BY ...]
        [LIMIT n] — sugar for SELECT * ... WHERE vector SIMILAR TO $query
        (parser.rs:158-162)."""
        self.expect_kw("SEARCH")
        self.expect_kw("NEAR")
        param = self.expect("PARAM").value
        self.expect_kw("FROM")
        collection = self.ident()
        stmt = ast.SelectStmt(columns=None, collection=collection)
        similar = ast.SimilarTo(column="vector", param=param)
        if self.accept_kw("WHERE"):
            stmt.where = ast.And(similar, self._or_expr())
        else:
            stmt.where = similar
        if self.accept_kw("RERANK"):
            self.expect_kw("BY")
            stmt.rerank = self._rerank_target()
        if self.accept_kw("LIMIT"):
            stmt.limit = self.number(as_int=True)
        self._end()
        return stmt

    def _rerank_target(self) -> ast.RerankBy:
        name = self.ident()
        if name.lower() == "mmr":
            lam = 0.5
            if self.peek().kind == "PUNCT" and self.peek().value == "(":
                self.next()
                lam = float(self.number())
                self.expect("PUNCT", ")")
            return ast.RerankBy(field="mmr", mode="mmr", mmr_lambda=lam)
        desc = True
        if self.accept_kw("ASC"):
            desc = False
        elif self.accept_kw("DESC"):
            desc = True
        return ast.RerankBy(field=name, descending=desc)

    def _end(self):
        if self.peek().kind == "PUNCT" and self.peek().value == ";":
            self.next()
            if self.script:
                return
        t = self.peek()
        if t.kind != "EOF" and not self.script:
            raise ParseError(f"trailing input at {t.pos}: {t.value!r}")

    # --------------------------------------------------------- SELECT --
    def parse_select(self) -> ast.SelectStmt:
        self.expect_kw("SELECT")
        cols: list[str] | None
        if self.peek().kind == "PUNCT" and self.peek().value == "*":
            self.next()
            cols = None
        else:
            cols = [self.ident()]
            while self.peek().kind == "PUNCT" and self.peek().value == ",":
                self.next()
                cols.append(self.ident())
        self.expect_kw("FROM")
        collection = self.ident()

        stmt = ast.SelectStmt(columns=cols, collection=collection)

        if self.accept_kw("AS"):
            self.expect_kw("OF")
            stmt.as_of = self._literal()

        if self.accept_kw("WITH"):
            stmt.with_time_decay = self._time_decay_spec()

        if self.accept_kw("USING"):
            self.expect_kw("RAG")
            stmt.using_rag = self._rag_options()

        if self.accept_kw("WHERE"):
            stmt.where = self._or_expr()

        if self.accept_kw("RERANK"):
            self.expect_kw("BY")
            stmt.rerank = self._rerank_target()

        if self.accept_kw("ORDER"):
            self.expect_kw("BY")
            stmt.order_by = [self._order_key()]
            while self.peek().kind == "PUNCT" and self.peek().value == ",":
                self.next()
                stmt.order_by.append(self._order_key())

        if self.accept_kw("LIMIT"):
            stmt.limit = self.number(as_int=True)
        if self.accept_kw("OFFSET"):
            stmt.offset = self.number(as_int=True)
        self._end()
        return stmt

    def _time_decay_spec(self) -> ast.TimeDecaySpec:
        self.expect_kw("TIME_DECAY")
        self.expect("PUNCT", "(")
        params: dict = {}
        fn = "exponential"
        while not (self.peek().kind == "PUNCT" and self.peek().value == ")"):
            key = self.ident()
            self.expect("OP", "=")
            val = self._literal()
            if key == "function":
                fn = str(val)
            else:
                params[key] = val
            if self.peek().kind == "PUNCT" and self.peek().value == ",":
                self.next()
        self.expect("PUNCT", ")")
        return ast.TimeDecaySpec(function=fn, params=params)

    def _rag_options(self) -> ast.RagOptions:
        opts = ast.RagOptions()
        if not (self.peek().kind == "PUNCT" and self.peek().value == "("):
            return opts
        self.next()
        while not (self.peek().kind == "PUNCT" and self.peek().value == ")"):
            # option keys may collide with keywords (RERANK): accept both
            t = self.peek()
            if t.kind == "KEYWORD":
                self.next()
                key = t.value.lower()
            else:
                key = self.ident()
            self.expect("OP", "=")
            val = self._literal()
            if key == "top_k":
                opts.top_k = int(val)
            elif key == "rerank":
                opts.rerank = bool(val)
            elif key == "hybrid_alpha":
                opts.hybrid_alpha = float(val)
            elif key == "deduplicate":
                opts.deduplicate = bool(val)
            else:
                raise ParseError(f"unknown RAG option: {key!r}")
            if self.peek().kind == "PUNCT" and self.peek().value == ",":
                self.next()
        self.expect("PUNCT", ")")
        return opts

    def _order_key(self) -> ast.OrderKey:
        expr = self._order_expr()
        desc = False
        if self.accept_kw("DESC"):
            desc = True
        elif self.accept_kw("ASC"):
            desc = False
        return ast.OrderKey(expr=expr, desc=desc)

    def _order_expr(self):
        t = self.peek()
        name = None
        if t.kind == "IDENT":
            name = t.value
        elif t.is_kw("TIME_DECAY"):
            name = "time_decay"
        if name is not None:
            self.next()
            if self.peek().kind == "PUNCT" and self.peek().value == "(":
                self.next()
                args = []
                while not (self.peek().kind == "PUNCT" and self.peek().value == ")"):
                    args.append(self._func_arg())
                    if self.peek().kind == "PUNCT" and self.peek().value == ",":
                        self.next()
                self.expect("PUNCT", ")")
                return ast.FuncCall(name=name.lower(), args=args)
            return name
        raise ParseError(f"expected order expression at {t.pos}")

    def _func_arg(self):
        t = self.peek()
        if t.kind == "IDENT":
            self.next()
            return t.value
        return self._literal()

    # ---------------------------------------------------- expressions --
    def _or_expr(self):
        left = self._and_expr()
        while self.accept_kw("OR"):
            left = ast.Or(left, self._and_expr())
        return left

    def _and_expr(self):
        left = self._not_expr()
        while self.accept_kw("AND"):
            left = ast.And(left, self._not_expr())
        return left

    def _not_expr(self):
        if self.accept_kw("NOT"):
            return ast.Not(self._not_expr())
        return self._primary()

    def _primary(self):
        t = self.peek()
        if t.kind == "PUNCT" and t.value == "(":
            self.next()
            e = self._or_expr()
            self.expect("PUNCT", ")")
            return e
        col = self.ident()
        t = self.peek()
        if t.is_kw("SIMILAR"):
            self.next()
            self.expect_kw("TO")
            return ast.SimilarTo(column=col, param=self.expect("PARAM").value)
        if t.is_kw("MATCH"):
            self.next()
            return ast.TextMatch(column=col, query=self.expect("STRING").value)
        if t.is_kw("NOT"):
            self.next()
            if self.accept_kw("IN"):
                return ast.InList(column=col, values=self._value_list(), negated=True)
            if self.accept_kw("LIKE"):
                return ast.Like(column=col, pattern=self.expect("STRING").value, negated=True)
            raise ParseError(f"expected IN or LIKE after NOT at {t.pos}")
        if t.is_kw("IN"):
            self.next()
            return ast.InList(column=col, values=self._value_list())
        if t.is_kw("BETWEEN"):
            self.next()
            low = self._literal()
            self.expect_kw("AND")
            return ast.Between(column=col, low=low, high=self._literal())
        if t.is_kw("LIKE"):
            self.next()
            return ast.Like(column=col, pattern=self.expect("STRING").value)
        if t.is_kw("IS"):
            self.next()
            neg = self.accept_kw("NOT")
            self.expect_kw("NULL")
            return ast.IsNull(column=col, negated=neg)
        if t.kind == "OP":
            self.next()
            return ast.Comparison(column=col, op=t.value, value=self._literal())
        raise ParseError(f"expected operator after {col!r} at {t.pos}")

    def _value_list(self) -> list:
        self.expect("PUNCT", "(")
        vals = [self._literal()]
        while self.peek().kind == "PUNCT" and self.peek().value == ",":
            self.next()
            vals.append(self._literal())
        self.expect("PUNCT", ")")
        return vals

    def _literal(self):
        t = self.next()
        if t.kind == "NUMBER":
            return _num_from_token(t)
        if t.kind == "STRING":
            return t.value
        if t.kind == "PARAM":
            return ast.FuncCall(name="$param", args=[t.value])
        if t.is_kw("NULL"):
            return None
        if t.is_kw("TRUE"):
            return True
        if t.is_kw("FALSE"):
            return False
        raise ParseError(f"expected literal, got {t.value!r} at {t.pos}")

    # --------------------------------------------------- INSERT/DELETE --
    def parse_insert(self) -> ast.InsertStmt:
        self.expect_kw("INSERT")
        self.expect_kw("INTO")
        name = self.ident()
        self.expect("PUNCT", "(")
        cols = [self.ident()]
        while self.peek().kind == "PUNCT" and self.peek().value == ",":
            self.next()
            cols.append(self.ident())
        self.expect("PUNCT", ")")
        self.expect_kw("VALUES")
        self.expect("PUNCT", "(")
        vals = [self._literal()]
        while self.peek().kind == "PUNCT" and self.peek().value == ",":
            self.next()
            vals.append(self._literal())
        self.expect("PUNCT", ")")
        self._end()
        if len(cols) != len(vals):
            raise ParseError("INSERT column/value count mismatch")
        return ast.InsertStmt(collection=name, columns=cols, values=vals)

    def parse_delete(self) -> ast.DeleteStmt:
        self.expect_kw("DELETE")
        self.expect_kw("FROM")
        name = self.ident()
        self.expect_kw("WHERE")
        where = self._or_expr()
        self._end()
        return ast.DeleteStmt(collection=name, where=where)

    # ------------------------------------------------------------ DDL --
    def parse_create(self):
        self.expect_kw("CREATE")
        if self.accept_kw("COLLECTION"):
            name = self.ident()
            opts: dict = {}
            if self.peek().kind == "PUNCT" and self.peek().value == "(":
                self.next()
                while not (self.peek().kind == "PUNCT" and self.peek().value == ")"):
                    k = self.ident()
                    self.expect("OP", "=")
                    opts[k] = self._literal()
                    if self.peek().kind == "PUNCT" and self.peek().value == ",":
                        self.next()
                self.expect("PUNCT", ")")
            self._end()
            return ast.CreateCollectionStmt(name=name, options=opts)
        materialized = self.accept_kw("MATERIALIZED")
        self.expect_kw("VIEW")
        name = self.ident()
        self.expect_kw("AS")
        query = self.parse_select()
        return ast.CreateViewStmt(name=name, query=query, materialized=materialized)

    def parse_drop(self):
        self.expect_kw("DROP")
        if self.accept_kw("COLLECTION"):
            name = self.ident()
            self._end()
            return ast.DropCollectionStmt(name=name)
        self.expect_kw("VIEW")
        name = self.ident()
        self._end()
        return ast.DropViewStmt(name=name)


def parse(text: str):
    """Parse one NeedleQL statement."""
    return Parser(text).parse_statement()


def parse_script(text: str) -> list:
    """Parse a ';'-separated multi-statement script (docs/needleql.md
    'Batch Insert and Delete' runs several statements in one session)."""
    p = Parser(text)
    p.script = True
    stmts = []
    while p.peek().kind != "EOF":
        stmts.append(p.parse_statement())
    return stmts
