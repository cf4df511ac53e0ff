"""Interactive NeedleQL session: persistent named parameters, query
history, default-collection injection, and REPL dot-commands, layered
over the engine's QueryExecutor.

Reference: /root/reference/src/search/query_lang/session.rs —
QuerySession (:128-230): set_param/get_param/clear_params (:148-161),
parse_query with empty-input rejection, dot-command detection, and
default-collection FROM injection (:163-201), history (:203-205),
help_text (:208-228).  AggregateFunction parse/apply (:14-125) is the
reference's driver-side aggregation shim — here COUNT/COUNT_DISTINCT/
AVG/MIN/MAX/SUM already run distributed through the analytics operator
(operators/analytics.py), so the session only needs to parse the
function spelling for REPL affordances.

The session holds no data: parameters are substituted by the executor
at plan-build time, history is a bounded list of strings, and every
query still compiles to the same Catalyst plan the executor would
build directly.
"""

from __future__ import annotations

import re
from typing import Any

from needle_spark.ql.executor import QueryExecutor

HELP_TEXT = """NeedleQL Interactive Shell Commands:
  .use <collection>  - Set default collection
  .params            - Show current parameters
  .set <name> <val>  - Set a parameter
  .history           - Show query history
  .clear             - Clear parameters
  .help              - Show this help
  .quit              - Exit the shell

NeedleQL Syntax:
  SELECT * FROM <collection>
    WHERE <field> <op> <value>
    AND vector SIMILAR TO $query
    WITH TIME_DECAY(function='exponential', half_life_seconds='24h')
    ORDER BY distance ASC
    LIMIT 10 OFFSET 0
  EXPLAIN ANALYZE SELECT ...
"""

_AGG_RE = re.compile(r"^\s*([A-Za-z_]+)\s*\(\s*([^)]*?)\s*\)\s*$")

#: session.rs:14-27 — the aggregate spellings the REPL accepts.
AGGREGATE_FUNCTIONS = ("COUNT", "COUNT_DISTINCT", "AVG", "MIN", "MAX", "SUM")


class SessionError(ValueError):
    pass


def parse_aggregate(s: str) -> tuple[str, str | None]:
    """AggregateFunction::parse — session.rs:31-69.  Returns
    (function, field_or_None); COUNT(*) and bare COUNT both map to
    ("COUNT", None)."""
    upper = s.strip().upper()
    if upper in ("COUNT(*)", "COUNT"):
        return ("COUNT", None)
    m = _AGG_RE.match(s.strip())
    if not m:
        raise SessionError(f"not an aggregate function: {s!r}")
    func, fld = m.group(1).upper(), m.group(2)
    if func not in AGGREGATE_FUNCTIONS:
        raise SessionError(f"unknown aggregate function: {func}")
    if func == "COUNT" and fld in ("*", ""):
        return ("COUNT", None)
    if not fld:
        raise SessionError(f"{func} needs a field")
    return (func, fld)


def _parse_literal(s: str) -> Any:
    """REPL `.set` value parsing: int/float/bool/quoted-or-bare string."""
    if len(s) >= 2 and s[0] == s[-1] and s[0] in ("'", '"'):
        return s[1:-1]
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        return s


class QuerySession:
    """session.rs:128-230 over the engine's executor."""

    def __init__(self, executor: QueryExecutor, *, default_limit: int = 10,
                 max_history: int = 1000):
        self.executor = executor
        self.parameters: dict[str, Any] = {}
        self._history: list[str] = []
        self.default_collection: str | None = None
        self.default_limit = default_limit
        self.max_history = max_history

    # -- parameters (session.rs:148-161) --

    def set_param(self, name: str, value: Any) -> None:
        self.parameters[name] = value

    def get_param(self, name: str) -> Any | None:
        return self.parameters.get(name)

    def clear_params(self) -> None:
        self.parameters.clear()

    # -- history --

    def history(self) -> list[str]:
        return list(self._history)

    # -- REPL commands --

    @staticmethod
    def help_text() -> str:
        return HELP_TEXT

    def command(self, line: str) -> Any:
        """Dot-command dispatch (the reference routes these in its REPL
        shell; parse_query rejects them — session.rs:171-180)."""
        parts = line.strip().split(None, 2)
        cmd = parts[0].lstrip(".\\").lower()
        if cmd == "use" and len(parts) > 1:
            self.default_collection = parts[1]
            return {"default_collection": parts[1]}
        if cmd == "params":
            return dict(self.parameters)
        if cmd == "set" and len(parts) == 3:
            self.set_param(parts[1], _parse_literal(parts[2]))
            return {parts[1]: self.parameters[parts[1]]}
        if cmd == "history":
            return self.history()
        if cmd == "clear":
            self.clear_params()
            return {"params": {}}
        if cmd == "help":
            return HELP_TEXT
        raise SessionError(
            f"Unknown command: {line.strip()}. Use .help for available commands.")

    # -- queries --

    def prepare(self, input_sql: str) -> str:
        """Empty-input rejection + default-collection FROM injection —
        session.rs:163-201."""
        trimmed = input_sql.strip()
        if not trimmed:
            raise SessionError("Empty query")
        if trimmed.startswith(".") or trimmed.startswith("\\"):
            raise SessionError(
                f"Unknown command: {trimmed}. Use .help for available commands.")
        # a REPL-conventional trailing semicolon must not break the
        # LIMIT/FROM rewrites below
        trimmed = trimmed.rstrip(";").rstrip()
        upper = trimmed.upper()
        # token-level checks: substring tests are fooled by identifiers
        # (from_ts, limit_price) and string literals ('from home')
        words = set(re.findall(r"[A-Za-z_]+", upper))
        first = upper.split(None, 1)[0] if upper else ""
        stmt_kw = {"SELECT", "INSERT", "CREATE", "DROP", "SHOW",
                   "DELETE", "UPDATE", "EXPLAIN", "DESCRIBE", "ALTER"}
        if self.default_collection is not None and "FROM" not in words:
            if first == "SELECT":
                trimmed = trimmed + f" FROM {self.default_collection}"
            elif first not in stmt_kw:
                # only bare WHERE/ORDER-style fragments get wrapped;
                # wrapping DML/DDL would mangle them into parse errors
                trimmed = f"SELECT * FROM {self.default_collection} {trimmed}"
        upper = trimmed.upper()
        words = set(re.findall(r"[A-Za-z_]+", upper))
        if upper.startswith("SELECT") and "LIMIT" not in words:
            if "OFFSET" in words:
                # the grammar requires LIMIT before OFFSET
                m = re.search(r"(?i)\bOFFSET\b", trimmed)
                trimmed = (trimmed[:m.start()]
                           + f"LIMIT {self.default_limit} "
                           + trimmed[m.start():])
            else:
                trimmed = trimmed + f" LIMIT {self.default_limit}"
        return trimmed

    def execute(self, input_sql: str, params: dict[str, Any] | None = None):
        """Prepare, record history, run through the executor with the
        session's persistent parameters (call-site params win)."""
        line = input_sql.strip()
        if line.startswith(".") or line.startswith("\\"):
            return self.command(line)
        sql = self.prepare(input_sql)
        merged = {**self.parameters, **(params or {})}
        self._history.append(line)
        if len(self._history) > self.max_history:
            del self._history[: len(self._history) - self.max_history]
        return self.executor.execute(sql, merged)
