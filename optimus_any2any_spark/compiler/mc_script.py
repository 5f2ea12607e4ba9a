"""MaxCompute script-mode query handling, re-expressed for Spark SQL.

The reference submits whole query *scripts* to MaxCompute with
``odps.sql.submit.mode=script`` when they contain ``;``
(ext/maxcompute/client_reader.go:73) and, for validation, splits a
script into SET headers, ``@variable``/UDF declarations, and DROP
statements around the body (ext/maxcompute/query_helper.go:91,130,169;
classification regexes :16-25; comment stripping :213-217). Here
Catalyst is the warehouse, so the same decomposition drives *local*
execution: SET headers become session conf statements, ``@var :=
SELECT``. declarations become temp views (scalar declarations become
inline substitutions), DROPs run against the catalog, and the final
body statement produces the record stream — matching script mode's
"result of the last statement" contract.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# Classification regexes — semantics per query_helper.go:16-25.
_SEMICOLON = re.compile(r";\s*(?:\n+|$)")
_LINE_COMMENT = re.compile(r"--[^\n]*")
_BLOCK_COMMENT = re.compile(r"/\*.*?\*/", re.S)
_HEADER = re.compile(r"^set", re.I)
_VARIABLE = re.compile(r"^@")
_UDF = re.compile(r"^function\s+", re.I)
_DROP = re.compile(r"^drop\s+", re.I)
_STRING = re.compile(r"'[^']*'")


def remove_comments(stmt: str) -> str:
    """Strip ``--`` line comments and ``/* */`` blocks (query_helper.go:213)."""
    return _BLOCK_COMMENT.sub("", _LINE_COMMENT.sub("", stmt))


def split_statements(script: str) -> list[str]:
    """Split a script on statement-final semicolons (query_helper.go:16)."""
    return [s.strip() for s in _SEMICOLON.split(script.strip()) if s.strip()]


@dataclass
class ScriptComponents:
    """A script decomposed per SeparateHeadersAndQuery /
    SeparateVariablesUDFsAndQuery / SeparateDropsAndQuery."""

    headers: list[str] = field(default_factory=list)   # SET ...
    variables: list[str] = field(default_factory=list)  # @v := ...
    udfs: list[str] = field(default_factory=list)       # FUNCTION ...
    drops: list[str] = field(default_factory=list)      # DROP ...
    queries: list[str] = field(default_factory=list)    # everything else


def split_script(script: str) -> ScriptComponents:
    """Classify each statement by its comment-stripped head."""
    out = ScriptComponents()
    for stmt in split_statements(script):
        head = remove_comments(stmt).strip()
        if not head:
            continue  # comment-only statement, omitted (query_helper.go:51-54)
        if _HEADER.match(head):
            out.headers.append(stmt)
        elif _VARIABLE.match(head):
            out.variables.append(stmt)
        elif _UDF.match(head):
            out.udfs.append(stmt)
        elif _DROP.match(head):
            out.drops.append(stmt)
        else:
            out.queries.append(stmt)
    return out


_VAR_DECL = re.compile(r"^@(\w+)\s*:=\s*(.+)$", re.S)


def run_script(spark: SparkSession, script: str) -> DataFrame:
    """Execute a script against the session catalog; return the final
    statement's DataFrame (script mode's instance result).

    Execution order mirrors getQueryExplain's reconstruction
    (ext/maxcompute/source.go:303-317): headers, then variable/UDF
    declarations, then drops, then body statements; only the last body
    statement's rows flow downstream.
    """
    comp = split_script(script)
    if not comp.queries:
        raise ValueError("MC script contains no body statement to read from")

    for stmt in comp.headers:
        # MC `SET a.b=c` == Spark `SET a.b=c` (session-scoped conf).
        spark.sql(remove_comments(stmt).strip())

    substitutions: dict[str, str] = {}
    for stmt in comp.variables:
        m = _VAR_DECL.match(remove_comments(stmt).strip())
        if not m:
            raise ValueError(f"unsupported MC variable declaration: {stmt!r}")
        name, body = m.group(1), m.group(2).strip()
        body = _substitute_vars(body, substitutions)
        if re.match(r"^\(?\s*select\b", body, re.I):
            # Table variable → temp view; later `@name` refs become `name`.
            spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {body}")
            substitutions[name] = name
        else:
            # Scalar variable → inline expression substitution.
            substitutions[name] = f"({body})"

    if comp.udfs:
        # MC `FUNCTION f AS 'com.x.Udf' USING 'res'` binds a warehouse
        # resource; there is no portable Spark equivalent, and silently
        # dropping it would corrupt the body's semantics.
        raise NotImplementedError(
            "MC script FUNCTION declarations require warehouse-side UDF "
            f"resources; register a Spark UDF instead: {comp.udfs[0]!r}"
        )

    for stmt in comp.drops:
        spark.sql(_substitute_vars(remove_comments(stmt).strip(), substitutions))

    for stmt in comp.queries[:-1]:
        # Side-effect statements (INSERT/CREATE/...) execute eagerly on
        # spark.sql; intermediate SELECT results are discarded, as in
        # script mode.
        spark.sql(_substitute_vars(stmt, substitutions))
    return spark.sql(_substitute_vars(comp.queries[-1], substitutions))


def _substitute_vars(sql: str, substitutions: dict[str, str]) -> str:
    """Replace ``@name`` references outside string literals."""
    if not substitutions:
        return sql
    # Protect string literals (query_helper.go:219-227) so '@' inside
    # quotes is never rewritten.
    placeholders: dict[str, str] = {}

    def protect(m: re.Match) -> str:
        key = f"__STRING_PLACEHOLDER_{len(placeholders)}__"
        placeholders[key] = m.group(0)
        return key

    protected = _STRING.sub(protect, sql)
    for name, repl in substitutions.items():
        protected = re.sub(rf"@{name}\b", repl, protected)
    for key, original in placeholders.items():
        protected = protected.replace(key, original)
    return protected
