"""``[[ ]]`` template compiler (the reference's scalar-expression language).

The reference compiles Go ``text/template`` strings with ``[[ ]]``
delimiters (so Optimus's own ``{{ }}`` macros pass through untouched)
plus the sprig v3 function map and ``uuid``/``now``/``tojson`` extras
(reference: internal/ext/compiler/compiler.go:14-37; contract tests
internal/ext/compiler/compiler_test.go:11-88; docs/rfc_005).

Two evaluation backends over one AST:

- :meth:`Template.render` — driver-side, against a plain dict (used for
  templated SQL files, per-pre-record query fan-out, sink config).
- :meth:`Template.column` — compiled to a Spark ``Column`` (used for
  per-record destination URIs / routing keys / body templates, so
  routing stays distributed and JVM-side instead of per-record Go
  template execution).

Behavioral contracts honored (compiler_test.go): field interpolation,
nested field access, non-``[[ ]]`` text (including ``{{ }}``) passes
through verbatim, ``div`` is integer division, ``now.Format`` uses Go
layouts, ``uuid``/``tojson`` available.
"""

from __future__ import annotations

import base64
import hashlib
import json
import re
import uuid as _uuid
from collections import OrderedDict
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DELIM_OPEN = "[["
DELIM_CLOSE = "]]"

# ---------------------------------------------------------------------------
# AST


@dataclass
class Text:
    value: str


@dataclass
class Field:
    path: tuple[str, ...]  # () means "." (the whole record)


@dataclass
class Lit:
    value: Any


@dataclass
class Call:
    name: str
    args: list[Any]


Node = Any  # Text | Field | Lit | Call

# ---------------------------------------------------------------------------
# Parser

_TOKEN_RE = re.compile(
    r"""
    \s*(
        "(?:[^"\\]|\\.)*"            # double-quoted string
      | `[^`]*`                      # raw string
      | -?\d+\.\d+                   # float
      | -?\d+                        # int
      | \.[A-Za-z_][\w.]*            # field path  .a.b.c
      | \.                           # bare dot
      | [A-Za-z_][\w.]*              # ident (may carry .Method)
      | \(
      | \)
      | \|
    )
    """,
    re.VERBOSE,
)


def _tokenize(src: str) -> list[str]:
    tokens, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            if src[pos:].strip() == "":
                break
            raise ValueError(f"template: bad token at {src[pos:]!r}")
        tokens.append(m.group(1))
        pos = m.end()
    return tokens


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def parse_pipeline(self) -> Node:
        node = self.parse_command()
        while self.peek() == "|":
            self.next()
            right = self.parse_command()
            # Go template pipe: piped value becomes the LAST argument.
            if isinstance(right, Call):
                right.args.append(node)
                node = right
            else:
                raise ValueError("template: pipe target must be a function")
        return node

    def parse_command(self) -> Node:
        terms: list[Node] = []
        while True:
            tok = self.peek()
            if tok is None or tok in (")", "|"):
                break
            terms.append(self.parse_term())
        if not terms:
            raise ValueError("template: empty command")
        head = terms[0]
        if len(terms) == 1:
            if isinstance(head, Call):
                return head
            return head
        if isinstance(head, Call) and not head.args:
            head.args = terms[1:]
            return head
        raise ValueError(f"template: cannot apply arguments to {head!r}")

    def parse_term(self) -> Node:
        tok = self.next()
        if tok == "(":
            node = self.parse_pipeline()
            if self.next() != ")":
                raise ValueError("template: expected )")
            return node
        if tok.startswith('"'):
            return Lit(json.loads(tok))
        if tok.startswith("`"):
            return Lit(tok[1:-1])
        if re.fullmatch(r"-?\d+", tok):
            return Lit(int(tok))
        if re.fullmatch(r"-?\d+\.\d+", tok):
            return Lit(float(tok))
        if tok == ".":
            return Field(())
        if tok.startswith("."):
            return Field(tuple(tok[1:].split(".")))
        # ident, possibly with method call: now.Format
        return Call(tok, [])


def _parse_action(src: str) -> Node:
    return _Parser(_tokenize(src)).parse_pipeline()


# ---------------------------------------------------------------------------
# Go time layout → Java (Spark date_format) layout

_GO_LAYOUT_MAP = [
    ("2006", "yyyy"),
    ("01", "MM"),
    ("02", "dd"),
    ("15", "HH"),
    ("04", "mm"),
    ("05", "ss"),
    (".000", ".SSS"),
    ("Z07:00", "XXX"),
    ("-07:00", "xxx"),
    ("-0700", "xx"),
    ("Jan", "MMM"),
    ("Mon", "EEE"),
]


def go_layout_to_java(layout: str) -> str:
    out = layout
    for go, java in _GO_LAYOUT_MAP:
        out = out.replace(go, java)
    return out


def _go_layout_to_strftime(layout: str) -> str:
    out = layout
    for go, py in [
        ("2006", "%Y"), ("01", "%m"), ("02", "%d"), ("15", "%H"),
        ("04", "%M"), ("05", "%S"), (".000", ".%f"), ("Jan", "%b"), ("Mon", "%a"),
    ]:
        out = out.replace(go, py)
    return out


# ---------------------------------------------------------------------------
# Python (driver-side) evaluation

def _py_div(a, b):
    if isinstance(a, int) and isinstance(b, int):
        return int(a / b) if b != 0 else 0  # Go integer division truncates
    return a / b


def _go_truthy(v: Any) -> bool:
    """Go template emptiness: nil/false/0/""/empty collection are false."""
    if v is None or v is False:
        return False
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return v != 0
    if hasattr(v, "__len__"):
        return len(v) > 0
    return True


def _go_and(*xs: Any) -> Any:
    for x in xs:
        if not _go_truthy(x):
            return x
    return xs[-1]


def _go_or(*xs: Any) -> Any:
    for x in xs:
        if _go_truthy(x):
            return x
    return xs[-1]


_PY_FUNCS: dict[str, Any] = {
    # Go template builtins (text/template/funcs.go): comparisons and
    # boolean operators. eq accepts extra args as an any-of match; and/or
    # return the deciding operand (Go semantics).
    "eq": lambda a, *bs: any(a == b for b in bs),
    "ne": lambda a, b: a != b,
    "lt": lambda a, b: a < b,
    "le": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "ge": lambda a, b: a >= b,
    "and": _go_and,
    "or": _go_or,
    "not": lambda v: not _go_truthy(v),
    "add": lambda *xs: sum(xs),
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "div": _py_div,
    "mod": lambda a, b: a % b if b else 0,
    "max": max,
    "min": min,
    "upper": lambda s: str(s).upper(),
    "lower": lambda s: str(s).lower(),
    "title": lambda s: str(s).title(),
    "trim": lambda s: str(s).strip(),
    "nospace": lambda s: re.sub(r"\s+", "", str(s)),
    "trunc": lambda n, s: str(s)[:n] if n >= 0 else str(s)[n:],
    "replace": lambda old, new, s: str(s).replace(old, new),
    "repeat": lambda n, s: str(s) * n,
    "substr": lambda start, end, s: str(s)[start:end],
    "contains": lambda sub, s: sub in str(s),
    "hasPrefix": lambda p, s: str(s).startswith(p),
    "hasSuffix": lambda p, s: str(s).endswith(p),
    "b64enc": lambda s: base64.b64encode(str(s).encode()).decode(),
    "b64dec": lambda s: base64.b64decode(str(s)).decode(),
    "sha256sum": lambda s: hashlib.sha256(str(s).encode()).hexdigest(),
    "md5sum": lambda s: hashlib.md5(str(s).encode()).hexdigest(),
    "default": lambda d, v: v if v not in (None, "", 0, False) else d,
    "coalesce": lambda *xs: next((x for x in xs if x not in (None, "")), None),
    "ternary": lambda t, f, c: t if c else f,
    "tojson": lambda v: json.dumps(v, separators=(",", ":"), ensure_ascii=False),
    "toString": lambda v: _go_str(v),
    "printf": lambda fmt, *a: _go_printf(fmt, *a),
    "uuid": lambda: str(_uuid.uuid4()),
    "uuidv4": lambda: str(_uuid.uuid4()),
}


def _go_str(v: Any) -> str:
    """fmt %v-ish stringification (bools lowercase, whole floats bare)."""
    if v is None:
        return "<no value>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return str(int(v)) if v == int(v) and abs(v) < 1e15 else repr(v)
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"), ensure_ascii=False)
    return str(v)


def _go_printf(fmt: str, *args: Any) -> str:
    py_fmt = fmt.replace("%v", "%s")
    coerced = [
        _go_str(a) if isinstance(a, (bool, float, dict, list)) and ("%s" in py_fmt) else a
        for a in args
    ]
    return py_fmt % tuple(coerced)


class _NowProxy:
    """Supports ``now`` and ``now.Format "layout"`` in templates."""

    def __init__(self, t: datetime | None = None):
        self.t = t or datetime.now(timezone.utc)

    def format(self, layout: str) -> str:
        return self.t.strftime(_go_layout_to_strftime(layout))

    def __str__(self) -> str:
        return self.t.isoformat()


def _py_eval(node: Node, env: dict, now: _NowProxy) -> Any:
    if isinstance(node, Lit):
        return node.value
    if isinstance(node, Field):
        if not node.path:
            return env
        cur: Any = env
        for part in node.path:
            if isinstance(cur, dict):
                cur = cur.get(part)
            else:
                return None
        return cur
    if isinstance(node, Call):
        name = node.name
        if name == "now":
            return now
        if name == "now.Format":
            args = [_py_eval(a, env, now) for a in node.args]
            return now.format(args[0])
        fn = _PY_FUNCS.get(name)
        if fn is None:
            raise ValueError(f"template: unknown function {name!r}")
        return fn(*[_py_eval(a, env, now) for a in node.args])
    raise TypeError(f"template: cannot evaluate {node!r}")


# ---------------------------------------------------------------------------
# Column (Spark) evaluation

def _col_str(c: Column, dtype: str | None) -> Column:
    """Stringify a column the way Go fmt %v does (whole floats bare,
    bools lowercase) — same rules as the JSON→CSV converter (§1.3)."""
    if dtype in ("double", "float"):
        as_long = c.cast("long")
        return F.when(
            c.isNotNull() & (c == as_long.cast(dtype)), as_long.cast("string")
        ).otherwise(c.cast("string"))
    if dtype == "boolean":
        # NULL must stay NULL (not fall into the otherwise branch)
        return F.when(c.isNull(), F.lit(None).cast("string")).when(
            c, "true"
        ).otherwise("false")
    return c.cast("string")


def _field_col(df: DataFrame, path: tuple[str, ...]) -> tuple[Column, str | None]:
    if not path:
        cols = [c for c in df.columns]
        return F.to_json(F.struct(*cols)), "json"
    name = path[0]
    col = F.col("`" + name + "`")
    for part in path[1:]:
        col = col.getField(part)
    dtype = dict(df.dtypes).get(name) if len(path) == 1 else None
    return col, dtype


def _col_eval(node: Node, df: DataFrame) -> tuple[Column, str | None]:
    """Returns (column, dtype-hint)."""
    if isinstance(node, Lit):
        return F.lit(node.value), (
            "bigint" if isinstance(node.value, int) else
            "double" if isinstance(node.value, float) else "string"
        )
    if isinstance(node, Field):
        return _field_col(df, node.path)
    if isinstance(node, Call):
        return _col_call(node, df)
    raise TypeError(f"template: cannot compile {node!r}")


def _col_call(node: Call, df: DataFrame) -> tuple[Column, str | None]:
    name = node.name
    argpairs = [_col_eval(a, df) for a in node.args]
    args = [a for a, _ in argpairs]
    if name == "now":
        return F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ssXXX"), "string"
    if name == "now.Format":
        layout = node.args[0].value  # must be a literal layout
        return F.date_format(F.current_timestamp(), go_layout_to_java(layout)), "string"
    if name == "uuid" or name == "uuidv4":
        return F.expr("uuid()"), "string"
    if name in ("eq", "ne", "lt", "le", "gt", "ge"):
        # Go template comparison builtins (text/template/funcs.go); eq
        # accepts extra args as an any-of match.
        a, b = args[0], args[1]
        if name == "eq":
            col = a == b
            for extra in args[2:]:
                col = col | (a == extra)
        elif name == "ne":
            col = a != b
        elif name == "lt":
            col = a < b
        elif name == "le":
            col = a <= b
        elif name == "gt":
            col = a > b
        else:
            col = a >= b
        return col, "boolean"
    if name in ("and", "or"):
        # Go template and/or return the deciding *operand*; with boolean
        # usage (the overwhelming template case) that is plain AND/OR.
        col = args[0]
        for extra in args[1:]:
            col = (col & extra) if name == "and" else (col | extra)
        return col, "boolean"
    if name == "not":
        return ~args[0], "boolean"
    if name in ("add", "sub", "mul", "div", "mod", "max", "min"):
        a, b = args[0], args[1] if len(args) > 1 else F.lit(0)
        dt = "bigint"
        if name == "add":
            col = a + b
            for extra in args[2:]:
                col = col + extra
        elif name == "sub":
            col = a - b
        elif name == "mul":
            col = a * b
        elif name == "div":
            col = F.when(b == 0, F.lit(0)).otherwise(
                (a.cast("double") / b.cast("double")).cast("long")
            )
        elif name == "mod":
            col = a % b
        elif name == "max":
            col = F.greatest(*args)
        else:
            col = F.least(*args)
        return col, dt
    str_args = [
        _col_str(a, dt) for (a, dt) in argpairs
    ]
    if name == "upper":
        return F.upper(str_args[0]), "string"
    if name == "lower":
        return F.lower(str_args[0]), "string"
    if name == "trim":
        return F.trim(str_args[0]), "string"
    if name == "title":
        return F.initcap(str_args[0]), "string"
    if name == "nospace":
        return F.regexp_replace(str_args[0], r"\s+", ""), "string"
    if name == "replace":
        old, new, s = str_args[0], str_args[1], str_args[2]
        return F.replace(s, old, new), "string"
    if name == "trunc":
        n = node.args[0].value
        s = str_args[1]
        return (F.substring(s, 1, n) if n >= 0 else F.substring(s, n, -n)), "string"
    if name == "substr":
        start, end = node.args[0].value, node.args[1].value
        return F.substring(str_args[2], start + 1, end - start), "string"
    if name == "repeat":
        return F.repeat(str_args[1], node.args[0].value), "string"
    if name == "contains":
        return F.contains(str_args[1], str_args[0]), "boolean"
    if name == "hasPrefix":
        return F.startswith(str_args[1], str_args[0]), "boolean"
    if name == "hasSuffix":
        return F.endswith(str_args[1], str_args[0]), "boolean"
    if name == "b64enc":
        return F.base64(str_args[0].cast("binary")), "string"
    if name == "b64dec":
        return F.unbase64(str_args[0]).cast("string"), "string"
    if name == "sha256sum":
        return F.sha2(str_args[0], 256), "string"
    if name == "md5sum":
        return F.md5(str_args[0].cast("binary")), "string"
    if name == "default":
        # sprig emptiness: nil, "", 0, and false are all empty — matches
        # the driver evaluator (`_PY_FUNCS["default"]`), so render() and
        # column() agree on 0/false inputs.
        (d, ddt), (v, vdt) = argpairs[0], argpairs[1]
        empty = v.isNull() | (v.cast("string") == "")
        if vdt == "boolean":
            empty = empty | ~v
        elif vdt not in ("string", "json", None):
            empty = empty | (v == F.lit(0))  # numeric zero is empty
        # both branches stringified: ANSI would otherwise coerce the
        # branches to a numeric common type and fail casting the default
        return (
            F.when(empty, _col_str(d, ddt)).otherwise(_col_str(v, vdt)),
            "string",
        )
    if name == "coalesce":
        return F.coalesce(*args), None
    if name == "ternary":
        t, f, c = args[0], args[1], args[2]
        return F.when(c, t).otherwise(f), None
    if name == "tojson":
        a, dt = argpairs[0]
        return (a if dt == "json" else F.to_json(a)), "string"
    if name == "toString":
        return str_args[0], "string"
    if name == "printf":
        fmt = node.args[0].value.replace("%v", "%s")
        fmt_args = [
            _col_str(a, dt) if "%s" in fmt else a
            for (a, dt) in argpairs[1:]
        ]
        return F.format_string(fmt, *fmt_args), "string"
    raise ValueError(f"template: unknown function {name!r}")


# ---------------------------------------------------------------------------
# Template object

class Template:
    def __init__(self, source: str):
        self.source = source
        self.parts: list[Node] = []
        pos = 0
        while True:
            start = source.find(DELIM_OPEN, pos)
            if start < 0:
                if pos < len(source):
                    self.parts.append(Text(source[pos:]))
                break
            if start > pos:
                self.parts.append(Text(source[pos:start]))
            end = source.find(DELIM_CLOSE, start)
            if end < 0:
                raise ValueError(f"template: unclosed {DELIM_OPEN} in {source!r}")
            self.parts.append(_parse_action(source[start + len(DELIM_OPEN):end]))
            pos = end + len(DELIM_CLOSE)

    @property
    def is_static(self) -> bool:
        return all(isinstance(p, Text) for p in self.parts)

    def field_refs(self) -> set[str]:
        """Top-level record fields the template reads (for routing-column
        pruning / partitionBy decisions)."""
        refs: set[str] = set()

        def walk(n: Node):
            if isinstance(n, Field) and n.path:
                refs.add(n.path[0])
            elif isinstance(n, Call):
                for a in n.args:
                    walk(a)

        for p in self.parts:
            walk(p)
        return refs

    def render(self, env: dict | None = None, now: datetime | None = None) -> str:
        """Driver-side render against a dict (Go-template semantics)."""
        proxy = _NowProxy(now)
        out: list[str] = []
        for p in self.parts:
            if isinstance(p, Text):
                out.append(p.value)
            else:
                out.append(_go_str(_py_eval(p, env or {}, proxy)))
        return "".join(out)

    def column(self, df: DataFrame) -> Column:
        """Compile to a Spark Column producing the rendered string.

        NULL fields render as Go template's ``<no value>`` — critically,
        they must NOT null-propagate through concat (a routing template
        with one null field would otherwise send the record to a NULL
        destination).
        """
        cols: list[Column] = []
        for p in self.parts:
            if isinstance(p, Text):
                cols.append(F.lit(p.value))
            else:
                c, dt = _col_eval(p, df)
                rendered = _col_str(c, dt) if dt not in ("string", "json") else c
                cols.append(F.coalesce(rendered, F.lit("<no value>")))
        if not cols:
            return F.lit("")
        return F.concat(*cols) if len(cols) > 1 else cols[0].cast("string")


_TEMPLATE_CACHE: "OrderedDict[str, Template]" = OrderedDict()
_TEMPLATE_CACHE_MAX = 512


def compile_template(source: str) -> Template:
    """Parse-once per distinct template text: Template objects are
    immutable after __init__ (render/column/field_refs only read
    self.parts), and per-record-templated sinks re-compile the same
    source on every write — the parse is pure, so share it. LRU
    eviction (one entry at a time past the cap) keeps the hot set
    when a workload cycles through >512 distinct templates."""
    t = _TEMPLATE_CACHE.get(source)
    if t is None:
        while len(_TEMPLATE_CACHE) >= _TEMPLATE_CACHE_MAX:
            _TEMPLATE_CACHE.popitem(last=False)
        t = Template(source)
        _TEMPLATE_CACHE[source] = t
    else:
        _TEMPLATE_CACHE.move_to_end(source)
    return t
