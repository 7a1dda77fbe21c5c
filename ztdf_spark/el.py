"""NiFi expression-language analog, compiled to Catalyst columns.

The reference evaluates any processor property that contains expression
language against each FlowFile's attributes before use
(AbstractTDFProcessor.java:113-115 — ``isExpressionLanguagePresent() ?
evaluateAttributeExpressions() : propertyValue``); the one EL-bearing
property it ships is SIGN_ASSERTIONS (AbstractTDFProcessor.java:123-129),
and flow authors routinely template KAS URLs / policy attributes the same
way. In this engine a "FlowFile attribute" is a row column, so the faithful
Spark-first analog is: compile the EL template ONCE on the driver into a
Catalyst ``Column`` expression tree, and let Tungsten evaluate it per row
inside whole-stage codegen — no Python in the data plane, unlike a naive
per-row ``evaluateAttributeExpressions`` port.

Supported subset (semantics follow the public NiFi EL guide):

- ``${attr}`` attribute (column) reference; ``${'quoted name'}`` for
  non-identifier names; ``$$`` escapes a literal ``$``.
- mixed text + expressions concatenate as strings, e.g.
  ``https://kas-${region}.example.com``.
- subjectless ``${literal('x')}``.
- chained calls ``${attr:trim():toUpper()}`` with string/number/boolean
  literals or embedded ``${...}`` expressions as arguments.
- multi-attribute matchers over EXPLICIT names:
  ``${anyAttribute('a','b'):contains('x')}`` /
  ``${allAttributes('a','b'):notNull()}`` — the chain evaluates per
  attribute and folds with OR / AND (one Catalyst boolean tree). The
  chain must END in a boolean test (compile-time ``ELSyntaxError``
  otherwise — OR/AND over strings is meaningless).
- regex multi-matchers ``${anyMatchingAttribute('re'):...}`` /
  ``${allMatchingAttributes('re'):...}``: the name regex expands against
  the STATIC batch schema at compile time (pass
  ``compile_template(t, columns=df.columns)``) — deterministic, same
  folded boolean tree; a regex matching no columns folds vacuously
  (any → false, all → true).

String: trim, toUpper, toLower, substring, substringBefore,
substringAfter, replace, replaceAll, replaceNull, replaceEmpty, append,
prepend, length, padLeft, padRight, getDelimitedField, indexOf,
urlEncode, urlDecode, base64Encode, base64Decode.
Boolean/tests: equals, equalsIgnoreCase, contains, startsWith, endsWith,
matches, find, in, isEmpty, isNull, notNull, not, and, or, ifElse.
Numeric: toNumber, toDecimal, plus, minus, multiply, divide, mod, gt, ge,
lt, le, toString.
Date (deterministic; Spark datetime pattern dialect): toDate (string →
epoch millis), format (epoch millis → string).

Deliberately unsupported (nondeterministic or engine-foreign — raise
``ELSyntaxError`` rather than silently misbehave): uuid, now, hostname,
nextInt, state access.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["ELSyntaxError", "is_el", "compile_template", "el_columns"]

_BIG = 1 << 30  # "to end of string" length for substr


class ELSyntaxError(ValueError):
    """Template does not parse under the supported EL subset."""


def is_el(template: object) -> bool:
    """Reference parity: ``isExpressionLanguagePresent`` — a ``${`` that is
    not escaped as ``$$`` marks the property as per-row EL."""
    if not isinstance(template, str):
        return False
    return re.search(r"(?<!\$)\$\{", template.replace("$$", "\x00\x00")) is not None


# --------------------------------------------------------------------- AST


@dataclass
class _Lit:
    value: object  # str | int | float | bool


@dataclass
class _Attr:
    name: str


@dataclass
class _Call:
    subject: object  # _Attr | _Lit | _Call
    func: str
    args: list


@dataclass
class _Concat:
    parts: list  # _Lit(str) | expression nodes


@dataclass
class _Multi:
    kind: str  # "any" | "all"
    names: list[str] | None  # explicit attribute (column) names, or None
    # until a regex matcher is resolved against the batch schema
    pattern: str | None = None  # anyMatchingAttribute/allMatchingAttributes
    # name regex — expanded at compile time via compile_template(columns=)


# ------------------------------------------------------------------ parser


class _Cursor:
    def __init__(self, s: str):
        self.s, self.i = s, 0

    def eof(self) -> bool:
        return self.i >= len(self.s)

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def skip_ws(self) -> None:
        while not self.eof() and self.s[self.i].isspace():
            self.i += 1

    def expect(self, ch: str) -> None:
        if self.peek() != ch:
            raise ELSyntaxError(f"expected {ch!r} at offset {self.i} in {self.s!r}")
        self.i += 1


_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_.\-]*")
_NUMBER = re.compile(r"-?\d+(\.\d+)?")


def _parse_template(template: str):
    """Top level: literal text interleaved with ``${...}`` expressions."""
    parts: list = []
    buf: list[str] = []
    i, n = 0, len(template)
    while i < n:
        if template.startswith("$$", i):
            buf.append("$")
            i += 2
        elif template.startswith("${", i):
            if buf:
                parts.append(_Lit("".join(buf)))
                buf = []
            cur = _Cursor(template)
            cur.i = i + 2
            parts.append(_parse_expr(cur))
            cur.skip_ws()
            cur.expect("}")
            i = cur.i
        else:
            buf.append(template[i])
            i += 1
    if buf:
        parts.append(_Lit("".join(buf)))
    if len(parts) == 1:
        return parts[0]
    return _Concat(parts)


def _parse_expr(cur: _Cursor):
    """Inside ``${ }``: subject followed by a ``:fn(...)`` chain."""
    cur.skip_ws()
    node: object
    if cur.peek() in "'\"":
        name = _parse_quoted(cur)
        # ${'quoted attr name'} — a quoted SUBJECT is an attribute ref
        node = _Attr(name)
    else:
        m = _IDENT.match(cur.s, cur.i)
        if not m:
            raise ELSyntaxError(f"expected attribute or function at offset {cur.i} in {cur.s!r}")
        word = m.group(0)
        cur.i = m.end()
        cur.skip_ws()
        if cur.peek() == "(":  # subjectless function
            if word in ("anyAttribute", "allAttributes"):
                args = _parse_args(cur)
                if not args or not all(
                    isinstance(x, _Lit) and isinstance(x.value, str) for x in args
                ):
                    raise ELSyntaxError(
                        f"{word}() takes one or more quoted attribute names"
                    )
                node = _Multi("any" if word == "anyAttribute" else "all",
                              [x.value for x in args])
            elif word in ("anyMatchingAttribute", "allMatchingAttributes"):
                args = _parse_args(cur)
                if (
                    len(args) != 1
                    or not isinstance(args[0], _Lit)
                    or not isinstance(args[0].value, str)
                ):
                    raise ELSyntaxError(f"{word}() takes exactly one quoted regex")
                try:
                    re.compile(args[0].value)
                except re.error as e:
                    raise ELSyntaxError(f"{word}(): bad regex {args[0].value!r}: {e}")
                node = _Multi(
                    "any" if word == "anyMatchingAttribute" else "all",
                    None,
                    pattern=args[0].value,
                )
            elif word == "literal":
                args = _parse_args(cur)
                if len(args) != 1 or not isinstance(args[0], _Lit):
                    raise ELSyntaxError("literal() takes exactly one literal argument")
                node = args[0]
            else:
                raise ELSyntaxError(f"unsupported subjectless function {word!r}")
        else:
            node = _Attr(word)
    while True:
        cur.skip_ws()
        if cur.peek() != ":":
            break
        cur.i += 1
        cur.skip_ws()
        m = _IDENT.match(cur.s, cur.i)
        if not m:
            raise ELSyntaxError(f"expected function name at offset {cur.i} in {cur.s!r}")
        func = m.group(0)
        cur.i = m.end()
        cur.skip_ws()
        args = _parse_args(cur) if cur.peek() == "(" else []
        node = _Call(node, func, args)
    return node


def _parse_args(cur: _Cursor) -> list:
    cur.expect("(")
    args: list = []
    cur.skip_ws()
    if cur.peek() == ")":
        cur.i += 1
        return args
    while True:
        cur.skip_ws()
        args.append(_parse_arg(cur))
        cur.skip_ws()
        if cur.peek() == ",":
            cur.i += 1
            continue
        cur.expect(")")
        return args


def _parse_arg(cur: _Cursor):
    ch = cur.peek()
    if ch in "'\"":
        return _Lit(_parse_quoted(cur))
    if cur.s.startswith("${", cur.i):
        cur.i += 2
        node = _parse_expr(cur)
        cur.skip_ws()
        cur.expect("}")
        return node
    if cur.s.startswith("true", cur.i):
        cur.i += 4
        return _Lit(True)
    if cur.s.startswith("false", cur.i):
        cur.i += 5
        return _Lit(False)
    m = _NUMBER.match(cur.s, cur.i)
    if m:
        cur.i = m.end()
        txt = m.group(0)
        return _Lit(float(txt) if "." in txt else int(txt))
    raise ELSyntaxError(f"bad argument at offset {cur.i} in {cur.s!r}")


def _parse_quoted(cur: _Cursor) -> str:
    quote = cur.peek()
    cur.i += 1
    out: list[str] = []
    while not cur.eof():
        ch = cur.s[cur.i]
        if ch == "\\" and cur.i + 1 < len(cur.s):
            out.append(cur.s[cur.i + 1])
            cur.i += 2
            continue
        if ch == quote:
            cur.i += 1
            return "".join(out)
        out.append(ch)
        cur.i += 1
    raise ELSyntaxError(f"unterminated string in {cur.s!r}")


# ---------------------------------------------------------------- compiler


def _lit_value(node, func: str):
    """Some mappings (substringAfter) need the literal python value."""
    if isinstance(node, _Lit):
        return node.value
    raise ELSyntaxError(f"{func}() requires a literal argument in this engine")


def _nonempty(c: Column) -> Column:
    return c.isNotNull() & (F.trim(c) != F.lit(""))


def _err_arity(f: str):
    raise ELSyntaxError(f"{f}() requires an argument")


def _multi_root(node):
    while isinstance(node, _Call):
        node = node.subject
    return node if isinstance(node, _Multi) else None


def _substitute(node, attr: _Attr):
    """Rebuild a call chain with the _Multi root replaced by one attribute."""
    if isinstance(node, _Multi):
        return attr
    if isinstance(node, _Call):
        return _Call(_substitute(node.subject, attr), node.func, node.args)
    return node


# functions whose result is a boolean — the only legal FINAL link of a
# multi-matcher chain (the per-attribute results fold with OR/AND, which
# is meaningless for strings/numbers and would otherwise surface as an
# opaque Catalyst analysis error at use time, ADVICE r4 #3)
_BOOL_FUNCS = frozenset(
    {
        "in", "equals", "equalsIgnoreCase", "contains", "startsWith",
        "endsWith", "matches", "find", "isEmpty", "isNull", "notNull",
        "not", "and", "or", "gt", "ge", "lt", "le",
    }
)


def _resolve_matching(node, columns: list[str]):
    """Expand regex multi-matchers against the static batch schema:
    ``anyMatchingAttribute('re')`` becomes an explicit-name _Multi over
    the columns whose name fullmatches the regex — deterministic at
    compile time, still one Catalyst tree (NiFi resolves the same regex
    against the flowfile's attribute map per record)."""
    if isinstance(node, _Multi) and node.pattern is not None:
        rx = re.compile(node.pattern)
        return _Multi(node.kind, [c for c in columns if rx.fullmatch(c)])
    if isinstance(node, _Call):
        return _Call(
            _resolve_matching(node.subject, columns),
            node.func,
            [_resolve_matching(a, columns) for a in node.args],
        )
    if isinstance(node, _Concat):
        return _Concat([_resolve_matching(p, columns) for p in node.parts])
    return node


def _needs_schema(node) -> bool:
    if isinstance(node, _Multi):
        return node.pattern is not None
    if isinstance(node, _Call):
        return _needs_schema(node.subject) or any(_needs_schema(a) for a in node.args)
    if isinstance(node, _Concat):
        return any(_needs_schema(p) for p in node.parts)
    return False


def _compile(node) -> Column:
    # anyAttribute/allAttributes: the whole function chain evaluates once
    # per named attribute (column), then the per-attribute booleans fold
    # with OR (any) / AND (all) — the NiFi multi-matcher semantics, still
    # one Catalyst expression tree with zero Python in the data plane
    root = _multi_root(node) if isinstance(node, _Call) else None
    if isinstance(node, _Multi):
        raise ELSyntaxError(
            f"{'anyAttribute' if node.kind == 'any' else 'allAttributes'}() "
            "needs a boolean function chain (e.g. :contains(...))"
        )
    if root is not None:
        if node.func not in _BOOL_FUNCS:
            raise ELSyntaxError(
                f"a multi-attribute matcher chain must END in a boolean test "
                f"(one of {sorted(_BOOL_FUNCS)}), got :{node.func}() — the "
                "per-attribute results fold with OR/AND"
            )
        if root.names is None:
            raise ELSyntaxError(
                "anyMatchingAttribute()/allMatchingAttributes() need the "
                "batch schema to resolve the name regex: compile with "
                "compile_template(template, columns=df.columns)"
            )
        if not root.names:
            # regex matched no columns: vacuous fold — any() of nothing is
            # false, all() of nothing is true
            return F.lit(root.kind == "all")
        cols = [_compile(_substitute(node, _Attr(nm))) for nm in root.names]
        out = cols[0]
        for c in cols[1:]:
            out = (out | c) if root.kind == "any" else (out & c)
        return out
    if isinstance(node, _Lit):
        return F.lit(node.value)
    if isinstance(node, _Attr):
        # backtick-quote non-plain names: a bare F.col("a.b") would resolve
        # as a struct-field path, but an EL attribute is a TOP-LEVEL column
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", node.name):
            return F.col(node.name)
        return F.col("`" + node.name.replace("`", "``") + "`")
    if isinstance(node, _Concat):
        return F.concat(*[_compile(p).cast("string") for p in node.parts])
    if isinstance(node, _Call):
        return _compile_call(node)
    raise ELSyntaxError(f"unknown node {node!r}")


def _compile_call(node: _Call) -> Column:
    c = _compile(node.subject)
    f, args = node.func, node.args
    a = [_compile(x) for x in args]

    def need(n: int) -> None:
        if len(args) != n:
            raise ELSyntaxError(f"{f}() takes {n} argument(s), got {len(args)}")

    # ---- string
    if f == "trim":
        return F.trim(c)
    if f == "toUpper":
        return F.upper(c)
    if f == "toLower":
        return F.lower(c)
    if f == "substring":
        # NiFi: 0-based start, exclusive end (end optional = to length)
        if len(args) not in (1, 2):
            raise ELSyntaxError(f"substring() takes 1-2 arguments, got {len(args)}")
        if len(args) == 1:
            return c.substr(a[0].cast("int") + F.lit(1), F.lit(_BIG))
        need(2)
        return c.substr(a[0].cast("int") + F.lit(1), (a[1] - a[0]).cast("int"))
    if f in ("substringBefore", "substringAfter", "matches", "find", "padLeft", "padRight"):
        if not args:
            raise ELSyntaxError(f"{f}() requires an argument")
    if f == "substringBefore":
        need(1)
        # whole subject when the search string is absent — substring_index's
        # contract too, so this is exact parity
        return F.substring_index(c, str(_lit_value(args[0], f)), 1)
    if f == "substringAfter":
        sep = str(_lit_value(args[0], f))
        pos = F.locate(sep, c)
        return F.when(pos > 0, c.substr(pos + len(sep), F.lit(_BIG))).otherwise(c)
    if f == "replace":
        need(2)
        return F.replace(c, a[0], a[1])
    if f == "replaceAll":
        need(2)
        return F.regexp_replace(c, str(_lit_value(args[0], f)), str(_lit_value(args[1], f)))
    if f == "replaceNull":
        need(1)
        return F.coalesce(c, a[0])
    if f == "replaceEmpty":
        need(1)
        return F.when(_nonempty(c), c).otherwise(a[0])
    if f == "append":
        need(1)
        return F.concat(c, a[0].cast("string"))
    if f == "prepend":
        need(1)
        return F.concat(a[0].cast("string"), c)
    if f == "length":
        return F.length(c)
    if f == "padLeft":
        size = args and _lit_value(args[0], f)
        pad = str(_lit_value(args[1], f)) if len(args) > 1 else "_"
        return F.lpad(c, int(size), pad)
    if f == "padRight":
        size = args and _lit_value(args[0], f)
        pad = str(_lit_value(args[1], f)) if len(args) > 1 else "_"
        return F.rpad(c, int(size), pad)
    if f == "getDelimitedField":
        # NiFi: 1-based field index, literal delimiter (default ',')
        idx = int(_lit_value(args[0], f)) if args else _err_arity(f)
        delim = str(_lit_value(args[1], f)) if len(args) > 1 else ","
        # try_element_at: a missing field is null, not an ANSI index error
        return F.try_element_at(F.split(c, re.escape(delim)), F.lit(idx))
    if f == "indexOf":
        need(1)
        # NiFi: 0-based, -1 when absent — locate() is 1-based, 0 when absent
        return (F.locate(str(_lit_value(args[0], f)), c) - 1).cast("long")
    if f == "urlEncode":
        return F.url_encode(c)
    if f == "urlDecode":
        return F.url_decode(c)
    if f == "base64Encode":
        return F.base64(c.cast("binary"))
    if f == "base64Decode":
        return F.unbase64(c).cast("string")
    # ---- date/time (deterministic only — now()/nextInt stay unsupported).
    # Pattern dialect caveat: Spark datetime patterns, which cover the
    # common SimpleDateFormat forms (yyyy-MM-dd HH:mm:ss etc.) but are not
    # the full Java SimpleDateFormat language.
    if f == "toDate":
        # string → epoch millis (NiFi's Date subject, represented numerically
        # so :format()/:toNumber() chain exactly)
        fmt = str(_lit_value(args[0], f)) if args else _err_arity(f)
        return F.unix_millis(F.to_timestamp(c, fmt))
    if f == "format":
        # epoch-millis number → formatted string
        fmt = str(_lit_value(args[0], f)) if args else _err_arity(f)
        return F.date_format(F.timestamp_millis(c.cast("long")), fmt)
    # ---- tests / boolean
    if f == "in":
        if not args:
            _err_arity(f)
        return c.isin(*[_lit_value(x, f) for x in args])
    if f == "equals":
        need(1)
        return c == a[0]
    if f == "equalsIgnoreCase":
        need(1)
        return F.lower(c) == F.lower(a[0].cast("string"))
    if f == "contains":
        need(1)
        return c.contains(a[0])
    if f == "startsWith":
        need(1)
        return c.startswith(a[0])
    if f == "endsWith":
        need(1)
        return c.endswith(a[0])
    if f == "matches":
        # NiFi matches() anchors the whole subject; rlike() is a find
        return c.rlike("^(?:" + str(_lit_value(args[0], f)) + ")$")
    if f == "find":
        return c.rlike(str(_lit_value(args[0], f)))
    if f == "isEmpty":
        return ~_nonempty(c)
    if f == "isNull":
        return c.isNull()
    if f == "notNull":
        return c.isNotNull()
    if f == "not":
        return ~c
    if f == "and":
        need(1)
        return c & a[0]
    if f == "or":
        need(1)
        return c | a[0]
    if f == "ifElse":
        need(2)
        return F.when(c, a[0]).otherwise(a[1])
    # ---- numeric
    if f == "toNumber":
        # try_cast: a malformed subject is a null, not an ANSI cast error —
        # EL evaluation must never fail the row (the route gate does that)
        return c.try_cast("long")
    if f == "toDecimal":
        return c.try_cast("double")
    if f == "toString":
        return c.cast("string")
    if f in ("plus", "minus", "multiply", "divide", "mod", "gt", "ge", "lt", "le"):
        need(1)
        ops = {
            "plus": lambda x, y: x + y,
            "minus": lambda x, y: x - y,
            "multiply": lambda x, y: x * y,
            "divide": lambda x, y: x / y,
            "mod": lambda x, y: x % y,
            "gt": lambda x, y: x > y,
            "ge": lambda x, y: x >= y,
            "lt": lambda x, y: x < y,
            "le": lambda x, y: x <= y,
        }
        return ops[f](c, a[0])
    raise ELSyntaxError(f"unsupported EL function {f!r}")


def compile_template(template: str, columns: list[str] | None = None) -> Column:
    """Compile an EL template into ONE Catalyst Column (driver-side, once).

    A template that is exactly one ``${...}`` keeps its native type
    (boolean route predicates, numeric thresholds); mixed text renders to
    string via concat — matching how NiFi coerces evaluated properties.

    ``columns``: the batch's column names, needed only to resolve
    ``anyMatchingAttribute``/``allMatchingAttributes`` regexes (compile
    fails with ``ELSyntaxError`` if such a matcher appears and no columns
    are given). Templates without regex matchers ignore it.
    """
    node = _parse_template(template)
    if columns is not None:
        node = _resolve_matching(node, list(columns))
    return _compile(node)


def template_needs_schema(template: str) -> bool:
    """True iff the template uses a regex multi-matcher and so must be
    compiled with ``columns=`` (lets callers defer compilation until a
    batch schema is known, keeping compile-once for everything else)."""
    return _needs_schema(_parse_template(template))


def validate_template(template: str) -> None:
    """Parse-only syntax check — pure Python, no Spark session required, so
    config validation (Settings) can reject bad templates at construction
    time. Unknown function NAMES are still caught later at compile time."""
    _parse_template(template)


def el_columns(properties: dict[str, str], columns: list[str] | None = None) -> dict[str, Column]:
    """The UpdateAttribute-with-EL analog: each property whose value
    contains EL compiles per-row; plain values become constants
    (AbstractTDFProcessor.java:113-115's isExpressionLanguagePresent gate).

    Use with ``df.withColumns(el_columns({...}))`` — every derived column
    stays inside whole-stage codegen.
    """
    return {
        name: compile_template(v, columns) if is_el(v) else F.lit(v)
        for name, v in properties.items()
    }
