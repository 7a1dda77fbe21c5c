"""NiFi expression-language analog (ztdf_spark/el.py): templates compile to
Catalyst columns and match NiFi EL guide semantics per row.

Reference behavior being mirrored: AbstractTDFProcessor.java:113-115
(evaluate only when EL is present) and AbstractToProcessor.java:56-62
(attribute-driven config like kas_url)."""

import pytest
from pyspark.sql import functions as F

from ztdf_spark.el import ELSyntaxError, compile_template, el_columns, is_el


@pytest.fixture(scope="module")
def rows(spark):
    return spark.createDataFrame(
        [
            ("a1", "  Alpha  ", "purchase", 7, "https://kas.example.com"),
            ("b2", "beta", "signup", 2100, None),
            ("c3", "", "error", 0, "  "),
            ("d4", None, "update", 512, "k1,k2"),
        ],
        "id string, name string, source string, n_tok long, kas_url string",
    )


def _vals(df, col):
    return [r[0] for r in df.select(col).orderBy("id").collect()]


def _eval(rows, template):
    return [
        r[0]
        for r in rows.select(compile_template(template).alias("v"), "id").orderBy("id").collect()
    ]


def test_is_el_gate():
    assert is_el("${a}")
    assert is_el("x${a:trim()}y")
    assert not is_el("plain value")
    assert not is_el("price in $$ {not el}")
    assert not is_el(True)
    # $$ escapes one $, the following ${..} IS el (NiFi escaping rule)
    assert is_el("$$${a}")


def test_plain_attr_and_mixed_text(rows):
    assert _eval(rows, "${source}") == ["purchase", "signup", "error", "update"]
    assert _eval(rows, "ep-${source}/v2") == [
        "ep-purchase/v2",
        "ep-signup/v2",
        "ep-error/v2",
        "ep-update/v2",
    ]
    # $$ renders as a literal dollar, the ${..} after it still evaluates
    assert _eval(rows, "$$${n_tok}") == ["$7", "$2100", "$0", "$512"]


def test_string_chain(rows):
    got = _eval(rows, "${name:trim():toUpper():append('!')}")
    assert got == ["ALPHA!", "BETA!", "!", None]
    assert _eval(rows, "${source:substring(0,4):toUpper()}") == ["PURC", "SIGN", "ERRO", "UPDA"]
    assert _eval(rows, "${source:substringBefore('ch')}") == ["pur", "signup", "error", "update"]
    assert _eval(rows, "${source:substringAfter('ch')}") == ["ase", "signup", "error", "update"]
    assert _eval(rows, "${name:replace('a','o')}") == ["  Alpho  ", "beto", "", None]
    assert _eval(rows, "${id:replaceAll('[0-9]+','#')}") == ["a#", "b#", "c#", "d#"]
    assert _eval(rows, "${id:padLeft(4,'0')}") == ["00a1", "00b2", "00c3", "00d4"]


def test_null_and_empty_handling(rows):
    assert _eval(rows, "${kas_url:replaceNull('D')}") == [
        "https://kas.example.com",
        "D",
        "  ",
        "k1,k2",
    ]
    # replaceEmpty also swallows whitespace-only and null (NiFi semantics)
    assert _eval(rows, "${kas_url:replaceEmpty('D')}") == [
        "https://kas.example.com",
        "D",
        "D",
        "k1,k2",
    ]
    assert _eval(rows, "${kas_url:isEmpty()}") == [False, True, True, False]
    assert _eval(rows, "${name:isNull():ifElse('missing','present')}") == [
        "present",
        "present",
        "present",
        "missing",
    ]


def test_boolean_and_numeric(rows):
    assert _eval(rows, "${n_tok:multiply(4):gt(8192):ifElse('jumbo','standard')}") == [
        "standard",
        "jumbo",
        "standard",
        "standard",
    ]
    assert _eval(rows, "${n_tok:plus(1):toString()}") == ["8", "2101", "1", "513"]
    assert _eval(rows, "${source:equals('error'):or(${n_tok:gt(1000)})}") == [
        False,
        True,
        True,
        False,
    ]
    assert _eval(rows, "${source:matches('pur.*')}") == [True, False, False, False]
    assert _eval(rows, "${source:find('r')}") == [True, False, True, False]
    # substringAfter falls through to the whole subject when absent, and a
    # non-numeric cast is a SQL null, not an error
    assert _eval(rows, "${id:substringAfter('a'):toNumber()}") == [1, None, None, None]


def test_embedded_expression_args(rows):
    assert _eval(rows, "${source:append(${id})}") == [
        "purchasea1",
        "signupb2",
        "errorc3",
        "updated4",
    ]
    assert _eval(rows, "${literal('kas-'):append(${source:substring(0,3)})}") == [
        "kas-pur",
        "kas-sig",
        "kas-err",
        "kas-upd",
    ]


def test_el_columns_constant_gate(rows):
    cols = el_columns({"a": "no el here", "b": "${source:toUpper()}"})
    out = rows.withColumns(cols)
    got = [(r["a"], r["b"]) for r in out.orderBy("id").collect()]
    assert got[0] == ("no el here", "PURCHASE")


def test_whole_stage_codegen_no_python(rows, spark):
    """The entire stamped projection must be Catalyst-only: no
    BatchEvalPython/ArrowEvalPython node may appear in the physical plan."""
    cols = el_columns(
        {
            "endpoint": "https://kas-${source:substring(0,4):toUpper()}.example.com/v2",
            "cls": "${n_tok:multiply(4):gt(8192):ifElse('jumbo','standard')}",
        }
    )
    df = rows.withColumns(cols)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # codegen'd stages render as "*(n)" in the executed-plan tree
    assert "*(" in plan or "WholeStageCodegen" in plan


def test_syntax_errors(spark):  # Column building needs an active context
    for bad in (
        "${a:uuid()}",  # nondeterministic — unsupported by design
        "${now()}",
        "${a:substring(}",
        "${a",
        "${a:unknownFn()}",
        "${a:equals('x','y')}",  # arity
    ):
        with pytest.raises(ELSyntaxError):
            compile_template(bad)


def test_quoted_attribute_name(spark):
    df = spark.createDataFrame([("v",)], ["weird.name"])
    got = df.select(compile_template("${'weird.name'}:ok").alias("v")).collect()
    assert got[0][0] == "v:ok"


def test_property_el_matches_reference_interpreter(spark):
    """Property test: random EL templates (drawn as ASTs, rendered to
    template strings) evaluate identically through the Catalyst compiler
    and an INDEPENDENT pure-Python reference interpreter, across rows with
    nulls, empties, and whitespace."""
    from hypothesis import given, settings, strategies as st

    ROWS = [
        {"s": "Alpha", "t": "  pad  ", "n": 7},
        {"s": "", "t": "beta", "n": 2100},
        {"s": None, "t": None, "n": 0},
        {"s": "gamma delta", "t": "X", "n": None},
    ]
    df = spark.createDataFrame(
        [(i, r["s"], r["t"], r["n"]) for i, r in enumerate(ROWS)],
        "i long, s string, t string, n long",
    )

    # ---- reference interpreter (independent of el.py internals) ----
    def ev(node, row):
        kind = node[0]
        if kind == "attr":
            return row[node[1]]
        if kind == "lit":
            return node[1]
        if kind == "call":
            sub = ev(node[1], row)
            fn, args = node[2], [ev(a, row) for a in node[3]]
            if fn in ("trim", "toUpper", "toLower", "length") and sub is None:
                return None
            if fn == "trim":
                return str(sub).strip()
            if fn == "toUpper":
                return str(sub).upper()
            if fn == "toLower":
                return str(sub).lower()
            if fn == "length":
                return len(str(sub))
            if fn == "append":
                return None if sub is None or args[0] is None else str(sub) + str(args[0])
            if fn == "prepend":
                return None if sub is None or args[0] is None else str(args[0]) + str(sub)
            if fn == "replaceNull":
                return args[0] if sub is None else sub
            if fn == "isEmpty":
                return sub is None or str(sub).strip() == ""
            if fn == "equals":
                return None if sub is None else sub == args[0]
            if fn == "plus":
                return None if sub is None else sub + args[0]
            if fn == "ifElse":
                if sub is None:
                    return args[1]  # SQL CASE: null condition -> otherwise
                return args[0] if sub else args[1]
            raise AssertionError(fn)
        if kind == "mcall":
            # multi-matcher: apply the chain per attribute, fold with SQL
            # three-valued OR/AND — independent of el.py's substitution
            _k, mkind, names, chain = node
            vals = []
            for nm in names:
                sub = ("attr", nm)
                for fn, args in chain:
                    sub = ("call", sub, fn, args)
                vals.append(ev(sub, row))
            acc = vals[0]
            for v in vals[1:]:
                if mkind == "any":
                    acc = True if (acc is True or v is True) else (None if (acc is None or v is None) else False)
                else:
                    acc = False if (acc is False or v is False) else (None if (acc is None or v is None) else True)
            return acc
        raise AssertionError(kind)

    def render(node):
        kind = node[0]
        if kind == "mcall":
            _k, mkind, names, chain = node
            head = ("anyAttribute" if mkind == "any" else "allAttributes")
            head += "(" + ", ".join(f"'{n}'" for n in names) + ")"
            for fn, args in chain:
                rendered = ", ".join(render(a) for a in args)
                head += f":{fn}({rendered})"
            return head
        if kind == "attr":
            return node[1]
        if kind == "lit":
            v = node[1]
            return f"'{v}'" if isinstance(v, str) else str(v)
        sub, fn, args = render(node[1]), node[2], node[3]
        rendered = ", ".join(
            "${" + render(a) + "}" if a[0] != "lit" else render(a) for a in node[3]
        )
        return f"{sub}:{fn}({rendered})" if args else f"{sub}:{fn}()"

    str_attr = st.sampled_from([("attr", "s"), ("attr", "t")])
    str_lit = st.sampled_from([("lit", "x"), ("lit", "Y z"), ("lit", "")])
    num_attr = st.just(("attr", "n"))

    def str_expr(depth):
        if depth <= 0:
            return str_attr
        inner = st.deferred(lambda: str_expr(depth - 1))
        return st.one_of(
            str_attr,
            st.tuples(inner).map(lambda t: ("call", t[0], "trim", [])),
            st.tuples(inner).map(lambda t: ("call", t[0], "toUpper", [])),
            st.tuples(inner).map(lambda t: ("call", t[0], "toLower", [])),
            st.tuples(inner, str_lit).map(lambda t: ("call", t[0], "append", [t[1]])),
            st.tuples(inner, str_lit).map(lambda t: ("call", t[0], "prepend", [t[1]])),
            st.tuples(inner, str_lit).map(lambda t: ("call", t[0], "replaceNull", [t[1]])),
            st.tuples(inner, str_lit, str_lit).map(
                lambda t: ("call", ("call", t[0], "isEmpty", []), "ifElse", [t[1], t[2]])
            ),
        )

    bool_chain = st.sampled_from([
        [("isEmpty", [])],
        [("trim", []), ("isEmpty", [])],
        [("equals", [("lit", "beta")])],
        [("toUpper", []), ("equals", [("lit", "ALPHA")])],
        [("length", []), ("equals", [("lit", 5)])],
    ])
    multi = st.tuples(
        st.sampled_from(["any", "all"]),
        st.sampled_from([["s", "t"], ["t", "s"], ["s"], ["s", "t", "s"]]),
        bool_chain,
    ).map(lambda t: ("mcall", t[0], t[1], t[2]))

    top = st.one_of(
        multi,
        str_expr(3),
        st.tuples(str_expr(2), str_lit).map(lambda t: ("call", t[0], "equals", [t[1]])),
        st.tuples(num_attr, st.sampled_from([("lit", 1), ("lit", 40)])).map(
            lambda t: ("call", t[0], "plus", [t[1]])
        ),
        st.tuples(str_expr(1)).map(lambda t: ("call", t[0], "length", [])),
    )

    @settings(max_examples=25, deadline=None)
    @given(top)
    def run(ast):
        template = "${" + render(ast) + "}"
        got = [
            r["v"]
            for r in df.select("i", compile_template(template).alias("v")).orderBy("i").collect()
        ]
        want = [ev(ast, row) for row in ROWS]
        assert got == want, f"{template}: {got} != {want}"

    run()


def test_arity_errors_are_el_syntax_errors(spark):
    for bad in ("${a:substring()}", "${a:matches()}", "${a:padLeft()}",
                "${a:substringAfter()}", "${a:find()}", "${a:padRight()}"):
        with pytest.raises(ELSyntaxError):
            compile_template(bad)


def test_delimited_index_url_base64_date(rows, spark):
    assert _eval(rows, "${kas_url:getDelimitedField(2)}") == [None, None, None, "k2"]
    assert _eval(rows, "${source:indexOf('ch')}") == [3, -1, -1, -1]
    assert _eval(rows, "${source:in('error','signup')}") == [False, True, True, False]
    df = spark.createDataFrame([("a b/c", "2024-03-05")], "s string, d string")
    assert df.select(compile_template("${s:urlEncode():urlDecode()}").alias("v")).collect()[0][0] == "a b/c"
    assert df.select(compile_template("${s:base64Encode():base64Decode()}").alias("v")).collect()[0][0] == "a b/c"
    millis = df.select(compile_template("${d:toDate('yyyy-MM-dd')}").alias("v")).collect()[0][0]
    assert millis == 1709596800000  # 2024-03-05T00:00:00Z
    got = df.select(
        compile_template("${d:toDate('yyyy-MM-dd'):format('yyyy/MM/dd')}").alias("v")
    ).collect()[0][0]
    assert got == "2024/03/05"


def test_any_attribute_all_attributes(rows):
    """Multi-attribute matchers: the chain runs per named attribute and
    folds OR (any) / AND (all) — NiFi EL guide semantics over explicit
    names, compiled to one boolean Catalyst tree."""
    # name contains 'a' (case-sensitive) OR source contains 'a'; null
    # attributes follow SQL three-valued logic (null OR true = true)
    got = _eval(rows, "${anyAttribute('name', 'source'):contains('a')}")
    assert got == [True, True, False, True]
    got_all = _eval(rows, "${allAttributes('name', 'source'):contains('a')}")
    # b2: 'signup' has no 'a'; c3: both miss; d4: null AND true = null
    assert got_all == [True, False, False, None]
    # chains longer than one call apply fully per attribute
    got_len = _eval(rows, "${anyAttribute('name', 'kas_url'):length():gt(10)}")
    # b2: false OR null(kas) = null; d4: null(name) OR false = null
    assert got_len == [True, None, False, None]
    # notNull folds with AND
    got_nn = _eval(rows, "${allAttributes('name', 'kas_url'):notNull()}")
    assert got_nn == [True, False, True, False]
    # mixed into text: boolean renders as string like any EL part
    got_mix = _eval(rows, "v=${anyAttribute('name','source'):isEmpty()}")
    assert got_mix == ["v=false", "v=false", "v=true", "v=true"]


def test_multi_attribute_syntax_errors(spark):
    import pytest

    from ztdf_spark.el import ELSyntaxError

    with pytest.raises(ELSyntaxError):
        compile_template("${anyAttribute('a')}")  # no chain
    with pytest.raises(ELSyntaxError):
        compile_template("${anyAttribute():notNull()}")  # no names
    with pytest.raises(ELSyntaxError):
        compile_template("${anyAttribute(5):notNull()}")  # non-string name
    with pytest.raises(ELSyntaxError, match="batch schema"):
        # regex form needs the schema: compile without columns= is an error
        compile_template("${anyMatchingAttribute('a.*'):notNull()}")
    with pytest.raises(ELSyntaxError, match="bad regex"):
        compile_template("${anyMatchingAttribute('a[('):notNull()}")
    # a non-boolean final link is rejected at COMPILE time, not as an
    # opaque Catalyst analysis error at use time (OR over strings)
    with pytest.raises(ELSyntaxError, match="boolean"):
        compile_template("${anyAttribute('a','b'):toUpper()}")
    with pytest.raises(ELSyntaxError, match="boolean"):
        compile_template("${allAttributes('a','b'):trim():length()}")


def test_matching_attribute_regex_expansion(rows):
    """anyMatchingAttribute/allMatchingAttributes: the name regex expands
    against the static batch schema at compile time — same folded boolean
    tree as the explicit-name matchers."""
    cols = rows.columns  # id, name, source, n_tok, kas_url

    def ev(template):
        return [
            r[0]
            for r in rows.select(
                compile_template(template, columns=cols).alias("v"), "id"
            ).orderBy("id").collect()
        ]

    # regex {name, source} ≡ explicit anyAttribute('name','source')
    got = ev("${anyMatchingAttribute('name|source'):contains('a')}")
    assert got == [True, True, False, True]
    got_all = ev("${allMatchingAttributes('name|source'):contains('a')}")
    assert got_all == [True, False, False, None]
    # fullmatch semantics: 'sour' must NOT match the 'source' column
    assert ev("${anyMatchingAttribute('sour'):notNull()}") == [False] * 4
    # vacuous folds: any() of nothing = false, all() of nothing = true
    assert ev("${anyMatchingAttribute('zzz.*'):notNull()}") == [False] * 4
    assert ev("${allMatchingAttributes('zzz.*'):notNull()}") == [True] * 4
    # boolean-chain rule applies to the regex form too
    with pytest.raises(ELSyntaxError, match="boolean"):
        compile_template("${anyMatchingAttribute('name'):toUpper()}", columns=cols)


def test_template_needs_schema_gate():
    from ztdf_spark.el import template_needs_schema

    assert template_needs_schema("${anyMatchingAttribute('a.*'):notNull()}")
    assert template_needs_schema("x${allMatchingAttributes('k_.'):isEmpty()}y")
    assert not template_needs_schema("${anyAttribute('a','b'):notNull()}")
    assert not template_needs_schema("${a:trim()}")
