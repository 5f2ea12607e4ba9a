"""Property-based differential testing of the native jq subset.

Random records × random programs drawn from the natively-translatable
grammar; every program's native Column translation must produce exactly
the rows the real ``jq`` binary produces (the reference's engine —
ext/jq/connector.go). Programs that leave the subset must raise
JQUnsupported (→ faithful binary fallback), never silently mis-compile.
"""

from __future__ import annotations

import json
import subprocess

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from optimus_any2any_spark.compiler.jq import JQUnsupported, translate_jq

# Record space: fixed schema, varied values (incl. nulls and boundary
# strings that exercise startswith/ltrimstr edge cases).
_NAMES = st.one_of(
    st.none(),
    # non-ASCII samples included deliberately: jq's index/rindex return
    # UTF-8 BYTE offsets, so multibyte prefixes are where the native
    # compilation can silently diverge (ADVICE r3)
    st.sampled_from(
        [
            "",
            "a",
            "ab",
            "alice",
            "bob",
            "prefix_x",
            "x_suffix",
            "héllo",
            "ærlig_ali",
            "日本語li日本",
            "héli´çe",
        ]
    ),
)
_RECORDS = st.lists(
    st.fixed_dictionaries(
        {
            "id": st.integers(min_value=-100, max_value=100),
            "name": _NAMES,
            "age": st.integers(min_value=0, max_value=99),
            "flag": st.one_of(st.none(), st.booleans()),
            "tags": st.lists(
                st.sampled_from(["x", "y", "zz", ""]), max_size=3
            ),
        }
    ),
    min_size=1,
    max_size=8,
)

# Program space: the native grammar's riskiest corners — piped string
# builtins, '//', null-aware '+', boolean logic over nullable fields.
_PROGRAMS = st.sampled_from(
    [
        ".[] | select(.age > 50)",
        ".[] | select(.age >= 25 and .age < 75)",
        ".[] | select(.id < 0 or .age > 90)",
        ".[] | {id, age}",
        ".[] | {id: .id, a2: (.age * 2 + 1)}",
        ".[] | del(.flag)",
        ".[] | . + {agesq: (.age * .age)}",
        ".[] | del(.age) + {age: (.id % 7)}",
        '.[] | {v: (.name // "anon")}',
        ".[] | {f: (.flag // true)}",
        ".[] | {f: (.flag // false)}",
        '.[] | select(.flag // false) | {id}',
        ".[] | select(.flag | not)",
        ".[] | {c: (.name + .name)}",
        '.[] | {c: (.name + "_t")}',
        '.[] | {c: ("p_" + .name)}',
        '.[] | {status: (if .age > 50 then "old" else "young" end)}',
        ".[] | {f: (if .flag then 1 else 0 end)}",
        '.[] | {b: (if .age < 20 then "a" elif .age < 60 then "b" else "c" end)}',
        '.[] | select(if .name == "alice" then true else .age > 90 end)',
        '.[] | {h: has("name"), m: has("missing")}',
        ".[] | {t0: .tags[0]}",
        ".[] | {n: (.tags | length)}",
        ".[] | {u: (.tags | map(ascii_upcase))}",
        '.[] | {uj: (.tags | map(ascii_upcase) | join("+"))}',
        ".[] | {s: (.tags | sort)}",
        ".[] | {q: (.tags | unique)}",
        ".[] | {r: (.tags | reverse)}",
        ".[] | {a: (.tags | add)}",
        '.[] | {su: (.tags | sort | join(","))}',
        '.[] | {j: (.tags | join("-"))}',
        '.[] | select((.tags | length) > 1)',
        # reduce / foreach (native F.aggregate scans)
        '.[] | {n: (reduce .tags[] as $t (0; . + ($t|length)))}',
        '.[] | {c: (reduce .tags[] as $t (""; . + $t))}',
        '.[] | {r: [foreach .tags[] as $t (0; . + ($t|length))]}',
        '.[] | {e: [foreach .tags[] as $t (0; . + 1; . * 2)]}',
        '.[] | select((reduce .tags[] as $t (0; . + 1)) > 1)',
        # string interpolation (ints/strings/booleans/null)
        '.[] | {lab: "u-\\(.id)"}',
        '.[] | {m: "\\(.name)!"}',
        '.[] | {b: "\\(.age > 50)-\\(.id + 1)"}',
        # polymorphic '+'/'-' on arrays and null identity
        '.[] | {t: (.tags + ["q"])}',
        '.[] | {t2: (.tags + .tags)}',
        '.[] | {d: (.tags - ["x", "zz"])}',
        '.[] | {v: (null + .age)}',
        '.[] | {v: (.missing + .age)}',
        '.[] | {lit: ["k", .name // "d"]}',
        # assignment stages, map() expressions, nested objects
        ".[] | .age += 1",
        ".[] | .age = (.id * 2)",
        '.[] | .name //= "anon"',
        '.[] | {m: (.tags | map(. + "s"))}',
        ".[] | {ml: (.tags | map(length))}",
        ".[] | {o: {i: .id, t: .tags}}",
        '.[] | {mn: (.tags | min), mx: (.tags | max)}',
        '.[] | {k: keys}',
        # round-3: slices, map(select), tojson, formats, container
        # interpolation, total comparisons over nullable fields
        ".[] | {s: .tags[0:2]}",
        ".[] | {s: .tags[-2:]}",
        ".[] | {s: .tags[1:99]}",
        ".[] | {s: .tags[2:1]}",
        '.[] | {f: (.tags | map(select(. != "x")))}',
        '.[] | {f: (.tags | map(select(length > 0)))}',
        ".[] | {j: (.tags | tojson)}",
        ".[] | {j: (.id | tojson)}",
        ".[] | {c: (.tags | @csv)}",
        ".[] | {c: (.tags | @tsv)}",
        '.[] | {t: "t=\\(.tags)"}',
        '.[] | select(.name != "alice")',
        '.[] | select(.name < "b")',
        '.[] | select(.name >= "b")',
        ".[] | {eq: (.flag == true), ne: (.flag != true)}",
        ".[] | select(.flag != true)",
        ".[] | {lt: (.name < .name), le: (.name <= .name)}",
        # round-3b: type (total), comma fan-out, object explode,
        # todate/round over derived numbers
        ".[] | {t: (.name | type), u: (.flag | type), v: (.tags | type)}",
        ".[] | {id}, {age}",
        ".[] | select(.age > 50), select(.age <= 50)",
        ".[] | ., {only: .id}",
        '.[] | {id}, {id: (.id + 1000)} | select(.id >= 0)',
        ".[] | {id, w: .tags[]}",
        ".[] | {d: (.age * 86400 | todate)}",
        ".[] | {r: ((.age / 7) | round)}",
        ".[] | {rt: (.age * 3600 | todate | fromdate)}",
        ".[] | {j: (.age | @json)}",
    ]
)

# Programs whose builtins ERROR in jq on null input — valid to compare
# only on records where name is non-null.
_STRING_PROGRAMS = st.sampled_from(
    [
        '.[] | select(.name | startswith("a"))',
        '.[] | select(.name | endswith("e"))',
        '.[] | select(.name | contains("li"))',
        '.[] | select(.name | test("^[ap]"))',
        ".[] | {n: (.name | length)}",
        '.[] | {t: (.name | ltrimstr("prefix_"))}',
        '.[] | {t: (.name | rtrimstr("_suffix"))}',
        '.[] | {p: (.name | split("l") | length)}',
        ".[] | {u: (.name | ascii_upcase)}",
        # round-3: regex replace, flags, @base64, string slices
        '.[] | {g: (.name | gsub("[aeiou]"; "."))}',
        '.[] | {g: (.name | gsub("x"; "yy"))}',
        '.[] | {g: (.name | sub("[bl]"; "#"))}',
        '.[] | select(.name | test("ALICE"; "i"))',
        ".[] | {b: (.name | @base64)}",
        ".[] | {s: .name[1:4]}",
        ".[] | {s: .name[-2:]}",
        '.[] | {z: (.name | gsub("i"; ""))[0:3]}',
        # round-3b string builtins: byte length, index/rindex, inside,
        # regex split/splits, scan collection, capture stage, formats,
        # repetition
        ".[] | {b: (.name | utf8bytelength)}",
        '.[] | {i: (.name | index("li")), r: (.name | rindex("li"))}',
        '.[] | {i: (.name | index("x_"))}',
        '.[] | select(.name | inside("alice bob prefix_x"))',
        '.[] | {p: (.name | split("[i_]"; ""))}',
        '.[] | {p: (.name | split("X"; "i"))}',
        '.[] | {p: [.name | splits("[aeiou]")]}',
        '.[] | {m: [.name | scan("[a-f]+")]}',
        '.[] | .name | capture("(?<head>^[a-z])(?<rest>.*)")',
        ".[] | {h: (.name | @html)}",
        ".[] | {q: (.name | @sh)}",
        ".[] | {x: (.name * 2)}",
        ".[] | {x: (.name * 0)}",
        ".[] | {b64: (.name | @base64 | @base64d)}",
    ]
)

_SCHEMA = "id long, name string, age long, flag boolean, tags array<string>"


def _jq(program: str, rows: list[dict]) -> list[dict]:
    # serialize records exactly as the pipeline boundary does: the
    # jq-binary fallback feeds to_json(struct(*)) output, which DROPS
    # null fields — so null and absent are indistinguishable through
    # either path (the documented has() relaxation). The differential
    # must feed jq those same bytes, not a null-keeping dump.
    canonical = [{k: v for k, v in r.items() if v is not None} for r in rows]
    out = subprocess.run(
        ["jq", "-c", program],
        input=json.dumps(canonical).encode(),
        stdout=subprocess.PIPE,
        check=True,
    )
    return [
        json.loads(ln) for ln in out.stdout.decode().splitlines() if ln.strip()
    ]


def _norm(rows: list[dict]) -> list[str]:
    # jq emits explicit nulls; Spark rows carry None — compare on the
    # same null-stripped representation, order-insensitively
    return sorted(
        json.dumps(
            {k: v for k, v in r.items() if v is not None}, sort_keys=True
        )
        for r in rows
    )


def _run_native(spark, rows: list[dict], program: str) -> list[dict]:
    df = spark.createDataFrame(rows, _SCHEMA)
    # recursive: nested-object programs return struct columns
    return [
        r.asDict(recursive=True) for r in translate_jq(df, program).collect()
    ]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_RECORDS, program=_PROGRAMS)
def test_native_equals_jq_binary(spark, rows, program):
    got = _run_native(spark, rows, program)
    expect = _jq(program, rows)
    assert _norm(got) == _norm(expect), (program, rows)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_RECORDS, program=_STRING_PROGRAMS)
def test_piped_string_builtins_equal_jq_binary(spark, rows, program):
    rows = [r for r in rows if r["name"] is not None]
    if not rows:
        return
    got = _run_native(spark, rows, program)
    expect = _jq(program, rows)
    assert _norm(got) == _norm(expect), (program, rows)


NULL_AND_EDGE_PROGRAMS = st.sampled_from(
    [
        ".[] | select(.name == null)",
        ".[] | select(.name != null)",
        ".[] | select(.flag == null)",
        ".[] | {known: (.name != null)}",
        ".[] | {y: .missing}",          # absent key reads as null in jq
        '.[] | select(.missing == null)',
    ]
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_RECORDS, program=NULL_AND_EDGE_PROGRAMS)
def test_null_comparisons_equal_jq_binary(spark, rows, program):
    got = _run_native(spark, rows, program)
    expect = _jq(program, rows)
    assert _norm(got) == _norm(expect), (program, rows)


def test_miscompile_risks_route_to_binary(spark):
    """Programs whose native compile would diverge from jq must raise
    JQUnsupported (-> faithful fallback), never compile silently."""
    df = spark.createDataFrame(
        [(1, "alice", 30)], "id long, name string, age long"
    )
    for program in [
        # NB round 4: del(.a.b) on an ABSENT root now compiles (jq
        # no-ops it too — differential in TestNestedAssignmentDel);
        # del through a SCALAR still routes to the binary:
        ".[] | del(.id.b)",
        '.[] | select(.name == 123)',      # cross-type equality
        '.[] | select(.age < "5")',        # cross-type ordering
        ".[] | select(.name < null)",      # ordered null comparison
        ".[] | {s: tostring}",             # bare builtin needs pipe input
    ]:
        with pytest.raises(JQUnsupported):
            translate_jq(df, program)


# Object-array records: nested array<struct> with null elements, null
# fields, empty arrays, duplicate keys (tie-stability stress).
_ITEMS = st.lists(
    st.one_of(
        st.none(),
        st.fixed_dictionaries(
            {
                "w": st.one_of(
                    st.none(), st.sampled_from(["a", "bb", "ccc", "bb"])
                ),
                "q": st.one_of(
                    st.none(), st.integers(min_value=-5, max_value=5)
                ),
            }
        ),
    ),
    max_size=4,
)
_OBJ_RECORDS = st.lists(
    st.fixed_dictionaries(
        {"id": st.integers(min_value=0, max_value=50), "items": _ITEMS}
    ),
    min_size=1,
    max_size=6,
)
_OBJ_SCHEMA = "id long, items array<struct<w: string, q: long>>"

_OBJ_PROGRAMS = st.sampled_from(
    [
        ".[] | {id, n: (.items | length)}",
        ".[] | {id, ws: (.items | map(.w))}",
        ".[] | {id, qs: (.items | map(.q))}",
        ".[] | {id, s: (.items | sort_by(.q) | map(.w))}",
        ".[] | {id, s: (.items | sort_by(.w) | map(.q))}",
        ".[] | {id, m: (.items | min_by(.q) | .w)}",
        ".[] | {id, x: (.items | max_by(.q) | .w)}",
        ".[] | {id, u: (.items | unique_by(.w) | map(.q))}",
        ".[] | {id, f: (.items | map(select(.q > 0)) | length)}",
        ".[] | {id, r: (.items | reverse | map(.w))}",
        ".[] | {id, i: .items[0].w, j: .items[-1].q}",
        ".[] | {id, sl: (.items[1:3] | map(.w))}",
        ".[] | select((.items | length) > 1) | {id}",
    ]
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_OBJ_RECORDS, program=_OBJ_PROGRAMS)
def test_object_arrays_equal_jq_binary(spark, rows, program):
    df = spark.createDataFrame(rows, _OBJ_SCHEMA)
    got = [
        r.asDict(recursive=True) for r in translate_jq(df, program).collect()
    ]
    expect = _jq(program, rows)
    assert _norm(got) == _norm(expect), (program, rows)


# ---- round-5 constructs: defs / setpath / delpaths / [paths] ----
# struct-only record space (arrays route paths to the binary by design)

_P5_SCHEMA = "id long, m struct<a:long,b:string>, x long"
_P5_RECORDS = st.lists(
    st.fixed_dictionaries(
        {
            "id": st.integers(min_value=-50, max_value=50),
            "m": st.one_of(
                st.none(),
                st.fixed_dictionaries(
                    {
                        "a": st.one_of(
                            st.none(), st.integers(min_value=0, max_value=9)
                        ),
                        "b": st.one_of(
                            st.none(), st.sampled_from(["", "x", "yy"])
                        ),
                    }
                ),
            ),
            "x": st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
        }
    ),
    min_size=1,
    max_size=6,
)
_P5_PROGRAMS = st.sampled_from(
    [
        ".[] | {id, p: [paths]}",
        ".[] | {id, p: [leaf_paths]}",
        ".[] | {id, n: ([paths] | length)}",
        '.[] | delpaths([["m","a"],["x"]])',
        '.[] | delpaths([["m","a"],["m"]])',
        '.[] | delpaths([])',
        '.[] | setpath(["m","a"]; 7)',
        '.[] | setpath(["y"]; .id)',
        "def sq: . * .; .[] | {id, v: ((.x // 0) | sq)}",
        "def pos: (.x // 0) > 0; .[] | select(pos) | {id}",
    ]
)


def _strip_rec(v):
    if isinstance(v, dict):
        return {k: _strip_rec(x) for k, x in v.items() if x is not None}
    if isinstance(v, list):
        return [_strip_rec(x) for x in v]
    return v


def _norm_rec(rows):
    return sorted(json.dumps(_strip_rec(r), sort_keys=True) for r in rows)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_P5_RECORDS, program=_P5_PROGRAMS)
def test_paths_defs_setpath_delpaths_equal_jq_binary(spark, rows, program):
    df = spark.createDataFrame(rows, _P5_SCHEMA)
    got = [
        r.asDict(recursive=True)
        for r in translate_jq(df, program).collect()
    ]
    canonical = [_strip_rec(r) for r in rows]
    out = subprocess.run(
        ["jq", "-c", program],
        input=json.dumps(canonical).encode(),
        stdout=subprocess.PIPE,
        check=True,
    )
    expect = [
        json.loads(ln)
        for ln in out.stdout.decode().splitlines()
        if ln.strip()
    ]
    assert _norm_rec(got) == _norm_rec(expect), (program, rows)


# ---------------------------------------------------------------------------
# P6: recursive-descent type census + dynamic getpath (round 10)

_P6_SCHEMA = (
    "id long, s string, n struct<t:string,u:string>, "
    "arr array<string>, objs array<struct<g:string,v:struct<w:string>>>, "
    "k1 string, k2 string"
)
_P6_RECORDS = st.lists(
    st.fixed_dictionaries(
        {
            "id": st.integers(min_value=-9, max_value=9),
            "s": st.one_of(st.none(), st.sampled_from(["", "x", "héllo"])),
            # uniform string leaves: the dynamic-getpath depth-2 target
            "n": st.one_of(
                st.none(),
                st.fixed_dictionaries(
                    {
                        "t": st.one_of(
                            st.none(), st.sampled_from(["p", "qq"])
                        ),
                        "u": st.one_of(
                            st.none(), st.sampled_from(["", "uu"])
                        ),
                    }
                ),
            ),
            "arr": st.one_of(
                st.none(),
                st.lists(
                    st.one_of(st.none(), st.sampled_from(["e1", "e2"])),
                    max_size=3,
                ),
            ),
            # nested struct INSIDE an array keeps the census walk deep
            "objs": st.one_of(
                st.none(),
                st.lists(
                    st.fixed_dictionaries(
                        {
                            "g": st.one_of(
                                st.none(), st.sampled_from(["gg", "h"])
                            ),
                            "v": st.one_of(
                                st.none(),
                                st.fixed_dictionaries(
                                    {
                                        "w": st.one_of(
                                            st.none(),
                                            st.sampled_from(["deep", ""]),
                                        )
                                    }
                                ),
                            ),
                        }
                    ),
                    max_size=2,
                ),
            ),
            # dynamic getpath keys: real + missing names, never null
            # (a null key ERRORS in jq 1.6 — the native total-read
            # relaxation is documented, not fuzzed)
            "k1": st.sampled_from(["n", "s", "arr", "missing", "id"]),
            "k2": st.sampled_from(["t", "u", "missing"]),
        }
    ),
    min_size=1,
    max_size=6,
)
_P6_PROGRAMS = st.sampled_from(
    [
        ".[] | {id, vals: [.. | strings]}",
        ".[] | {id, n_str: ([.. | strings] | length)}",
        # id is the only numeric leaf
        ".[] | {id, nums: [.. | numbers]}",
        # dynamic getpath at depth 2: k1 values naming SCALAR fields
        # (s/arr/id) error in jq — guard to struct-or-missing names,
        # which jq evaluates identically and keeps the differential
        # inside the provable class
        '.[] | select(.k1 == "n" or .k1 == "missing") '
        "| {id, v: getpath([.k1, .k2])}",
        '.[] | {id, v: getpath(["n", .k2])}',
    ]
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_P6_RECORDS, program=_P6_PROGRAMS)
def test_recursive_descent_getpath_equal_jq_binary(spark, rows, program):
    df = spark.createDataFrame(
        [
            (
                r["id"],
                r["s"],
                r["n"] and (r["n"]["t"], r["n"]["u"]),
                r["arr"],
                r["objs"]
                and [
                    (o["g"], o["v"] and (o["v"]["w"],))
                    for o in r["objs"]
                ],
                r["k1"],
                r["k2"],
            )
            for r in rows
        ],
        _P6_SCHEMA,
    )
    got = [
        r.asDict(recursive=True)
        for r in translate_jq(df, program).collect()
    ]

    # canonical serialization drops null OBJECT fields; array
    # elements keep nulls (probed — the binary path serializes both
    # the same way)
    def clean(v):
        if isinstance(v, dict):
            return {k: clean(x) for k, x in v.items() if x is not None}
        if isinstance(v, list):
            return [clean(x) for x in v]
        return v

    canonical = [clean(r) for r in rows]
    out = subprocess.run(
        ["jq", "-c", program],
        input=json.dumps(canonical).encode(),
        stdout=subprocess.PIPE,
        check=True,
    )
    expect = [
        json.loads(ln)
        for ln in out.stdout.decode().splitlines()
        if ln.strip()
    ]
    assert _norm_rec(got) == _norm_rec(expect), (program, rows)


# --- native tostream (VERDICT r10 item 8) ---------------------------------

_ALPHABET = "abXé9 _-"

_TS_SCHEMA = (
    "id long, s string, n struct<t:string,u:long>, "
    "m struct<p:struct<q:boolean>,r:long>"
)

_TS_RECORDS = st.lists(
    st.fixed_dictionaries(
        {
            "id": st.one_of(st.none(), st.integers(-5, 5)),
            "s": st.one_of(st.none(), st.text(_ALPHABET, max_size=4)),
            "n": st.one_of(
                st.none(),
                st.fixed_dictionaries(
                    {
                        "t": st.one_of(
                            st.none(), st.text(_ALPHABET, max_size=3)
                        ),
                        "u": st.one_of(st.none(), st.integers(0, 9)),
                    }
                ),
            ),
            "m": st.one_of(
                st.none(),
                st.fixed_dictionaries(
                    {
                        "p": st.one_of(
                            st.none(),
                            st.fixed_dictionaries(
                                {
                                    "q": st.one_of(
                                        st.none(), st.booleans()
                                    )
                                }
                            ),
                        ),
                        "r": st.one_of(st.none(), st.integers(0, 9)),
                    }
                ),
            ),
        }
    ),
    min_size=1,
    max_size=5,
)

# no object-construction stages here: `{id, n}` creates EXPLICIT
# nulls in jq while the native record model reads null as absent —
# the documented pre-existing relaxation of that stage, not a
# tostream property (tostream itself sees only the canonical
# null-dropped serialization on both paths)
_TS_PROGRAMS = st.sampled_from(
    [
        "tostream",
        "del(.s) | tostream",
        "del(.m) | tostream",
        "del(.s, .m) | tostream",
        "select(.id != null) | tostream",
        "tostream | select(length == 2)",
        "tostream | select(length == 1)",
        "[tostream]",
    ]
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_TS_RECORDS, program=_TS_PROGRAMS)
def test_tostream_equal_jq_binary(spark, rows, program):
    """Native tostream (final-stage) vs the jq binary over the same
    canonical (null-dropping) serialization; events compared as
    parsed values, order-insensitively across records."""
    df = spark.createDataFrame(
        [
            (
                r["id"],
                r["s"],
                r["n"] and (r["n"]["t"], r["n"]["u"]),
                r["m"]
                and (
                    r["m"]["p"] and (r["m"]["p"]["q"],),
                    r["m"]["r"],
                ),
            )
            for r in rows
        ],
        _TS_SCHEMA,
    )
    out_df = translate_jq(df, program)
    assert out_df.columns == ["value"], "tostream emits value rows"
    got = [json.loads(r["value"]) for r in out_df.collect()]

    def clean(v):
        if isinstance(v, dict):
            return {k: clean(x) for k, x in v.items() if x is not None}
        return v

    canonical = [clean(r) for r in rows]
    out = subprocess.run(
        ["jq", "-c", ".[] | " + program],
        input=json.dumps(canonical).encode(),
        stdout=subprocess.PIPE,
        check=True,
    )
    expect = [
        json.loads(ln)
        for ln in out.stdout.decode().splitlines()
        if ln.strip()
    ]
    norm = lambda evs: sorted(json.dumps(e) for e in evs)  # noqa: E731
    assert norm(got) == norm(expect), (program, rows)
