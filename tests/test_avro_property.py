"""Property fuzz for the stdlib Avro codec (formats/avrobin.py):
random record schemas and values must round-trip through the Python
writer/reader, and a sample must survive the JVM Avro library
(pyspark's bundled org.apache.avro) reading Python-written bytes —
the cross-engine check that keeps the codec from being
self-referentially 'correct'."""

from __future__ import annotations

import json
import math

from hypothesis import given, settings, strategies as st

from optimus_any2any_spark.formats.avrobin import (
    read_container,
    write_container,
)

# name-legal field identifiers
_names = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)

_PRIM = {
    "string": st.text(max_size=20),
    "long": st.integers(min_value=-(2**62), max_value=2**62),
    "int": st.integers(min_value=-(2**31), max_value=2**31 - 1),
    "boolean": st.booleans(),
    "double": st.floats(allow_nan=False, allow_infinity=True, width=64),
    "bytes": st.binary(max_size=16),
}


@st.composite
def _schema_and_records(draw):
    n_fields = draw(st.integers(min_value=1, max_value=5))
    names = draw(
        st.lists(_names, min_size=n_fields, max_size=n_fields, unique=True)
    )
    fields = []
    field_strats = {}
    for name in names:
        prim = draw(st.sampled_from(sorted(_PRIM)))
        shape = draw(st.sampled_from(["plain", "nullable", "array", "map"]))
        if shape == "plain":
            ftype = prim
            strat = _PRIM[prim]
        elif shape == "nullable":
            ftype = ["null", prim]
            strat = st.none() | _PRIM[prim]
        elif shape == "array":
            ftype = {"type": "array", "items": prim}
            strat = st.lists(_PRIM[prim], max_size=4)
        else:
            ftype = {"type": "map", "values": prim}
            strat = st.dictionaries(
                st.text(max_size=6), _PRIM[prim], max_size=3
            )
        fields.append({"name": name, "type": ftype})
        field_strats[name] = strat
    schema = {"type": "record", "name": "fuzz", "fields": fields}
    n_recs = draw(st.integers(min_value=0, max_value=5))
    records = [
        {name: draw(field_strats[name]) for name in names}
        for _ in range(n_recs)
    ]
    return schema, records


def _float_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    return a == b


def _rec_eq(x, y):
    if isinstance(x, dict):
        return set(x) == set(y) and all(_rec_eq(x[k], y[k]) for k in x)
    if isinstance(x, list):
        return len(x) == len(y) and all(
            _rec_eq(a, b) for a, b in zip(x, y)
        )
    return _float_eq(x, y)


class TestAvroRoundTripFuzz:
    @given(_schema_and_records())
    @settings(max_examples=60, deadline=None)
    def test_python_round_trip(self, tmp_path_factory, sr):
        schema, records = sr
        p = str(tmp_path_factory.mktemp("avro") / "f.avro")
        write_container(p, schema, records)
        got_schema, got = read_container(p)
        assert got_schema == schema
        assert len(got) == len(records)
        for g, r in zip(got, records):
            assert _rec_eq(g, r), (g, r)

    @given(_schema_and_records())
    @settings(max_examples=15, deadline=None)
    def test_null_codec_round_trip(self, tmp_path_factory, sr):
        schema, records = sr
        p = str(tmp_path_factory.mktemp("avro") / "f.avro")
        write_container(p, schema, records, codec="null")
        _, got = read_container(p)
        for g, r in zip(got, records):
            assert _rec_eq(g, r)


class TestJvmCrossCheckFuzz:
    @given(_schema_and_records())
    @settings(max_examples=10, deadline=None)
    def test_jvm_reads_python_bytes(self, spark, tmp_path_factory, sr):
        schema, records = sr
        # restrict to JSON-printable values for the toString comparison
        def printable(v):
            if isinstance(v, bytes):
                return False
            if isinstance(v, float) and not math.isfinite(v):
                return False
            if isinstance(v, list):
                return all(printable(x) for x in v)
            if isinstance(v, dict):
                return all(printable(x) for x in v.values())
            return True

        if not all(
            printable(v) for r in records for v in r.values()
        ):
            return
        p = str(tmp_path_factory.mktemp("avro") / "f.avro")
        write_container(p, schema, records)
        jvm = spark._jvm
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(p),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        got = []
        while reader.hasNext():
            got.append(json.loads(reader.next().toString()))
        reader.close()
        assert len(got) == len(records)
        for g, r in zip(got, records):
            assert _rec_eq(g, r), (g, r)
