"""EDN read-compat shim: parser unit tests + a pr-str round-trip property.

No SparkSession needed — the Spark plumbing (mapInPandas explode) is
covered by the oracle-checked ``edn_tree_ingest`` catalog entry; these
tests pin the parser semantics against hand-built and generated EDN of
the shape the reference's ``pr-str`` actually emits
(mlvar/d_bolome_user_order.clj:98-129).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_cascalog_spark.functions.edn import (
    EdnParseError,
    edn_tree_rows,
    parse_edn,
)


def test_scalars():
    assert parse_edn("nil") is None
    assert parse_edn("true") is True
    assert parse_edn("false") is False
    assert parse_edn("42") == 42
    assert parse_edn("-7") == -7
    assert parse_edn("3.5") == 3.5
    assert parse_edn("-0.25") == -0.25
    assert parse_edn(":user-id") == "user-id"
    assert parse_edn('"hello"') == "hello"


def test_string_escapes():
    assert parse_edn(r'"a\"b"') == 'a"b'
    assert parse_edn(r'"c\\d"') == "c\\d"
    assert parse_edn(r'"x\ny"') == "x\ny"
    assert parse_edn(r'"t\tb"') == "t\tb"


def test_collections_and_commas_as_whitespace():
    assert parse_edn("[1, 2, 3]") == [1, 2, 3]
    assert parse_edn("(1 2)") == [1, 2]
    assert parse_edn("#{1 2}") == {1, 2}
    assert parse_edn('{:a 1, :b "x"}') == {"a": 1, "b": "x"}
    assert parse_edn('{ :a { :b [1 {:c nil}] } }') == {"a": {"b": [1, {"c": None}]}}


def test_strict_errors():
    with pytest.raises(EdnParseError):
        parse_edn("{:a 1} junk")
    with pytest.raises(EdnParseError):
        parse_edn('"unterminated')
    with pytest.raises(EdnParseError):
        parse_edn("#inst \"2016-01-01\"")  # tagged literals unsupported
    with pytest.raises(EdnParseError):
        parse_edn("")


def test_non_string_and_composite_set_members_stay_in_contract():
    """Regression (round-9 review): a NULL cell reaching parse_edn, or a
    set containing a collection, must raise EdnParseError — not a raw
    TypeError from len(None)/set.add deep in an executor task."""
    with pytest.raises(EdnParseError):
        parse_edn(None)  # type: ignore[arg-type]
    with pytest.raises(EdnParseError):
        parse_edn(42)  # type: ignore[arg-type]
    # composite set members stringify, same convention as composite map keys
    assert parse_edn("#{[1 2]}") == {"[1, 2]"}


def test_from_edn_tree_null_cells_emit_no_rows(spark):
    """SQL NULL in the EDN column = absent tree: zero rows for that id,
    neighbours unaffected; a malformed NON-null cell still raises."""
    from etl_cascalog_spark.functions.edn import from_edn_tree

    df = spark.createDataFrame(
        [(1, '{:DATA {:a 1} :CHILDREN {}}'), (2, None)],
        "id long, tree string",
    )
    rows = from_edn_tree(df, "tree", id_cols=["id"]).collect()
    assert [(r.id, r.attr, r.value) for r in rows] == [(1, "a", "1")]

    bad = spark.createDataFrame([(3, "{:DATA")], "id long, tree string")
    with pytest.raises(Exception, match="EdnParseError|unexpected end"):
        from_edn_tree(bad, "tree", id_cols=["id"]).collect()


def test_tree_rows_reference_shape():
    """The exact nesting the reference builds: user → dt → product → order
    → order-item, :DATA at every level (mlvar:95-129)."""
    text = (
        '{:DATA {:user-id "u1"} :CHILDREN '
        '{"2016-03-10" {:DATA {:dw-dt "2016-03-10"} :CHILDREN '
        '{17 {:DATA {:product-dw-id 17, :product-category "美妆"} '
        ':CHILDREN {}}}}}}'
    )
    rows = edn_tree_rows(text)
    assert (([], "user-id", "u1")) in rows
    assert ((["2016-03-10"], "dw-dt", "2016-03-10")) in rows
    assert ((["2016-03-10", "17"], "product-dw-id", "17")) in rows
    assert ((["2016-03-10", "17"], "product-category", "美妆")) in rows
    assert len(rows) == 4


def test_tree_rows_nil_and_missing_sections():
    rows = edn_tree_rows('{:DATA {:a nil} :CHILDREN {}}')
    assert rows == [([], "a", None)]
    assert edn_tree_rows("{}") == []
    with pytest.raises(EdnParseError):
        edn_tree_rows("[1 2 3]")


# --- pr-str round trip: generate a tree, render EDN the way pr-str would,
# --- parse it back, and compare the flattening computed both ways.

_attr = st.text(
    alphabet="abcdefghij-", min_size=1, max_size=8
).filter(lambda s: not s.startswith("-"))
_value = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-10**6, 10**6),
    st.text(alphabet='abc"\\中 ', max_size=10),
)


def _edn_str(v) -> str:
    return '"' + str(v).replace("\\", "\\\\").replace('"', '\\"') + '"'


def _render_value(v) -> str:
    if v is None:
        return "nil"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    return _edn_str(v)


@st.composite
def _tree(draw, depth=0):
    data = draw(st.dictionaries(_attr, _value, max_size=3))
    children = {}
    if depth < 2:
        n = draw(st.integers(0, 2))
        for i in range(n):
            children[f"k{i}"] = draw(_tree(depth=depth + 1))
    return {"DATA": data, "CHILDREN": children}


def _render_tree(t) -> str:
    data = " ".join(f":{k} {_render_value(v)}" for k, v in t["DATA"].items())
    kids = " ".join(f"{_edn_str(k)} {_render_tree(v)}" for k, v in t["CHILDREN"].items())
    return "{:DATA {" + data + "} :CHILDREN {" + kids + "}}"


def _expected_rows(t, path):
    out = []
    for k in sorted(t["DATA"], key=str):
        v = t["DATA"][k]
        if v is None:
            r = None
        elif isinstance(v, bool):
            r = "true" if v else "false"
        else:
            r = str(v)
        out.append((path, str(k), r))
    for k in sorted(t["CHILDREN"], key=str):
        out.extend(_expected_rows(t["CHILDREN"][k], path + [k]))
    return out


@settings(max_examples=200, deadline=None)
@given(_tree())
def test_pr_str_round_trip_property(t):
    assert edn_tree_rows(_render_tree(t)) == _expected_rows(t, [])
