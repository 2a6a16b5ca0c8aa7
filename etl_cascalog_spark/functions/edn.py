"""EDN read-compat shim for migrating the reference's persisted trgx trees.

The reference serializes trgx trees BETWEEN jobs as EDN text in Postgres
TEXT columns (``pr-str`` at mlvar/d_bolome_user_order.clj:98-129; the
config tree read back with ``read-string`` at trgx.clj:78-79 /
``clojure.edn/read-string`` at mlvar:103). The engine's own stance is
JSON-only at the edges (SURVEY §1.3) — but a migration user with EXISTING
EDN columns needs a read path. This module is that path, read-only:

- :func:`parse_edn` — a small recursive-descent parser for the EDN subset
  ``pr-str`` emits for these trees: maps, vectors, lists, sets, strings
  (with escapes), integers, floats, keywords, nil, booleans, commas as
  whitespace. Tagged literals / char literals / metadata are NOT emitted
  by the reference's trees and raise cleanly.
- :func:`edn_tree_rows` — flatten one ``{:DATA {...} :CHILDREN {...}}``
  tree into the engine's canonical long format: one (path, attr, value)
  row per :DATA entry, paths rooted at [] and keyed by the stringified
  :CHILDREN keys (plans/trgx.py module docstring).
- :func:`from_edn_tree` — the Spark operator: Arrow-batched
  ``mapInPandas`` explode of an EDN TEXT column into long rows. Python
  parsing is the sanctioned slow path here — EDN exists only at the
  migration edge (same boundary discipline as the multimodal codecs), and
  each document parses once, embarrassingly parallel, zero shuffle.

Keywords parse to their NAME (``:user-id`` → ``"user-id"``): the long
format's attr column is a plain string and the reference's keyword/string
distinction carries no information once flattened.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_WS = set(" \t\n\r,")
_DELIMS = set('()[]{}"')


class EdnParseError(ValueError):
    pass


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i] in _WS:
        i += 1
    return i


def _parse_string(s: str, i: int) -> tuple[str, int]:
    # s[i] == '"'
    i += 1
    out = []
    while i < len(s):
        c = s[i]
        if c == '"':
            return "".join(out), i + 1
        if c == "\\":
            i += 1
            if i >= len(s):
                break
            esc = s[i]
            out.append(
                {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}.get(esc)
                or esc
            )
        else:
            out.append(c)
        i += 1
    raise EdnParseError("unterminated string")


def _parse_symbolish(s: str, i: int) -> tuple[Any, int]:
    j = i
    while j < len(s) and s[j] not in _WS and s[j] not in _DELIMS:
        j += 1
    tok = s[i:j]
    if not tok:
        raise EdnParseError(f"empty token at {i}")
    if tok == "nil":
        return None, j
    if tok == "true":
        return True, j
    if tok == "false":
        return False, j
    if tok.startswith(":"):
        return tok[1:], j  # keyword → its name
    try:
        return int(tok), j
    except ValueError:
        pass
    try:
        return float(tok), j
    except ValueError:
        pass
    return tok, j  # bare symbol → string (pr-str rarely emits these)


def _parse_value(s: str, i: int) -> tuple[Any, int]:
    i = _skip_ws(s, i)
    if i >= len(s):
        raise EdnParseError("unexpected end of input")
    c = s[i]
    if c == "{":
        m: dict = {}
        i += 1
        while True:
            i = _skip_ws(s, i)
            if i < len(s) and s[i] == "}":
                return m, i + 1
            k, i = _parse_value(s, i)
            v, i = _parse_value(s, i)
            if isinstance(k, (dict, list, set)):
                k = repr(k)  # composite keys: stringify (not emitted by ref)
            m[k] = v
    if c in "([":
        close = ")" if c == "(" else "]"
        out: list = []
        i += 1
        while True:
            i = _skip_ws(s, i)
            if i < len(s) and s[i] == close:
                return out, i + 1
            v, i = _parse_value(s, i)
            out.append(v)
    if c == "#":
        if s.startswith("#{", i):
            st: set = set()
            i += 2
            while True:
                i = _skip_ws(s, i)
                if i < len(s) and s[i] == "}":
                    return st, i + 1
                v, i = _parse_value(s, i)
                if isinstance(v, (dict, list, set)):
                    v = repr(v)  # composite members: stringify, same
                    # convention as composite map keys above (raw TypeError
                    # from set.add would leak past the strict-error contract)
                st.add(v)
        raise EdnParseError(f"unsupported dispatch #{s[i+1:i+10]!r}")
    if c == '"':
        return _parse_string(s, i)
    return _parse_symbolish(s, i)


def parse_edn(text: str) -> Any:
    """Parse one EDN value; raises :class:`EdnParseError` on trailing junk
    or unsupported syntax (the read path is strict — silent partial reads
    of a migration column would be corruption, not convenience)."""
    if not isinstance(text, str):
        raise EdnParseError(
            f"EDN cell must be a string, got {type(text).__name__}"
        )
    v, i = _parse_value(text, 0)
    i = _skip_ws(text, i)
    if i != len(text):
        raise EdnParseError(f"trailing input at {i}: {text[i:i+20]!r}")
    return v


def _render(v: Any) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def edn_tree_rows(text: str) -> list[tuple[list[str], str, str | None]]:
    """Flatten one EDN trgx tree into (path, attr, value) long rows.

    The node shape is the reference's ``(ziptkv [:DATA :CHILDREN])`` output
    (mlvar:95-129): ``{:DATA {attr val …} :CHILDREN {child-key subtree …}}``.
    Path elements and values are stringified (the long format is
    string-typed; numeric metrics re-cast downstream exactly as the JSON
    edge does). A missing :DATA or :CHILDREN is treated as empty.
    """
    tree = parse_edn(text)
    if not isinstance(tree, dict):
        raise EdnParseError(f"trgx root must be a map, got {type(tree).__name__}")
    rows: list[tuple[list[str], str, str | None]] = []

    def walk(node: dict, path: list[str]) -> None:
        data = node.get("DATA") or {}
        if not isinstance(data, dict):
            raise EdnParseError(":DATA must be a map")
        for k in sorted(data, key=str):
            rows.append((path, str(k), _render(data[k])))
        children = node.get("CHILDREN") or {}
        if not isinstance(children, dict):
            raise EdnParseError(":CHILDREN must be a map")
        for k in sorted(children, key=str):
            walk(children[k], path + [_render(k) or ""])

    walk(tree, [])
    return rows


def from_edn_tree(
    df: DataFrame, edn_col: str, id_cols: list[str] | None = None
) -> DataFrame:
    """Explode an EDN trgx TEXT column into canonical long rows:
    ``(id_cols…, path array<string>, attr string, value string)`` — one
    row per :DATA entry per node. Read-only migration ingest; the inverse
    (writing EDN) is deliberately absent (SURVEY §1.3: JSON at the edge).

    SQL NULL cells emit no rows (NULL is a well-defined absent tree —
    routine in migration tables fed by outer joins — not a partial read);
    any non-NULL cell that fails to parse still raises
    :class:`EdnParseError` with position info.
    """
    import pandas as pd

    id_cols = list(id_cols or [])
    fields = [T.StructField(c, df.schema[c].dataType) for c in id_cols]
    schema = T.StructType(
        fields
        + [
            T.StructField("path", T.ArrayType(T.StringType())),
            T.StructField("attr", T.StringType()),
            T.StructField("value", T.StringType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in id_cols}
            out.update({"path": [], "attr": [], "value": []})
            for _, rec in pdf.iterrows():
                cell = rec[edn_col]
                if cell is None or (
                    isinstance(cell, float) and cell != cell  # pandas NaN
                ):
                    continue
                for path, attr, value in edn_tree_rows(cell):
                    for c in id_cols:
                        out[c].append(rec[c])
                    out["path"].append(path)
                    out["attr"].append(attr)
                    out["value"].append(value)
            if not out["attr"]:
                # yield nothing for an all-NULL / all-empty-tree batch: an
                # empty pd.DataFrame infers float64 for the path column and
                # Arrow cannot convert float64 -> list<string>
                continue
            yield pd.DataFrame(out)

    return df.select(*id_cols, edn_col).mapInPandas(run, schema=schema)
