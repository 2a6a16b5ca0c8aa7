"""The sf1 exact-witness tools are themselves load-bearing evidence, so
they get their own guards (all DuckDB/numpy — no Spark session needed):

- the fixpoint CC loop must converge on graphs whose diameter FORCES
  multiple propagation rounds (the sf1 near-dup graph converged in one
  round — stars — so the loop's multi-round path would otherwise be
  untested);
- the staged pagerank/triangle witnesses must equal the catalog oracles
  VERBATIM on a small SF (they exist only because the verbatim plans
  spill >60 GB at sf1; algebra must be identical);
- the banded simhash oracle must equal the all-pairs oracle (pigeonhole
  exactness at Hamming <= bands-1);
- the textual-surgery helpers must keep asserting when the catalog
  fragments drift.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_cascalog_spark.catalog import QUERIES, _simhash_oracle_sql
from tests.oracle_utils import duckdb_con, normalize
from tools.sf1_oracle import (
    _sub,
    cc_fixpoint,
    pagerank_witness,
    triangle_witness,
)

SF = "/root/testdata/sf0.01"


def test_cc_fixpoint_multi_round_convergence():
    """A 7-node path graph (diameter 6) plus a star and a singleton pair:
    min-label propagation needs ~log/diameter rounds; the fixpoint must
    label every node with min(component) regardless."""
    con = duckdb.connect()
    # path 10-11-12-13-14-15-16, star 20-{21,22,23}, pair 30-31
    edges = [(11, 10), (11, 12), (13, 12), (13, 14), (15, 14), (15, 16),
             (20, 21), (20, 22), (20, 23), (30, 31)]
    con.execute("CREATE TEMP TABLE p (doc_a BIGINT, doc_b BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", edges)
    rounds = cc_fixpoint(con, "p", "cc_out")
    got = dict(con.execute("SELECT node, label FROM cc_out").fetchall())
    assert rounds > 1  # the path component cannot converge in one round
    assert got == {
        **{n: 10 for n in range(10, 17)},
        **{n: 20 for n in (20, 21, 22, 23)},
        30: 30,
        31: 30,
    }


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF)


def test_pagerank_witness_equals_verbatim_oracle(con):
    want = normalize(con.execute(QUERIES["pagerank_copurchase"].oracle).df())
    got = normalize(pagerank_witness(con))
    assert got.equals(want)


def test_triangle_witness_equals_verbatim_oracle(con):
    want = normalize(con.execute(QUERIES["triangle_count"].oracle).df())
    got = normalize(triangle_witness(con))
    assert got.equals(want)


def test_banded_simhash_equals_all_pairs(con):
    a = normalize(con.execute(_simhash_oracle_sql(banded=False)).df())
    b = normalize(con.execute(_simhash_oracle_sql(banded=True)).df())
    assert a.equals(b)


def test_surgery_asserts_on_drift():
    with pytest.raises(AssertionError, match="no longer contains"):
        _sub("SELECT 1", "fragment that is not there", "x")
