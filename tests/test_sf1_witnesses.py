"""The sf1 exact-witness tools (and the unrolled CC oracle fragment that
replaced the doc-graph witnesses in round 11) are themselves load-bearing
evidence, so they get their own guards (all DuckDB/numpy — no Spark
session needed):

- the unrolled catalog CC fragment must converge on graphs whose diameter
  FORCES multiple propagation rounds (the sf1 near-dup graph converges in
  1-2 rounds — stars — so the multi-round path would otherwise be
  untested), and must FAIL LOUDLY via error() when the round budget is
  too small, never return non-fixpoint labels;
- the banded simhash oracle must equal the all-pairs oracle (pigeonhole
  exactness at Hamming <= bands-1).

The staged pagerank/triangle witnesses left in round 12: their catalog
oracles now carry ``AS MATERIALIZED`` pins on every multiply-referenced
CTE and run verbatim at sf1 (14 s / 2 s, zero spill), so the main sweep
hash-checks them directly at every SF — no twin to prove equal anymore.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_cascalog_spark.catalog import (
    _cc_labels_sql,
    _simhash_oracle_sql,
)
from tests.oracle_utils import duckdb_con, normalize

SF = "/root/testdata/sf0.01"

# path 10-11-12-13-14-15-16 (diameter 6), star 20-{21,22,23}, pair 30-31
_CC_TEST_EDGES = [(11, 10), (11, 12), (13, 12), (13, 14), (15, 14), (15, 16),
                  (20, 21), (20, 22), (20, 23), (30, 31)]


def _cc_con():
    con = duckdb.connect()
    con.execute("CREATE TEMP TABLE p (doc_a BIGINT, doc_b BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", _CC_TEST_EDGES)
    return con


def test_unrolled_cc_oracle_multi_round_convergence():
    """The catalog's unrolled label-propagation fragment must label every
    node with min(component) on a graph that needs several rounds — the
    path component has diameter 6, far past the 1-2 rounds the sf1
    near-dup graphs need (pointer jumping makes 6 unrolled rounds cover
    ~2^6 of diameter)."""
    con = _cc_con()
    got = dict(
        con.execute(
            f"""WITH e AS MATERIALIZED (
              SELECT doc_a AS s, doc_b AS t FROM p
              UNION SELECT doc_b, doc_a FROM p
            ),
            {_cc_labels_sql()}
            SELECT node, label FROM cc_labels"""
        ).fetchall()
    )
    assert got == {
        **{n: 10 for n in range(10, 17)},
        **{n: 20 for n in (20, 21, 22, 23)},
        30: 30,
        31: 30,
    }


def test_unrolled_cc_oracle_errors_when_not_converged():
    """Self-verification: with a deliberately tiny round budget the
    diameter-6 path cannot reach its fixpoint, and the oracle must RAISE
    (error()) rather than return non-fixpoint labels — the property that
    makes the unrolled form safe as a correctness oracle at any SF."""
    con = _cc_con()
    with pytest.raises(Exception, match="not converged"):
        con.execute(
            f"""WITH e AS MATERIALIZED (
              SELECT doc_a AS s, doc_b AS t FROM p
              UNION SELECT doc_b, doc_a FROM p
            ),
            {_cc_labels_sql(rounds=1)}
            SELECT node, label FROM cc_labels"""
        ).fetchall()


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF)


def test_banded_simhash_equals_all_pairs(con):
    a = normalize(con.execute(_simhash_oracle_sql(banded=False)).df())
    b = normalize(con.execute(_simhash_oracle_sql(banded=True)).df())
    assert a.equals(b)


