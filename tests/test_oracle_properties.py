"""Property-based validation of the SQL oracle GENERATORS (hypothesis +
DuckDB, no Spark session): each generator's output is checked against an
independent pure-Python implementation of the same definition. Combined
with the Spark≡SQL equivalence tests elsewhere, this closes the
triangle Spark ≡ SQL ≡ Python — a bug would have to appear identically
in three independent implementations to slip through."""

import hashlib
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

duckdb = pytest.importorskip("duckdb")


def _hash60_py(value, seed: int) -> int:
    h = hashlib.md5(f"{value}#{seed}".encode()).hexdigest()
    return int(h[:15], 16)


def _hll_py(values, p: int, seed: int = 42) -> float:
    w = 60 - p
    m = 1 << p
    regs = {}
    for v in values:
        h = _hash60_py(v, seed)
        b, rem = h >> w, h & ((1 << w) - 1)
        rho = (w + 1) if rem == 0 else w + 1 - rem.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    v_zero = m - len(regs)
    s = sum(2.0 ** -r for r in regs.values()) + float(v_zero)
    e = alpha * m * m / s
    if e <= 2.5 * m and v_zero > 0:
        e = float(m) * math.log(float(m) / v_zero)
    return e


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=5000), min_size=1,
             max_size=300),
    st.sampled_from([7, 9, 12]),
)
def test_hll_sql_matches_python(keys, p):
    from simba_spark.operators.sketches import hll_distinct_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ",".join(f"({k})" for k in keys) + ") v(k)")
    got = con.execute(hll_distinct_sql("t", "k", p=p)).fetchone()[0]
    want = _hll_py({str(k) for k in keys}, p)
    assert got == pytest.approx(want, rel=1e-12)


def _pagerank_py(edges, damping=0.85, iters=4):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out = {}
    for s, d in set(edges):
        out.setdefault(s, set()).add(d)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(rank[v] for v in nodes if v not in out)
        nxt = {v: (1 - damping) / n + damping * dangling / n for v in nodes}
        for s, dsts in out.items():
            share = rank[s] / len(dsts)
            for d in dsts:
                nxt[d] += damping * share
        rank = nxt
    return {v: round(r, 6) for v, r in rank.items()}


@settings(max_examples=20, deadline=None)
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=15),
              st.integers(min_value=0, max_value=15)),
    min_size=1, max_size=60,
))
def test_pagerank_sql_matches_python(edges):
    from simba_spark.operators.graph import pagerank_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE e AS SELECT * FROM (VALUES "
                + ",".join(f"({s},{d})" for s, d in edges) + ") v(src, dst)")
    got = dict(con.execute(pagerank_sql("e", iters=4)).fetchall())
    want = _pagerank_py(edges, iters=4)
    assert set(got) == set(want)
    for v, r in want.items():
        assert got[v] == pytest.approx(r, abs=2e-6)


def _triangles_py(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return sum(len(adj[a] & adj[b]) for a, b in und) // 3


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=20),
              st.integers(min_value=0, max_value=20)),
    min_size=1, max_size=120,
))
def test_triangle_sql_matches_python(edges):
    from simba_spark.operators.graph import triangle_count_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE e AS SELECT * FROM (VALUES "
                + ",".join(f"({s},{d})" for s, d in edges) + ") v(src, dst)")
    got = con.execute(triangle_count_sql("e")).fetchone()[0]
    assert got == _triangles_py(edges)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.floats(min_value=-100, max_value=200, allow_nan=False),
             min_size=1, max_size=200),
    st.integers(min_value=1, max_value=17),
)
def test_histogram_sql_matches_python(xs, nbins):
    from simba_spark.operators.stats import histogram_fixed_sql

    lo, hi, width = 0.0, 100.0, 100.0 / nbins
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ",".join(f"({x!r})" for x in xs) + ") v(x)")
    got = {r[0]: r[3] for r in con.execute(
        histogram_fixed_sql("t", "x", lo, hi, nbins=nbins)).fetchall()}
    want = {}
    for x in xs:
        b = min(max(int(math.floor((x - lo) / width)), 0), nbins - 1)
        want[b] = want.get(b, 0) + 1
    assert got == want
