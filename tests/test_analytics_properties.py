"""Driver-side property tests (hypothesis) for the round-6 late-debut
kernels' pure semantics — pure-Python models of funnel ordering,
transition counting, BFS distances, BM25 arithmetic, percentile ranks,
and Fellegi–Sunter weights, at hundreds of examples per second (no
Spark session)."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# funnel: pure-python model of the chained min-aggregate program


def _funnel_model(events, steps):
    """events: list of (user, ts, step). Returns users-per-step counts
    under the >= ordering semantics."""
    reached = []
    by_user = {}
    for u, ts, s in events:
        by_user.setdefault(u, []).append((ts, s))
    counts = []
    t_of = {}
    for i, step in enumerate(steps):
        n = 0
        for u, evs in by_user.items():
            if i == 0:
                ts = [t for t, s in evs if s == step]
                if ts:
                    t_of[u] = min(ts)
                    n += 1
            elif u in t_of and t_of[u] is not None:
                ts = [t for t, s in evs if s == step and t >= t_of[u]]
                if ts:
                    t_of[u] = min(ts)
                    n += 1
                else:
                    t_of[u] = None
            continue
        counts.append(n)
        # drop users who fell out so later steps can't resurrect them
        t_of = {u: t for u, t in t_of.items() if t is not None}
    return counts


@settings(max_examples=200, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 50),
              st.sampled_from("abc")),
    min_size=0, max_size=60,
))
def test_funnel_counts_monotone_nonincreasing(events):
    counts = _funnel_model(events, ["a", "b", "c"])
    assert all(x >= y for x, y in zip(counts, counts[1:]))
    assert all(c >= 0 for c in counts)


@settings(max_examples=200, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 30),
              st.sampled_from("ab")),
    min_size=1, max_size=40,
))
def test_funnel_step2_only_counts_ordered_users(events):
    counts = _funnel_model(events, ["a", "b"])
    # direct check: every user counted at step 2 has a b-event at or
    # after their earliest a-event
    ok = 0
    users = {u for u, _, _ in events}
    for u in users:
        a_ts = [t for uu, t, s in events if uu == u and s == "a"]
        b_ts = [t for uu, t, s in events if uu == u and s == "b"]
        if a_ts and any(t >= min(a_ts) for t in b_ts):
            ok += 1
    assert counts[1] == ok


# ---------------------------------------------------------------------------
# transition matrix: counts conserve (n_events - n_users with >=1 event)


@settings(max_examples=200, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 1000),
              st.sampled_from("xyz")),
    min_size=0, max_size=50, unique_by=lambda e: (e[0], e[1]),
))
def test_transition_pair_count_conserves(events):
    by_user = {}
    for u, ts, s in events:
        by_user.setdefault(u, []).append((ts, s))
    pairs = 0
    for evs in by_user.values():
        pairs += max(0, len(evs) - 1)
    n_users = len(by_user)
    assert pairs == len(events) - n_users
    # row-normalized probabilities sum to 1 per from-state
    from collections import Counter, defaultdict
    trans = Counter()
    for evs in by_user.values():
        evs.sort()
        for (t1, s1), (t2, s2) in zip(evs, evs[1:]):
            trans[(s1, s2)] += 1
    tot = defaultdict(int)
    for (s1, _), n in trans.items():
        tot[s1] += n
    sums = defaultdict(float)
    for (s1, _), n in trans.items():
        sums[s1] += n / tot[s1]
    for s in sums.values():
        assert abs(s - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# k-hop BFS: min-aggregation equals true shortest distance <= k


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
             min_size=0, max_size=30),
    st.sets(st.integers(0, 9), min_size=1, max_size=3),
    st.integers(0, 4),
)
def test_k_hop_frontier_fold_is_true_bfs(edges, seeds, k):
    # the operator's fold: dist_{i+1} = min(dist_i, 1 + dist_i ∘ edges)
    dist = {s: 0 for s in seeds}
    for _ in range(k):
        nxt = dict(dist)
        for s, d in edges:
            if s in dist:
                nd = dist[s] + 1
                if nd < nxt.get(d, 1 << 30):
                    nxt[d] = nd
        dist = nxt
    # reference BFS
    import collections
    ref = {s: 0 for s in seeds}
    q = collections.deque(seeds)
    adj = collections.defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    while q:
        u = q.popleft()
        if ref[u] >= k:
            continue
        for v in adj[u]:
            if v not in ref:
                ref[v] = ref[u] + 1
                q.append(v)
    assert dist == ref


# ---------------------------------------------------------------------------
# BM25: saturation and idf monotonicity


@settings(max_examples=300, deadline=None)
@given(st.integers(1, 1000), st.integers(1, 100), st.integers(1, 500),
       st.floats(1.0, 3.0), st.floats(0.0, 1.0))
def test_bm25_term_score_saturates_and_idf_positive(n_docs, tf, dl, k1, b):
    df = min(n_docs, max(1, tf))  # any valid df <= N
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    assert idf > 0  # Lucene variant never goes negative
    avgdl = max(1.0, dl * 0.7)
    def s(tf_):
        return idf * tf_ * (k1 + 1) / (tf_ + k1 * (1 - b + b * dl / avgdl))
    # monotone in tf but bounded by idf*(k1+1): saturation
    assert s(tf) <= s(tf + 1) <= idf * (k1 + 1) + 1e-12


# ---------------------------------------------------------------------------
# percentile rank: distribution properties of the (rank-1)/(n-1) map


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(-50, 50), min_size=1, max_size=60))
def test_percent_rank_bounds_and_monotone(xs):
    n = len(xs)
    sx = sorted(xs)
    def pr(v):
        rank = sx.index(v) + 1  # min-rank
        return 0.0 if n == 1 else (rank - 1) / (n - 1)
    vals = sorted(set(xs))
    prs = [pr(v) for v in vals]
    assert all(0.0 <= p <= 1.0 for p in prs)
    assert all(a < b for a, b in zip(prs, prs[1:]))  # strictly monotone
    assert prs[0] == 0.0
    if len(vals) > 1 and sx.count(sx[-1]) == 1:
        assert prs[-1] == 1.0  # unique max lands exactly at 1


# ---------------------------------------------------------------------------
# Fellegi–Sunter weights: evidence signs and symmetry


@settings(max_examples=300, deadline=None)
@given(st.floats(0.01, 0.99), st.floats(0.01, 0.99))
def test_fs_weights_signs(m, u):
    from hypothesis import assume

    assume(m - u > 1e-6)  # linkage_score enforces u < m strictly
    w_agree = math.log2(m / u)
    w_disagree = math.log2((1 - m) / (1 - u))
    assert w_agree > 0          # agreement is always positive evidence
    assert w_disagree < 0       # disagreement always negative
