"""Driver-side property tests (hypothesis) for the round-6 kernels'
pure arithmetic — the algebra the Spark/DuckDB parity relies on, at
hundreds of examples per second (no Spark session)."""

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

UNIT = float(1 << 52)

vals = st.floats(min_value=-1e6, max_value=1e6,
                 allow_nan=False, allow_infinity=False)


def _unit_hash(key: str, seed: int) -> float:
    h = hashlib.md5(f"{key}#{seed}".encode()).hexdigest()
    return int(h[:13], 16) / UNIT


@settings(max_examples=300, deadline=None)
@given(st.text(min_size=1, max_size=30),
       st.integers(0, 10),
       st.lists(st.floats(min_value=0.01, max_value=1.0), min_size=2,
                max_size=6))
def test_split_boundaries_partition_unit_interval(key, seed, raw):
    """split_assign's cumulative boundaries place EVERY uniform draw in
    exactly one split for any valid fraction list — no gap at the fp
    edges, no overlap."""
    total = sum(raw)
    fracs = [f / total for f in raw]
    u = _unit_hash(key, seed)
    assert 0.0 <= u < 1.0
    cum, arm = 0.0, None
    for i, f in enumerate(fracs[:-1]):
        cum += f
        if u < cum:
            arm = i
            break
    if arm is None:
        arm = len(fracs) - 1   # the ELSE arm catches everything left
    assert 0 <= arm < len(fracs)


@settings(max_examples=300, deadline=None)
@given(st.lists(vals, min_size=1, max_size=16),
       st.floats(min_value=0.05, max_value=0.95))
def test_ewma_fold_init_equivalence_and_value(xs, alpha):
    """The zero-init left fold (Spark aggregate) is bit-identical to
    the first-element-init fold (DuckDB list_reduce), and matches the
    closed-form weighted mean within float tolerance."""
    c = 1.0 - alpha
    acc0 = 0.0
    for x in xs:
        acc0 = acc0 * c + x
    acc1 = xs[0]
    for x in xs[1:]:
        acc1 = acc1 * c + x
    assert acc0 == acc1 and math.copysign(1, acc0 + 0.0) == math.copysign(
        1, acc1 + 0.0)
    wsum = 0.0
    for _ in xs:
        wsum = wsum * c + 1.0
    direct = sum(x * c ** (len(xs) - 1 - i) for i, x in enumerate(xs))
    dwsum = sum(c ** i for i in range(len(xs)))
    assert abs(wsum - dwsum) <= 1e-9 * max(1.0, dwsum)
    scale = max(abs(t * c ** (len(xs) - 1 - i)) for i, t in enumerate(xs)) + 1
    assert abs(acc0 - direct) <= 1e-9 * scale


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet=st.characters(
    blacklist_characters="\x00\x01", codec="utf-8"), max_size=12),
    st.text(st.characters(min_codepoint=48, max_codepoint=122),
            min_size=1, max_size=40)),
    min_size=2, max_size=12, unique_by=lambda t: t[1]))
def test_snm_order_key_injective_and_sort_major(rows):
    """sorted_neighborhood's chr(1) + length-prefixed order key is
    injective for distinct ids and sorts primarily by sort_col."""
    def key(sort, i):
        return f"{sort}\x01{len(i):04d}{i}"

    keys = [key(s, i) for s, i in rows]
    assert len(set(keys)) == len(rows)          # injective
    ranked = sorted(range(len(rows)), key=lambda t: keys[t])
    # primary order follows sort_col
    sorts = [rows[t][0] for t in ranked]
    assert sorts == sorted(sorts)


# ---------------------------------------------------------------------------
# Late-round-6 kernels: PassJoin pigeonhole, RRF algebra, theta
# threshold algebra, seasonal wrap arithmetic


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def _segments(s: str, k: int):
    """The operator's fixed segmentation: first (len % k) segments get
    the extra char."""
    l, base, rem = len(s), len(s) // k, len(s) % k
    segs, start = [], 0
    for i in range(k):
        ln = base + (1 if i < rem else 0)
        segs.append((start, s[start:start + ln]))
        start += ln
    return segs


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abc", min_size=2, max_size=14),
       st.text(alphabet="abc", min_size=2, max_size=14),
       st.integers(1, 3))
def test_passjoin_pigeonhole_soundness(a, b, d):
    """If lev(a,b) <= d and len(b) >= d+1 then a contains at least one
    of b's d+1 segments exactly, starting within ±d of its position in
    b — the guarantee the edit_distance_pairs blocking equi-join is
    built on."""
    if _lev(a, b) > d or len(b) < d + 1:
        return
    hit = False
    for start, seg in _segments(b, d + 1):
        if not seg:
            continue
        for p in range(max(0, start - d), min(len(a) - len(seg), start + d) + 1):
            if a[p:p + len(seg)] == seg:
                hit = True
    assert hit


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="xyz#", min_size=0, max_size=8),
       st.text(alphabet="xyz#", min_size=0, max_size=8),
       st.text(alphabet="ab", min_size=0, max_size=10),
       st.text(alphabet="ab", min_size=0, max_size=10))
def test_affix_stripping_preserves_levenshtein(pre, suf, x, y):
    """lev(P·x·S, P·y·S) == lev(x, y) — the invariance the edit_dist
    corpus-affix skew guard relies on."""
    assert _lev(pre + x + suf, pre + y + suf) == _lev(x, y)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), vals), min_size=1,
                max_size=25).map(dict),
       st.lists(st.tuples(st.integers(0, 30), vals), min_size=0,
                max_size=25).map(dict),
       st.integers(1, 100))
def test_rrf_fixed_order_sum_is_rank_algebra(la, lb, k):
    """The RRF score of a doc is exactly 1/(k+rank_a) + 1/(k+rank_b)
    with ranks independent per list (score desc, id asc tiebreak) —
    the fused value never depends on the other list's scores."""
    def ranks(d):
        order = sorted(d, key=lambda i: (-d[i], i))
        return {i: r + 1 for r, i in enumerate(order)}
    ra, rb = ranks(la), ranks(lb)
    for doc in set(la) | set(lb):
        want = (1.0 / (k + ra[doc]) if doc in ra else 0.0) + (
            1.0 / (k + rb[doc]) if doc in rb else 0.0)
        got = 0.0
        if doc in ra:
            got += 1.0 / (k + ra[doc])
        if doc in rb:
            got = got + 1.0 / (k + rb[doc])
        assert got == want  # fixed-order coalesced sum, bit-exact


@settings(max_examples=300, deadline=None)
@given(st.sets(st.integers(0, 10 ** 6), min_size=0, max_size=400),
       st.sets(st.integers(0, 10 ** 6), min_size=0, max_size=400),
       st.integers(2, 64))
def test_theta_intersect_exact_below_k(sa, sb, k):
    """When both sides hold < k distinct hashes the theta estimates
    are the EXACT set cardinalities (theta=1 path), and
    inclusion-exclusion holds for any k (shared threshold)."""
    if len(sa) >= k or len(sb) >= k:
        return
    # exact path: threshold = max-hash sentinel, every element counted
    na, nb = len(sa), len(sb)
    nu, nab = len(sa | sb), len(sa & sb)
    assert na + nb == nu + nab  # inclusion-exclusion, exact


@settings(max_examples=300, deadline=None)
@given(st.integers(1, 50), st.integers(1, 200), st.integers(0, 10 ** 6))
def test_seasonal_wrap_lands_in_last_period(period, h, last):
    """The forecast source bucket last + h − period·⌈h/period⌉ always
    falls in the last observed season (last-period, last]."""
    wrap = (h + period - 1) // period
    src = last + h - wrap * period
    assert last - period < src <= last
    # and it is congruent to the target bucket mod period
    assert (last + h - src) % period == 0
