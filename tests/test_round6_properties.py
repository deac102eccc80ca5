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
