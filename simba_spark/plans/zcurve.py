"""Z-order interval algebra (driver-side, pure Python ints).

The classic trick behind z-ordered indexes (BIGMIN / quadtree
decomposition): an axis-aligned box in grid space is covered by a small
set of *contiguous* z-value intervals, because every quadtree node —
a fixed prefix of the interleaved bits — owns one contiguous z-range.
Emitting those intervals as sargable ``z BETWEEN a AND b`` predicates
lets the Parquet reader (and Spark's in-memory cache batch stats) skip
row groups / files of a z-clustered layout, which is the I/O-pruning
job the reference does with a driver-side global index +
``PartitionPruningRDD`` (ref: IndexedRelationScan.scala:57-87).

Bit layout matches :func:`simba_spark.functions.z_value_col` /
:func:`simba_spark.geometry.z_value`: bit ``j`` of coordinate ``i``
lands at z-bit ``j*d + i`` (dimension-major groups, group ``j=bits-1``
highest) — so fixing the top ``l`` bits of every coordinate fixes the
top ``l*d`` bits of z, i.e. quadtree nodes are z-contiguous.

Everything here is O(max_ranges · 2^d) driver work on plain ints —
no Spark jobs, no data movement.
"""

from __future__ import annotations

from collections import deque
from typing import List, Sequence, Tuple


def z_range_cover(
    box_lo: Sequence[int],
    box_hi: Sequence[int],
    d: int,
    bits: int,
    max_ranges: int = 32,
) -> List[Tuple[int, int]]:
    """Cover the closed grid box [box_lo, box_hi] with at most
    ``max_ranges`` closed z-intervals (a superset: every grid point in
    the box has its z-value inside the union; points outside may too —
    callers keep the exact per-dimension filter on top).

    BFS over quadtree nodes, coarsest first; when the budget is nearly
    exhausted, remaining partially-overlapping nodes are emitted whole
    (coarser cover, still correct). Returned ranges are sorted and
    merged (adjacent intervals coalesce).
    """
    full = (1 << bits) - 1
    blo = [max(0, min(full, int(x))) for x in box_lo]
    bhi = [max(0, min(full, int(x))) for x in box_hi]
    if any(l > h for l, h in zip(blo, bhi)):
        return []

    out: List[Tuple[int, int]] = []
    # (level, z_prefix, per-dim low corner); root = whole grid
    frontier = deque([(bits, 0, tuple(0 for _ in range(d)))])
    n_children = 1 << d
    while frontier:
        level, zp, clo = frontier.popleft()
        size = 1 << level
        if any(clo[i] + size - 1 < blo[i] or clo[i] > bhi[i] for i in range(d)):
            continue  # disjoint
        contained = all(
            clo[i] >= blo[i] and clo[i] + size - 1 <= bhi[i] for i in range(d)
        )
        budget_out = len(out) + len(frontier) + n_children > max_ranges
        if contained or level == 0 or budget_out:
            zmin = zp << (level * d)
            out.append((zmin, zmin + (1 << (level * d)) - 1))
            continue
        half = size >> 1
        # child c: bit i of c = bit (level-1) of coordinate i, so the
        # child z-prefix is (zp << d) | c — children enumerate in z order
        for c in range(n_children):
            nlo = tuple(clo[i] + (((c >> i) & 1) * half) for i in range(d))
            frontier.append((level - 1, (zp << d) | c, nlo))

    out.sort()
    merged: List[Tuple[int, int]] = []
    for a, b in out:
        if merged and a <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], b))
        else:
            merged.append((a, b))
    return merged


def merge_ranges(ranges: Sequence[Tuple[int, int]]) -> List[Tuple[int, int]]:
    """Sort + coalesce adjacent/overlapping closed int intervals."""
    out: List[Tuple[int, int]] = []
    for a, b in sorted(ranges):
        if out and a <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], b))
        else:
            out.append((a, b))
    return out


def buckets_for_ranges(
    ranges: Sequence[Tuple[int, int]], shift: int, cap: int = 512
):
    """Distinct ``z >> shift`` bucket ids touched by the z-intervals —
    the file/directory-level pruning key of a persisted layout. Returns
    None when the set would exceed ``cap`` (predicate too wide to be
    worth it — fall back to row-group-level skipping only)."""
    buckets = set()
    for a, b in ranges:
        lo_b, hi_b = a >> shift, b >> shift
        if len(buckets) + (hi_b - lo_b + 1) > cap:
            return None
        buckets.update(range(lo_b, hi_b + 1))
    return sorted(buckets)
