"""kNN join: for each left row, its k nearest right rows (exactly k).

Reference algorithms (SURVEY.md §2.3): CKJSpark (cartesian + top-k,
ref: CKJSpark.scala:33-61), BKJSpark/-R (block nested loop,
ref: BKJSpark.scala:37-97), RKJSpark (production: θ-bounded candidate
replication + local R-tree, ref: RKJSpark.scala:37-145), VKJSpark
(Voronoi), ZKJSpark (approximate z-order, ref: ZKJSpark.scala:36-170).
Ties are broken arbitrarily, output exactly k (``keepSame=false``).
For hash-matched determinism we order by (dist, right_id).

Our router:

- ``cross``   (CKJSpark parity): crossJoin + window row_number <= k.
  The oracle algorithm; O(|L|·|R|) pairs.
- ``bounded`` (default; RKJSpark analog): candidate pairs from a grid
  distance-join with radius θ estimated from a driver-side sample, then
  window top-k; left rows with fewer than k candidates (θ too small —
  possible since the estimate is sample-based) escalate through a
  θ×4 grid retry and only then a cross join bounded to the remaining
  rows (warned above `cross_warn_rows`). The union is exact — same
  no-false-dismissal guarantee as RKJSpark's θ bound
  (ref: RKJSpark.scala:105-110), enforced by verification instead of a
  worst-case bound, which keeps θ (and the shuffle volume) tight.
- ``voronoi`` (VKJSpark analog, exact): pivot-cell partitioning with
  triangle-inequality θ bounds and lossless right-row replication —
  see :func:`_voronoi_knn_join` (ref: VKJSpark.scala:38-398).
- ``zknn``    (ZKJSpark analog, approximate): per random shift vector,
  bucket both sides by coarse z-value prefix, equi-join on
  bucket ∈ {b-1, b, b+1}, union shifts, window top-k. Deterministic
  given the seed. Recall grows with shifts (default 2,
  ref: SimbaConf.scala:120).

Scale notes: `bounded` shuffles each side once (cell equi-join) plus a
skinny window over candidates; the fallback touches only deficient left
rows. No driver collect beyond one bounded sample (≤ sample_cap rows of
the key columns only) — versus the reference's multiple driver jobs
(SURVEY §3B).
"""

from __future__ import annotations

import math
import random
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import dist2_cols
from .distance_join import _prefix_columns, distance_join


def _topk(
    pairs: DataFrame, left_id: str, k: int, dist_col, right_tiebreak: Optional[str]
) -> DataFrame:
    order = [dist_col.asc()]
    if right_tiebreak is not None:
        order.append(F.col(right_tiebreak).asc())
    w = Window.partitionBy(left_id).orderBy(*order)
    return (
        # a null distance (null key coordinates) never claims a kNN slot —
        # without this, Spark's NULLS-FIRST asc would rank nulls on top
        pairs.filter(dist_col.isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .drop("__rn")
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    k: int,
    left_id: str = None,
    algo: str = "bounded",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
    right_tiebreak: Optional[str] = None,
    sample_cap: int = 20000,
    seed: int = 42,
    theta_margin: float = 1.25,
    cross_warn_rows: int = 100_000,
    n_pivots: int = 32,
) -> DataFrame:
    """For each left row, exactly-k nearest right rows by L2 distance.

    `left_id` must uniquely identify left rows (window partition key);
    `right_tiebreak` (a right column) makes tie order deterministic.
    Output columns: prefixed left ++ prefixed right ++ `dist`.
    """
    assert left_id is not None, "knn_join requires left_id (unique left key)"
    assert len(left_cols) == len(right_cols), "dimension mismatch"
    k = int(k)

    lp = _prefix_columns(left, left_prefix)
    rp = _prefix_columns(right, right_prefix)
    lid = f"{left_prefix}{left_id}"
    lcols = [f"{left_prefix}{c}" for c in left_cols]
    rcols = [f"{right_prefix}{c}" for c in right_cols]
    rtb = f"{right_prefix}{right_tiebreak}" if right_tiebreak else None
    dist = F.sqrt(dist2_cols(lcols, rcols))

    if algo == "cross":
        # a cartesian inherits the (often tiny) child partitioning; spread
        # the left so the pair stream and the per-left window parallelize
        pairs = _spread(lp).crossJoin(rp).withColumn("dist", dist)
        return _topk(pairs, lid, k, F.col("dist"), rtb)
    if algo == "bounded" and _plan_bytes(rp) <= _broadcast_cap(rp):
        # cost-based route (BKJSpark rationale): a broadcast-small right
        # side doesn't need θ machinery at all — the broadcast plan below
        # is exact, 2 jobs instead of 5, and shuffle-free on pairs
        algo = "broadcast"
    if algo == "broadcast":
        # BKJSpark analog done right: repartition the LEFT by its id
        # first — BroadcastNestedLoopJoin preserves the streamed side's
        # partitioning, so the top-k window runs in place (zero pair
        # shuffle; Spark's WindowGroupLimit prunes to k per task before
        # the final sort). Per-left cost is |R| distance evals — the
        # block-nested-loop contract (ref: BKJSpark.scala:37-97).
        n = int(lp.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
        pairs = (
            lp.repartition(n, F.col(lid))
            .crossJoin(F.broadcast(rp))
            .withColumn("dist", dist)
        )
        return _topk(pairs, lid, k, F.col("dist"), rtb)
    if algo == "voronoi":
        return _voronoi_knn_join(
            lp, rp, lcols, rcols, k, lid, dist, rtb,
            n_pivots=n_pivots, sample_cap=sample_cap, seed=seed,
        )
    # 'theta' = the θ-bounded program unconditionally (no cost routing) —
    # same semantics as 'bounded', kept addressable for tests/tuning
    if algo not in ("bounded", "theta"):
        raise ValueError(f"unknown knn-join algo: {algo}")

    # --- θ estimation from a driver-side sample of the right key columns.
    # Sample ⊆ right ⇒ for any point p, kth-NN-dist(p, sample) >=
    # kth-NN-dist(p, right): a radius that captures k sample points
    # captures >= k real candidates *for the sampled region*. We take a
    # high quantile over a left sample and add margin; exactness never
    # depends on θ (deficient rows fall back), only performance does.
    # One TakeOrdered job per side (order by xxhash64 = deterministic
    # uniform pseudo-sample) — no count jobs, no fraction math; the two
    # independent sample jobs run concurrently (Spark schedules jobs
    # from separate threads in parallel).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        rs_f = pool.submit(_hash_sample, right, right_cols, sample_cap, seed)
        ls_f = pool.submit(_hash_sample, left, left_cols, 2000, seed + 1)
        rs, ls = rs_f.result(), ls_f.result()
    theta = _estimate_theta(ls, rs, k, margin=theta_margin)
    if not math.isfinite(theta):
        # degenerate inputs (an empty side) — candidate generation has
        # nothing to bound; the cross path settles it
        pairs = _spread(lp).crossJoin(rp).withColumn("dist", dist)
        return _topk(pairs, lid, k, F.col("dist"), rtb)

    # if a left row has >= k candidates within θ, its true kth-NN dist
    # <= θ, and the grid join is exhaustive within θ — so the windowed
    # top-k over its candidates IS its exact answer. Rows below k
    # candidates escalate: θ×4 grid retry, then (rarely) a bounded
    # cross join. Same no-false-dismissal guarantee as RKJSpark's θ
    # bound (ref: RKJSpark.scala:105-141), enforced per-row.
    ok1, retry_ids = _bounded_round(lp, rp, lcols, rcols, theta, k, lid, dist, rtb)
    # deficient set size check with early stop: take() short-circuits the
    # scan at small_cap+1 rows (the common cases are 0 or a handful)
    small_cap = 1024
    head = retry_ids.take(small_cap + 1)
    if len(head) == 0:
        return ok1
    if len(head) <= small_cap:
        # bounded cross join directly — |deficient|·|R| pairs with
        # |deficient| <= 1024; cheaper than spinning up a second grid
        # round's shuffles for a handful of rows
        ids = [r[0] for r in head]
        lp2 = lp.filter(F.col(lid).isin(ids))
        retry_pairs = _spread(lp2).crossJoin(rp).withColumn("dist", dist)
        retry_topk = _topk(retry_pairs, lid, k, F.col("dist"), rtb)
        return ok1.unionByName(retry_topk)

    # escalation 1: widened-θ grid join over the deficient rows only.
    # Shuffle/AQE semi-join (NOT a forced broadcast — the deficient set
    # is unbounded when θ under-samples a skewed region; AQE picks
    # broadcast iff it actually fits).
    lp_retry = lp.join(retry_ids, on=lid, how="left_semi")
    ok2, retry2_ids = _bounded_round(
        lp_retry, rp, lcols, rcols, theta * 4.0, k, lid, dist, rtb
    )
    n_retry2 = retry2_ids.count()
    result = ok1.unionByName(ok2)
    if n_retry2 == 0:
        return result

    # escalation 2: exact cross join, bounded to the doubly-deficient
    # rows. Never the default path; loudly flagged when it is large.
    if n_retry2 > cross_warn_rows:
        import warnings

        warnings.warn(
            f"knn_join: {n_retry2} left rows still deficient after θ×4 "
            f"retry — falling back to a {n_retry2}×|right| cross join; "
            "consider a larger sample_cap/theta_margin",
            RuntimeWarning,
        )
    lp2 = lp.join(retry2_ids, on=lid, how="left_semi")
    retry_pairs = _spread(lp2).crossJoin(rp).withColumn("dist", dist)
    retry_topk = _topk(retry_pairs, lid, k, F.col("dist"), rtb)
    return result.unionByName(retry_topk)


def _voronoi_knn_join(
    lp, rp, lcols, rcols, k, lid, dist, rtb,
    n_pivots: int, sample_cap: int, seed: int,
):
    """VKJSpark analog (ref: VKJSpark.scala:38-398): pivot-cell
    partitioning + triangle-inequality replication, re-expressed as one
    equi-join on cell id + a window top-k.

    The reference's per-point candidate scan with running θ
    (knnObjectForSinglePoint, VKJSpark.scala:139-192) is an execution
    detail inside its zipPartitions; the *pruning guarantees* live in
    two bounds, both reproduced here:

    - θ_i (left cell i's kth-NN upper bound): k-th smallest of
      {ub_i + dist(p_i, p_j) + d} over every right cell j and each of
      j's k smallest pivot distances d (ref: VKJSpark.scala:315-328).
      Any point of cell i has ≥ k right rows within θ_i.
    - replication rule: right row r (cell j, pivot dist rd) can matter
      to cell i only if rd ≥ dist(p_i, p_j) − ub_i − θ_i
      (ref: lower_bounds + right_dup, VKJSpark.scala:335-362) — the
      triangle inequality lower-bounds dist(l, r) otherwise. No false
      dismissal ⇒ the windowed top-k over replicated candidates is
      EXACT, no fallback rounds needed.

    Driver-side state: P pivots + a P×P bound matrix (P ≲ hundreds) —
    constant memory, like the reference's broadcast pivot array. Data
    path: one shuffle per side on the cell key + the skinny window,
    the same budget as the grid join. Pivot choice: greedy
    farthest-point over a hash-sample (deterministic; the reference
    scores random pivot *sets*, generatePivots VKJSpark.scala:50-67 —
    k-center greedy spreads at least as well).

    Caveat (shared with the reference): on strongly anisotropic data
    the θ bounds are loose — cells are wide along the dominant
    dimension, so replication approaches all-pairs and a dense central
    cell concentrates work. Cost degrades, exactness never does.
    `algo='bounded'` is the production default for a reason; this
    program exists for VKJSpark parity and for data where pivot cells
    are actually tight (roughly isotropic metric spaces)."""
    import numpy as np

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        ls_f = pool.submit(_hash_sample, lp, lcols, sample_cap, seed + 11)
        rs_f = pool.submit(_hash_sample, rp, rcols, sample_cap, seed + 12)
        sample = np.concatenate([ls_f.result(), rs_f.result()])
    if len(sample) == 0:
        return _topk(_spread(lp).crossJoin(rp).withColumn("dist", dist),
                     lid, k, F.col("dist"), rtb)
    P = min(int(n_pivots), len(sample))
    # greedy farthest-point (k-center): start at the sample centroid's
    # nearest point, repeatedly add the point farthest from the chosen set
    chosen = [int(((sample - sample.mean(axis=0)) ** 2).sum(axis=1).argmin())]
    d2min = ((sample - sample[chosen[0]]) ** 2).sum(axis=1)
    for _ in range(P - 1):
        nxt = int(d2min.argmax())
        chosen.append(nxt)
        d2min = np.minimum(d2min, ((sample - sample[nxt]) ** 2).sum(axis=1))
    pivots = sample[chosen]  # (P, d)
    pp = np.sqrt(((pivots[:, None, :] - pivots[None, :, :]) ** 2).sum(axis=2))

    def cell_and_dist(cols):
        d2s = [
            sum(
                (F.col(c).cast("double") - F.lit(float(pv[ci]))) ** 2
                for ci, c in enumerate(cols)
            )
            for pv in pivots
        ]
        arr = F.array(*[F.sqrt(e) for e in d2s])
        cell = (F.array_position(arr, F.array_min(arr)) - 1).cast("int")
        return cell, F.array_min(arr)

    lcell, ldist = cell_and_dist(lcols)
    rcell, rdist = cell_and_dist(rcols)
    lc = lp.withColumn("__cell", lcell).withColumn("__pd", ldist)
    rc = rp.withColumn("__cell", rcell).withColumn("__pd", rdist)

    # per-cell meta in ONE job over a tagged skinny union:
    # left: ub_i = max pivot dist; right: ub_j, count, k smallest pivot
    # dists (bounded via per-cell window before the collect)
    lu = lc.select(F.lit(0).alias("__s"), "__cell", "__pd")
    ru = rc.select(F.lit(1).alias("__s"), "__cell", "__pd")
    u = lu.unionByName(ru)
    wk = Window.partitionBy("__s", "__cell").orderBy(F.col("__pd").asc())
    meta_rows = (
        u.withColumn("__rn", F.row_number().over(wk))
        .groupBy("__s", "__cell")
        .agg(
            F.max("__pd").alias("ub"),
            F.count(F.lit(1)).alias("cnt"),
            F.sort_array(
                F.collect_list(F.when(F.col("__rn") <= k, F.col("__pd")))
            ).alias("kd"),
        )
        .collect()
    )
    l_ub = {r["__cell"]: float(r["ub"]) for r in meta_rows if r["__s"] == 0}
    r_meta = {
        r["__cell"]: (float(r["ub"]), int(r["cnt"]), [float(x) for x in r["kd"]])
        for r in meta_rows
        if r["__s"] == 1
    }
    n_right = sum(m[1] for m in r_meta.values())
    if n_right == 0 or not l_ub:
        return _topk(_spread(lp).crossJoin(rp).withColumn("dist", dist),
                     lid, k, F.col("dist"), rtb)

    eps = 1e-9
    # θ_i per left cell (ref: VKJSpark.scala:315-328); with fewer than k
    # right rows in total every pair qualifies — lb becomes -inf below
    theta = {}
    for i in l_ub:
        cand = [
            l_ub[i] + pp[i][j] + d for j, (_, _, kd) in r_meta.items() for d in kd
        ]
        cand.sort()
        theta[i] = (cand[k - 1] if len(cand) >= k else float("inf")) + eps

    # replication map: right cell j -> [(i, lb_ij)] (ref: VKJSpark.scala:335-350)
    map_args = []
    for j in r_meta:
        entries = []
        for i, th in theta.items():
            lb = pp[i][j] - l_ub[i] - th - eps
            entries.append(F.struct(F.lit(int(i)).alias("i"), F.lit(float(lb)).alias("lb")))
        map_args += [F.lit(int(j)), F.array(*entries)]
    rep_map = F.create_map(*map_args)

    rrep = rc.withColumn(
        "__lcell",
        F.explode(
            F.transform(
                F.filter(
                    F.element_at(rep_map, F.col("__cell")),
                    lambda e: F.col("__pd") >= e["lb"],
                ),
                lambda e: e["i"],
            )
        ),
    ).drop("__cell", "__pd")

    pairs = (
        lc.drop("__pd")
        .join(rrep, on=F.col("__cell") == F.col("__lcell"), how="inner")
        .drop("__cell", "__lcell")
        .withColumn("dist", dist)
    )
    return _topk(pairs, lid, k, F.col("dist"), rtb)


def _bounded_round(lp, rp, lcols, rcols, theta, k, lid, dist, rtb):
    """One θ-bounded candidate round: grid distance join over SKINNY
    key-only frames, per-left top-k window with a candidate count riding
    along (single shuffle on lid), then split into exact rows (>= k
    candidates) and deficient ids.

    When a unique right key (`rtb`) exists, only (id, coords) rows enter
    the grid explosion and the window sort — the wide payload columns
    are fetched back by two equi-joins on the ≤ |L|·k survivors. At
    scale this is the difference between shuffling every column through
    a ×(2^d) cell replication and shuffling 3 skinny columns (the
    reference's RKJSpark replicates full rows, RKJSpark.scala:111-135).

    The ranked candidates are localCheckpoint'ed: materialized once for
    the two consumers, lineage truncated so downstream plans stay small,
    and the blocks are freed by Spark's ContextCleaner when the result
    DataFrame is dropped — unlike a persist() that outlives the call."""
    skinny = rtb is not None
    if skinny:
        lj = lp.select(*dict.fromkeys([lid, *lcols]))
        rj = rp.select(*dict.fromkeys([rtb, *rcols]))
    else:
        lj, rj = lp, rp
    cand = distance_join(
        lj, rj, lcols, rcols, theta,
        algo="grid", left_prefix="", right_prefix="",
    ).withColumn("dist", dist)
    order = [F.col("dist").asc()] + ([F.col(rtb).asc()] if rtb else [])
    w = Window.partitionBy(lid).orderBy(*order)
    wall = Window.partitionBy(lid)
    ranked = (
        cand.withColumn("__rn", F.row_number().over(w))
        .withColumn("__cnt", F.count(F.lit(1)).over(wall))
        .filter(F.col("__rn") <= int(k))
    )
    if skinny:
        ranked = ranked.select(lid, rtb, "dist", "__cnt")
    ranked = ranked.localCheckpoint(eager=True)
    ok = ranked.filter(F.col("__cnt") >= k).drop("__rn", "__cnt")
    if skinny:
        # fetch the wide rows back by id; AQE broadcasts whichever side
        # fits, and the join keys are already clustered by the window
        ok = (
            ok.join(lp, on=lid, how="inner")
            .join(rp, on=rtb, how="inner")
            .select(*lp.columns, *rp.columns, "dist")
        )
    ok_ids = ranked.filter(F.col("__cnt") >= k).select(lid).distinct()
    # one anti-join covers both deficient (< k candidates) and missing
    # (zero candidates — absent from the grid join output entirely)
    retry_ids = lp.select(lid).join(ok_ids, on=lid, how="left_anti")
    return ok, retry_ids


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's shuffle parallelism —
    cartesian outputs inherit child partitioning, so a single-file side
    would serialize the whole pair stream through one task."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    return df.repartition(n)


def _plan_bytes(df: DataFrame) -> float:
    """Catalyst's size estimate for the relation (same statistic the
    broadcast-join planner consults); inf if the backend hides it."""
    try:
        return float(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return float("inf")


def _broadcast_cap(df: DataFrame) -> float:
    """Byte threshold for routing a kNN join to the broadcast plan —
    `simba_spark.knnjoin.broadcast_bytes` if set, else 8 MB (slightly
    under Spark's default autoBroadcastJoinThreshold)."""
    try:
        v = df.sparkSession.conf.get("simba_spark.knnjoin.broadcast_bytes", None)
        if v is not None:
            return float(v)
    except Exception:
        pass
    return 8_000_000.0


def _hash_sample(df: DataFrame, cols: Sequence[str], cap: int, salt: int):
    """~Uniform deterministic sample of the key columns in ONE job:
    distributed top-`cap` by xxhash64 (TakeOrderedAndProject — partial
    top-k per partition, no full count, no sort). Returns a numpy array
    (Arrow transfer — no per-row pickling)."""
    dims = [F.col(c).cast("double").alias(f"__d{i}") for i, c in enumerate(cols)]
    key = F.struct(*[F.col(c).cast("double") for c in cols])
    pdf = (
        df.select(*dims, F.xxhash64(key, F.lit(salt)).alias("__h"))
        .orderBy("__h")
        .limit(int(cap))
        .drop("__h")
        .toPandas()
    )
    return pdf.to_numpy(dtype="float64")


def _estimate_theta(left_sample, right_sample, k: int, margin: float) -> float:
    """Driver-side: high quantile of kth-NN distance from left-sample
    points to the right sample (numpy; both samples are small)."""
    import numpy as np

    if len(left_sample) == 0 or len(right_sample) == 0:
        return float("inf")
    L = np.asarray(left_sample, dtype="float64")
    R = np.asarray(right_sample, dtype="float64")
    kk = min(k, len(R))
    # pairwise squared distances via the matmul identity (one BLAS call,
    # ~50× faster than broadcast-subtract temporaries), in row blocks to
    # bound memory at |B|·|R| doubles
    r2 = (R * R).sum(axis=1)
    qs = []
    B = 2048
    for i in range(0, len(L), B):
        Lb = L[i : i + B]
        d2 = (Lb * Lb).sum(axis=1)[:, None] + r2[None, :] - 2.0 * (Lb @ R.T)
        np.maximum(d2, 0.0, out=d2)
        kth = np.partition(d2, kk - 1, axis=1)[:, kk - 1]
        qs.append(np.sqrt(kth))
    kth_dists = np.concatenate(qs)
    return float(np.quantile(kth_dists, 0.95) * margin)


# ---------------------------------------------------------------------------
# approximate z-order kNN join (ZKJSpark analog)


def zknn_join(
    left: DataFrame,
    right: DataFrame,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    k: int,
    left_id: str = None,
    shifts: int = 2,
    seed: int = 42,
    bits: int = 16,
    bucket_bits: Optional[int] = None,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
    right_tiebreak: Optional[str] = None,
    refine: str = "rank",
    window_mult: int = 2,
) -> DataFrame:
    """Approximate kNN join via z-order curves with random shifts
    (ref: ZKJSpark.scala:36-170; shifts default 2, SimbaConf.scala:120).

    Both sides map onto a [0, 2^bits) integer grid with ONE isotropic
    scale factor (union bounding box as a broadcast 1-row aggregate — on
    the rank path no driver job at all) and are z-valued —
    per-dimension normalization would distort the metric on anisotropic
    data.

    ``refine='rank'`` (default, requires `right_tiebreak` as a unique
    right key — reference parity): per shift, each left row pairs with
    exactly its ``window_mult·k`` preceding and following right rows in
    z order (ref: ZKJSpark's ±k candidate windows, ZKJSpark.scala:36-170;
    the multiplier buys recall at a strictly bounded 2·window_mult·k·
    shifts candidates per left row — a dense z-region cannot blow up
    the join). The global z-rank is computed scalably:
    range-repartition by z, per-partition running counts, broadcast
    cumulative per-partition offsets — never a single-partition window
    over the data.

    ``refine='bucket'`` (fallback when no unique right key is given):
    bucket both sides by coarse z-prefix and equi-join on bucket
    ∈ {b-1, b, b+1} — join-expressible but density-sensitive.

    Deterministic given `seed`. Exactness is NOT guaranteed — use
    :func:`knn_join` for exact results.
    """
    assert left_id is not None, "zknn_join requires left_id"
    d = len(left_cols)
    assert d == len(right_cols)
    k = int(k)
    rng = random.Random(seed)
    scale = (1 << bits) - 1

    # bounding box over both sides — ONE tiny aggregate over a tagged
    # union of just the key columns. On the rank path it stays a 1-row
    # DataFrame broadcast into the z expressions (NO driver job at all);
    # the bucket path collects it (it needs the right count for its
    # bucket-granularity heuristic).
    lk = left.select(
        *[F.col(c).cast("double").alias(f"d{i}") for i, c in enumerate(left_cols)],
        F.lit(0).alias("__r"),
    )
    rk = right.select(
        *[F.col(c).cast("double").alias(f"d{i}") for i, c in enumerate(right_cols)],
        F.lit(1).alias("__r"),
    )
    stats_df = lk.unionByName(rk).agg(
        *[F.min(f"d{i}").alias(f"__mn{i}") for i in range(d)],
        *[F.max(f"d{i}").alias(f"__mx{i}") for i in range(d)],
        F.sum("__r").alias("__nr"),
    )
    # ONE isotropic scale factor for every dimension: per-dim
    # normalization would stretch narrow dimensions, silently changing
    # the metric (z-neighbors in stretched space are not Euclidean
    # neighbors — recall collapses on anisotropic data like
    # (acctbal, nationkey)). The reference interleaves raw coordinates
    # for the same reason (ref: ZKJSpark.scala:46-54).
    spans = [
        F.when(
            F.col(f"__mx{i}") > F.col(f"__mn{i}"),
            F.col(f"__mx{i}") - F.col(f"__mn{i}"),
        ).otherwise(F.lit(1.0)).alias(f"__sp{i}")
        for i in range(d)
    ]
    stats_df = stats_df.select("*", *spans).withColumn(
        "__iso", F.lit(float(scale)) / F.greatest(*[F.col(f"__sp{i}") for i in range(d)])
    )

    lp = _prefix_columns(left, left_prefix)
    rp = _prefix_columns(right, right_prefix)
    lid = f"{left_prefix}{left_id}"
    lcols = [f"{left_prefix}{c}" for c in left_cols]
    rcols = [f"{right_prefix}{c}" for c in right_cols]
    rtb = f"{right_prefix}{right_tiebreak}" if right_tiebreak else None
    dist = F.sqrt(dist2_cols(lcols, rcols))

    # the shift is span · u with u a data-independent draw — so it stays
    # a Column (span from the broadcast stats row, u a literal) and the
    # curve is identical to the collected-literal formulation
    shift_us = [
        [0.0] * d if s == 0 else [rng.uniform(0.0, 1.0) for _ in range(d)]
        for s in range(int(shifts))
    ]

    def zcol(cols, us):
        from ..functions import z_value_col

        ints = []
        for i, (c, u) in enumerate(zip(cols, us)):
            sv = F.col(f"__sp{i}") * F.lit(float(u))
            ints.append(
                F.least(
                    F.lit(scale),
                    F.greatest(
                        F.lit(0),
                        F.round(
                            (F.col(c) + sv - F.col(f"__mn{i}")) * F.col("__iso")
                        ).cast("long"),
                    ),
                )
            )
        return z_value_col(ints, bits=bits)

    if refine == "rank" and rtb is not None:
        bstats = F.broadcast(stats_df)
        lz_list = [
            lp.crossJoin(bstats).select(lid, zcol(lcols, us).alias("__z"))
            for us in shift_us
        ]
        rz_list = [
            rp.crossJoin(bstats).select(rtb, zcol(rcols, us).alias("__z"))
            for us in shift_us
        ]
        cand_ids = _zrank_candidates_multi(
            lz_list, rz_list, k * max(1, int(window_mult)), lid, rtb
        ).dropDuplicates([lid, rtb])
        pairs = (
            cand_ids.join(lp, on=lid, how="inner")
            .join(rp, on=rtb, how="inner")
            .withColumn("dist", dist)
        )
        return _topk(pairs, lid, k, F.col("dist"), rtb)

    # bucket path: needs driver-side stats (bucket_bits heuristic)
    stats = stats_df.collect()[0]
    mins = [stats[f"__mn{i}"] for i in range(d)]
    span_vals = [float(stats[f"__sp{i}"]) for i in range(d)]
    iso = float(stats["__iso"])
    n_right = int(stats["__nr"])

    if bucket_bits is None:
        # choose bucket granularity from density: aim for ~8k right rows
        # per bucket so the ±1-bucket candidate window holds ≳ 24k z-order
        # neighbors per left row (ZKJSpark keeps ±k per shift — we keep a
        # whole bucket, coarser but join-expressible)
        target_buckets = max(1, n_right // max(1, 8 * k))
        bucket_bits = max(1, min(d * bits - 1, int(math.log2(target_buckets)) if target_buckets > 1 else 1))

    def zcol_lit(cols, us):
        from ..functions import z_value_col

        ints = [
            F.least(
                F.lit(scale),
                F.greatest(
                    F.lit(0),
                    F.round(
                        (F.col(c) + F.lit(sp * u) - F.lit(mn)) * F.lit(iso)
                    ).cast("long"),
                ),
            )
            for c, u, sp, mn in zip(cols, us, span_vals, mins)
        ]
        return z_value_col(ints, bits=bits)

    # bucket fallback (no unique right key): coarse z-prefix equi-join
    unions = []
    for us in shift_us:
        shift_amt = d * bits - bucket_bits
        lz = lp.withColumn("__b", F.shiftright(zcol_lit(lcols, us), shift_amt))
        rz = rp.withColumn("__b", F.shiftright(zcol_lit(rcols, us), shift_amt))
        rz = rz.withColumn("__b", F.explode(F.array(F.col("__b") - 1, F.col("__b"), F.col("__b") + 1)))
        unions.append(lz.join(rz, on="__b", how="inner").drop("__b"))

    cand = unions[0]
    for u in unions[1:]:
        cand = cand.unionByName(u)
    # a pair can appear under several shifts/buckets — dedup before top-k
    pair_key = [lid] + ([rtb] if rtb else rcols)
    cand = cand.dropDuplicates(pair_key)
    pairs = cand.withColumn("dist", dist)
    return _topk(pairs, lid, k, F.col("dist"), rtb)


def _zrank_candidates_multi(lz_list, rz_list, k: int, lid: str, rid: str):
    """(left_id, right_id) candidates = each left row's ±k z-order right
    neighbors, for ALL shifts in one ranking pipeline
    (ref: ZKJSpark.scala:36-170 ±k windows).

    Scalable global rank per shift: tag + union the skinny
    (shift, id, z) rows across shifts and sides, range-repartition by
    (shift, z), running count of right rows per (partition, shift)
    (parallel window — never a single-partition sort), then add
    driver-computed per-(shift, partition) offsets (one tiny collect of
    shifts×partitions longs). Left rows read off c = #right rows ordered
    before them in their shift; ±k = ranks [c-k+1, c+k], materialized by
    exploding a 2k-element sequence and equi-joining on (shift, rank) —
    bounded fanout, no range join, no skew. One localCheckpoint pins the
    partitioning so the offsets job and the main pipeline see identical
    row placement."""
    k = int(k)
    parts = []
    for tag, (lz, rz) in enumerate(zip(lz_list, rz_list)):
        parts.append(
            rz.select(
                F.lit(tag).alias("__tag"), F.col(rid).alias("__uid"),
                "__z", F.lit(1).alias("__isr"),
            )
        )
        parts.append(
            lz.select(
                F.lit(tag).alias("__tag"), F.col(lid).alias("__uid"),
                "__z", F.lit(0).alias("__isr"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    n = int(u.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    # order: shift, z asc, right-before-left at equal z (so c includes
    # ties), unique id last for full determinism
    sort_cols = [
        F.col("__tag").asc(), F.col("__z").asc(),
        F.col("__isr").desc(), F.col("__uid").asc(),
    ]
    inner_sort = sort_cols[1:]
    d = (
        u.repartitionByRange(n, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # per-(shift, partition) offset = right rows in earlier partitions of
    # the same shift: a tiny cumulative window over ≤ shifts·n rows,
    # broadcast back — fully declarative, no driver round-trip
    woff = (
        Window.partitionBy("__tag")
        .orderBy(F.col("__pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        d.groupBy("__tag", "__pid")
        .agg(F.sum("__isr").alias("__s"))
        .withColumn("__off", F.coalesce(F.sum("__s").over(woff), F.lit(0)))
        .drop("__s")
    )
    w = Window.partitionBy("__pid", "__tag").orderBy(*inner_sort).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = d.join(F.broadcast(offsets), on=["__tag", "__pid"], how="inner").withColumn(
        "__c", F.sum("__isr").over(w) + F.col("__off")
    ).drop("__off")
    rranks = ranked.filter(F.col("__isr") == 1).select(
        "__tag", F.col("__uid").alias(rid), F.col("__c").alias("__rank")
    )
    lcounts = ranked.filter(F.col("__isr") == 0).select(
        "__tag", F.col("__uid").alias(lid), "__c"
    )
    wanted = lcounts.select(
        "__tag",
        lid,
        F.explode(
            F.sequence(
                F.greatest(F.col("__c") - k + 1, F.lit(1).cast("long")),
                F.col("__c") + k,
            )
        ).alias("__rank"),
    )
    return wanted.join(rranks, on=["__tag", "__rank"], how="inner").select(lid, rid)
