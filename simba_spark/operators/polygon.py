"""Polygon containment as pure Column arithmetic.

The reference supports Polygon shapes via JTS (ref: Polygon.scala:32,
build.sbt:30) in range predicates (`InRange` evaluates
MBR-intersects-shape, ref: InRange.scala:35-42). Our engine goes one
step further for the common case of a *literal* query polygon: the
even-odd (crossing number) point-in-polygon test unrolls into a fixed
sum of per-edge Column expressions — fully codegen'd, no UDF, no
shapely — and the same arithmetic is expressible in ANSI SQL for the
oracle harness.

Boundary semantics: interior OR on-edge (closed), matching the
boundary-inclusive contract of :meth:`simba_spark.geometry.Polygon.contains`.

Polygon *columns* (arbitrary per-row polygons) are JVM-side too:
:func:`in_polygon_col` runs the same even-odd test with higher-order
array functions (aggregate/zip_with over the vertex arrays) — no
pandas UDF anywhere in this module.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def in_polygon(
    xcol, ycol, vertices: Sequence[Tuple[float, float]], eps: float = 1e-12
) -> Column:
    """Closed point-in-polygon for a literal 2-D polygon.

    Crossing-number parity for the interior + exact on-edge test per
    edge (distance-free formulation: collinearity cross-product within
    eps AND within the edge's closed bounding box).
    """
    x = F.col(xcol) if isinstance(xcol, str) else xcol
    y = F.col(ycol) if isinstance(ycol, str) else ycol
    vs = [(float(a), float(b)) for a, b in vertices]
    if vs[0] == vs[-1]:
        vs = vs[:-1]
    assert len(vs) >= 3, "polygon needs >= 3 vertices"

    crossings = F.lit(0)
    on_edge = F.lit(False)
    n = len(vs)
    for i in range(n):
        x1, y1 = vs[i]
        x2, y2 = vs[(i + 1) % n]
        # ray-casting: edge straddles the horizontal line through y and
        # the intersection lies strictly right of x
        straddles = (F.lit(y1) > y) != (F.lit(y2) > y)
        xin = F.lit(x2 - x1) * (y - F.lit(y1)) / F.lit(y2 - y1) + F.lit(x1) if y2 != y1 else F.lit(float("inf"))
        crossings = crossings + F.when(straddles & (x < xin), 1).otherwise(0)
        # on-edge: cross product ~ 0 and inside closed bbox of the edge
        cross = (F.lit(x2 - x1)) * (y - F.lit(y1)) - (F.lit(y2 - y1)) * (x - F.lit(x1))
        bbox = (
            (x >= F.lit(min(x1, x2))) & (x <= F.lit(max(x1, x2)))
            & (y >= F.lit(min(y1, y2))) & (y <= F.lit(max(y1, y2)))
        )
        on_edge = on_edge | ((F.abs(cross) <= F.lit(eps)) & bbox)
    return (crossings % 2 == 1) | on_edge


def in_polygon_sql(
    xexpr: str, yexpr: str, vertices: Sequence[Tuple[float, float]], eps: float = 1e-12
) -> str:
    """The identical predicate as an ANSI SQL string (DuckDB oracle)."""
    vs = [(float(a), float(b)) for a, b in vertices]
    if vs[0] == vs[-1]:
        vs = vs[:-1]
    n = len(vs)
    cross_terms = []
    edge_terms = []
    for i in range(n):
        x1, y1 = vs[i]
        x2, y2 = vs[(i + 1) % n]
        if y2 != y1:
            xin = f"(({x2} - {x1}) * ({yexpr} - {y1}) / ({y2} - {y1}) + {x1})"
            cond = (
                f"CASE WHEN (({y1} > {yexpr}) != ({y2} > {yexpr})) "
                f"AND ({xexpr} < {xin}) THEN 1 ELSE 0 END"
            )
        else:
            cond = "0"
        cross_terms.append(cond)
        cross = f"(({x2} - {x1}) * ({yexpr} - {y1}) - ({y2} - {y1}) * ({xexpr} - {x1}))"
        edge_terms.append(
            f"(abs({cross}) <= {eps} AND {xexpr} >= {min(x1, x2)} AND {xexpr} <= {max(x1, x2)}"
            f" AND {yexpr} >= {min(y1, y2)} AND {yexpr} <= {max(y1, y2)})"
        )
    return (
        "((" + " + ".join(cross_terms) + ") % 2 = 1 OR "
        + " OR ".join(edge_terms) + ")"
    )


def in_polygon_col(xcol, ycol, poly_col, eps: float = 1e-12) -> Column:
    """Closed point-in-polygon where the polygon is a COLUMN
    (`array<struct<x:double,y:double>>`) — arbitrary per-row polygons.

    Same even-odd + on-edge contract as :func:`in_polygon`, but built
    from higher-order array functions (zip_with over the vertex ring +
    aggregate) so the expression is constant-size in the vertex count
    and runs JVM-side — the reference needed a JTS object per row
    (ref: Polygon.scala:32); we never leave codegen.
    """
    x = F.col(xcol) if isinstance(xcol, str) else xcol
    y = F.col(ycol) if isinstance(ycol, str) else ycol
    p = F.col(poly_col) if isinstance(poly_col, str) else poly_col
    # edge list = ring zip: (v_i, v_{i+1 mod n})
    rot = F.concat(F.slice(p, 2, F.size(p) - 1), F.slice(p, 1, 1))
    edges = F.zip_with(p, rot, lambda a, b: F.struct(a.alias("p"), b.alias("q")))

    def edge_crossing(acc, e):
        x1, y1 = e["p"]["x"], e["p"]["y"]
        x2, y2 = e["q"]["x"], e["q"]["y"]
        straddles = (y1 > y) != (y2 > y)
        # guarded by `straddles` (horizontal edges can't straddle), so a
        # 0/0 NaN here never selects the branch
        xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
        return acc + F.when(straddles & (x < xin), 1).otherwise(0)

    def edge_touch(acc, e):
        x1, y1 = e["p"]["x"], e["p"]["y"]
        x2, y2 = e["q"]["x"], e["q"]["y"]
        cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
        bbox = (
            (x >= F.least(x1, x2)) & (x <= F.greatest(x1, x2))
            & (y >= F.least(y1, y2)) & (y <= F.greatest(y1, y2))
        )
        return acc | ((F.abs(cross) <= F.lit(eps)) & bbox)

    crossings = F.aggregate(edges, F.lit(0), edge_crossing)
    on_edge = F.aggregate(edges, F.lit(False), edge_touch)
    return (crossings % 2 == 1) | on_edge


def _poly_edges(p) -> Column:
    """Edge list of a polygon column: ring zip (v_i, v_{i+1 mod n})."""
    rot = F.concat(F.slice(p, 2, F.size(p) - 1), F.slice(p, 1, 1))
    return F.zip_with(p, rot, lambda a, b: F.struct(a.alias("p"), b.alias("q")))


def polygon_intersects_box_col(
    poly_col, low: Sequence[float], high: Sequence[float], eps: float = 1e-12
) -> Column:
    """Closed polygon-COLUMN vs literal query-box intersection — the
    reference's ``Polygon.intersects(MBR)`` for polygon rows
    (ref: Polygon.scala:40-107 dispatched from MBR.scala:60-67 via
    ShapeUtils). Pure higher-order Column arithmetic, constant-size in
    the vertex count.

    Complete 3-part test: (a) some polygon vertex lies in the box, or
    (b) some box corner lies in the polygon (box inside polygon), or
    (c) some polygon edge crosses the box boundary (thin polygon
    slicing through the box with no vertex inside)."""
    p = F.col(poly_col) if isinstance(poly_col, str) else poly_col
    lox, loy = float(low[0]), float(low[1])
    hix, hiy = float(high[0]), float(high[1])

    vertex_in_box = F.exists(
        p,
        lambda v: (v["x"] >= F.lit(lox))
        & (v["x"] <= F.lit(hix))
        & (v["y"] >= F.lit(loy))
        & (v["y"] <= F.lit(hiy)),
    )
    corner_in_poly = F.lit(False)
    for cx, cy in ((lox, loy), (hix, loy), (lox, hiy), (hix, hiy)):
        corner_in_poly = corner_in_poly | in_polygon_col(
            F.lit(cx), F.lit(cy), p, eps=eps
        )

    def edge_hits_box(e):
        # separating axes, same formulation as
        # shapes.segment_intersects_box, per polygon edge
        x1, y1 = e["p"]["x"], e["p"]["y"]
        x2, y2 = e["q"]["x"], e["q"]["y"]
        bbox = (
            (F.least(x1, x2) <= F.lit(hix))
            & (F.greatest(x1, x2) >= F.lit(lox))
            & (F.least(y1, y2) <= F.lit(hiy))
            & (F.greatest(y1, y2) >= F.lit(loy))
        )
        dx, dy = x2 - x1, y2 - y1

        def cross(cx, cy):
            return dx * (F.lit(cy) - y1) - dy * (F.lit(cx) - x1)

        c1, c2 = cross(lox, loy), cross(hix, loy)
        c3, c4 = cross(lox, hiy), cross(hix, hiy)
        all_pos = (c1 > 0) & (c2 > 0) & (c3 > 0) & (c4 > 0)
        all_neg = (c1 < 0) & (c2 < 0) & (c3 < 0) & (c4 < 0)
        return bbox & ~all_pos & ~all_neg

    edge_crosses = F.exists(_poly_edges(p), edge_hits_box)
    return vertex_in_box | corner_in_poly | edge_crosses


def _point_seg_d2(cx, cy, x1, y1, x2, y2):
    """Squared distance from point (cx, cy) to the closed segment —
    clamped-projection, branch-free; zero-length segments fall back to
    the endpoint."""
    dx, dy = x2 - x1, y2 - y1
    len2 = dx * dx + dy * dy
    t_raw = ((cx - x1) * dx + (cy - y1) * dy) / len2
    t = F.when(len2 > 0, F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))).otherwise(
        F.lit(0.0)
    )
    px = x1 + t * dx
    py = y1 + t * dy
    return (cx - px) * (cx - px) + (cy - py) * (cy - py)


def polygon_intersects_circle_col(
    poly_col, center: Sequence[float], radius: float, eps: float = 1e-12
) -> Column:
    """Closed polygon-COLUMN vs query-ball intersection — the
    reference's ``Polygon.intersects(Circle)`` via minDist
    (ref: Polygon.scala:40-107, Circle.scala:69): the center lies
    inside the polygon, or some edge passes within r of it."""
    p = F.col(poly_col) if isinstance(poly_col, str) else poly_col
    cx, cy, r = float(center[0]), float(center[1]), float(radius)
    inside = in_polygon_col(F.lit(cx), F.lit(cy), p, eps=eps)
    near_edge = F.exists(
        _poly_edges(p),
        lambda e: _point_seg_d2(
            F.lit(cx), F.lit(cy), e["p"]["x"], e["p"]["y"], e["q"]["x"], e["q"]["y"]
        )
        <= F.lit(r * r),
    )
    return inside | near_edge


def point_to_polygon_dist2(xcol, ycol, poly_col, eps: float = 1e-12) -> Column:
    """Squared distance from a point to a polygon COLUMN: 0 if the
    point is inside or on the boundary (closed), else the min over
    edges of the point-segment distance — the reference's
    ``Polygon.minDist`` (ref: Polygon.scala:83-107)."""
    x = F.col(xcol) if isinstance(xcol, str) else xcol
    y = F.col(ycol) if isinstance(ycol, str) else ycol
    p = F.col(poly_col) if isinstance(poly_col, str) else poly_col
    edge_min = F.aggregate(
        _poly_edges(p),
        F.lit(float("inf")),
        lambda acc, e: F.least(
            acc,
            _point_seg_d2(x, y, e["p"]["x"], e["p"]["y"], e["q"]["x"], e["q"]["y"]),
        ),
    )
    return F.when(in_polygon_col(x, y, p, eps=eps), F.lit(0.0)).otherwise(edge_min)


def polygon_distance_join(
    polys: DataFrame,
    points: DataFrame,
    poly_col: str,
    point_cols: Sequence[str],
    r: float,
    cell_size: float = None,
    left_prefix: str = "a_",
    right_prefix: str = "b_",
    max_cells_per_row: int = 10_000,
) -> DataFrame:
    """All (polygon row, point row) pairs with
    dist(polygon, point) <= r (closed) — the polygon distance join the
    reference reaches through JTS minDist inside its distance-join
    operators (ref: Polygon.scala:83-107 + DJSpark.scala:36-118).

    Same program shape as the grid distance join: each polygon explodes
    to the grid cells its r-expanded MBR covers, a point lives in
    exactly ONE cell (unique emission — no dedup pass), equi-join on
    cell, then the exact JVM-side refine
    :func:`point_to_polygon_dist2` <= r². `cell_size=None` derives the
    width from the average expanded-MBR extent (1-row broadcast
    aggregate)."""
    assert len(point_cols) == 2, "polygon_distance_join is 2-D"
    r = float(r)
    lp = polys.select([F.col(c).alias(f"{left_prefix}{c}") for c in polys.columns])
    rp = points.select([F.col(c).alias(f"{right_prefix}{c}") for c in points.columns])
    pc = F.col(f"{left_prefix}{poly_col}")
    px = F.col(f"{right_prefix}{point_cols[0]}").cast("double")
    py = F.col(f"{right_prefix}{point_cols[1]}").cast("double")

    # r-expanded MBR as plain columns, computed ONCE per polygon row:
    # higher-order functions are CodegenFallback, so everything
    # evaluated per CANDIDATE must be plain arithmetic — the exact
    # refine only runs on rows that survive the codegen'd box test
    xs = F.transform(pc, lambda v: v["x"])
    ys = F.transform(pc, lambda v: v["y"])
    lp = lp.select(
        "*",
        (F.array_min(xs) - F.lit(r)).alias("__mnx"),
        (F.array_max(xs) + F.lit(r)).alias("__mxx"),
        (F.array_min(ys) - F.lit(r)).alias("__mny"),
        (F.array_max(ys) + F.lit(r)).alias("__mxy"),
    )

    if cell_size is None:
        stats = F.broadcast(
            lp.select(
                F.greatest(
                    F.col("__mxx") - F.col("__mnx"), F.col("__mxy") - F.col("__mny")
                ).alias("__ext")
            ).agg(F.greatest(F.avg("__ext"), F.lit(1e-9)).alias("__cw"))
        )
        lp = lp.crossJoin(stats)
        rp = rp.crossJoin(stats)
        cw = F.col("__cw")
    else:
        cw = F.lit(float(cell_size))

    cxlo = F.floor(F.col("__mnx") / cw).cast("long")
    cxhi = F.floor(F.col("__mxx") / cw).cast("long")
    cylo = F.floor(F.col("__mny") / cw).cast("long")
    cyhi = F.floor(F.col("__mxy") / cw).cast("long")
    n_cells = (cxhi - cxlo + 1) * (cyhi - cylo + 1)
    guard = F.when(n_cells <= int(max_cells_per_row), cxhi).otherwise(
        F.raise_error(
            F.lit(
                "polygon_distance_join: a polygon's expanded MBR covers more "
                f"than {max_cells_per_row} cells — pass a larger cell_size"
            )
        ).cast("long")
    )
    lg = lp.withColumn("__cx", F.explode(F.sequence(cxlo, guard))).withColumn(
        "__cy", F.explode(F.sequence(cylo, cyhi))
    )
    rg = rp.withColumn("__cx", F.floor(px / cw).cast("long")).withColumn(
        "__cy", F.floor(py / cw).cast("long")
    )
    if cell_size is None:
        lg = lg.drop("__cw")
        rg = rg.drop("__cw")
    return (
        lg.join(rg, on=["__cx", "__cy"], how="inner")
        # codegen'd sargable pre-filter: point inside the r-expanded
        # MBR — kills the bulk of candidates before the interpreted
        # exact polygon-distance test
        .filter(
            (px >= F.col("__mnx"))
            & (px <= F.col("__mxx"))
            & (py >= F.col("__mny"))
            & (py <= F.col("__mxy"))
        )
        # dist(poly, p) <= r  ⟺  some edge within r OR p inside — the
        # Or short-circuits and exists() stops at the first hit, so the
        # common candidate evaluates ONE interpreted HOF instead of the
        # three inside point_to_polygon_dist2
        .filter(
            F.exists(
                _poly_edges(pc),
                lambda e: _point_seg_d2(
                    px, py, e["p"]["x"], e["p"]["y"], e["q"]["x"], e["q"]["y"]
                )
                <= F.lit(r * r),
            )
            | in_polygon_col(px, py, pc)
        )
        .drop("__cx", "__cy", "__mnx", "__mxx", "__mny", "__mxy")
    )


def polygon_intersects_segment_col(poly_col, x1, y1, x2, y2, eps: float = 1e-12) -> Column:
    """Closed polygon-COLUMN vs segment intersection — the reference's
    ``Polygon.intersects(LineSegment)`` (ref: Polygon.scala:40-107
    dispatching on shape type via ShapeUtils). Segment endpoints may be
    literals or Columns.

    Two cases cover everything: (a) some polygon edge intersects the
    segment (orientation tests, closed), or (b) the segment lies fully
    inside — detected by its first endpoint being inside/on the
    polygon (if no edge crossing exists, both endpoints are on the same
    side of the boundary)."""
    from .shapes import seg_seg_intersect_coords

    p = F.col(poly_col) if isinstance(poly_col, str) else poly_col
    sx1 = F.lit(float(x1)) if isinstance(x1, (int, float)) else x1
    sy1 = F.lit(float(y1)) if isinstance(y1, (int, float)) else y1
    sx2 = F.lit(float(x2)) if isinstance(x2, (int, float)) else x2
    sy2 = F.lit(float(y2)) if isinstance(y2, (int, float)) else y2
    edge_hit = F.exists(
        _poly_edges(p),
        lambda e: seg_seg_intersect_coords(
            e["p"]["x"], e["p"]["y"], e["q"]["x"], e["q"]["y"],
            sx1, sy1, sx2, sy2,
        ),
    )
    return edge_hit | in_polygon_col(sx1, sy1, p, eps=eps)


def polygons_intersect_col(poly_a, poly_b, eps: float = 1e-12) -> Column:
    """Closed polygon-COLUMN vs polygon-COLUMN intersection — the last
    cell of the reference's JTS shape-dispatch matrix
    (ref: Polygon.scala:40-107, ``Polygon.intersects(Polygon)``).

    Complete 3-part test: (a) some edge pair intersects, or (b) A's
    first vertex lies in B (A fully inside B), or (c) B's first vertex
    lies in A — if no edge crossing exists, one polygon is either fully
    inside or fully outside the other, so one vertex probe per
    direction suffices."""
    from .shapes import seg_seg_intersect_coords

    pa = F.col(poly_a) if isinstance(poly_a, str) else poly_a
    pb = F.col(poly_b) if isinstance(poly_b, str) else poly_b
    edge_pair = F.exists(
        _poly_edges(pa),
        lambda ea: F.exists(
            _poly_edges(pb),
            lambda eb: seg_seg_intersect_coords(
                ea["p"]["x"], ea["p"]["y"], ea["q"]["x"], ea["q"]["y"],
                eb["p"]["x"], eb["p"]["y"], eb["q"]["x"], eb["q"]["y"],
            ),
        ),
    )
    a0, b0 = F.element_at(pa, 1), F.element_at(pb, 1)
    return (
        edge_pair
        | in_polygon_col(a0["x"], a0["y"], pb, eps=eps)
        | in_polygon_col(b0["x"], b0["y"], pa, eps=eps)
    )


def _seg_seg_d2(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) -> Column:
    """Squared distance between two closed segments that do NOT
    properly cross: min of the four endpoint-to-other-segment clamped
    projections (exact for non-crossing segments; callers test
    intersection separately where 0 applies)."""
    return F.least(
        _point_seg_d2(ax1, ay1, bx1, by1, bx2, by2),
        _point_seg_d2(ax2, ay2, bx1, by1, bx2, by2),
        _point_seg_d2(bx1, by1, ax1, ay1, ax2, ay2),
        _point_seg_d2(bx2, by2, ax1, ay1, ax2, ay2),
    )


def polygon_to_polygon_dist2(poly_a, poly_b, eps: float = 1e-12) -> Column:
    """Squared distance between two polygon COLUMNS: 0 if they
    intersect (closed), else the min over edge pairs of the
    segment-segment distance — the reference's ``Polygon.minDist``
    generalized to polygon arguments (ref: Polygon.scala:83-107)."""
    pa = F.col(poly_a) if isinstance(poly_a, str) else poly_a
    pb = F.col(poly_b) if isinstance(poly_b, str) else poly_b
    pair_min = F.aggregate(
        _poly_edges(pa),
        F.lit(float("inf")),
        lambda acc, ea: F.least(
            acc,
            F.aggregate(
                _poly_edges(pb),
                F.lit(float("inf")),
                lambda acc2, eb: F.least(
                    acc2,
                    _seg_seg_d2(
                        ea["p"]["x"], ea["p"]["y"], ea["q"]["x"], ea["q"]["y"],
                        eb["p"]["x"], eb["p"]["y"], eb["q"]["x"], eb["q"]["y"],
                    ),
                ),
            ),
        ),
    )
    return F.when(polygons_intersect_col(pa, pb, eps=eps), F.lit(0.0)).otherwise(
        pair_min
    )


def _poly_mbr_cols(df: DataFrame, poly, r: float, prefix: str) -> DataFrame:
    """Attach the r-expanded MBR of a polygon column as plain columns
    (computed once per row — everything evaluated per CANDIDATE later
    must be codegen'd plain arithmetic)."""
    xs = F.transform(poly, lambda v: v["x"])
    ys = F.transform(poly, lambda v: v["y"])
    return df.select(
        "*",
        (F.array_min(xs) - F.lit(r)).alias(f"{prefix}mnx"),
        (F.array_max(xs) + F.lit(r)).alias(f"{prefix}mxx"),
        (F.array_min(ys) - F.lit(r)).alias(f"{prefix}mny"),
        (F.array_max(ys) + F.lit(r)).alias(f"{prefix}mxy"),
    )


def polygon_polygon_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    poly_a_col: str,
    poly_b_col: str,
    r: float = 0.0,
    cell_size: float = None,
    left_prefix: str = "a_",
    right_prefix: str = "b_",
    max_cells_per_row: int = 10_000,
) -> DataFrame:
    """All (A row, B row) pairs with dist(polygon_a, polygon_b) <= r
    (closed); ``r=0`` is the polygon-polygon INTERSECTION join. Closes
    the shape-matrix with the reference's JTS polygon×polygon dispatch
    (ref: Polygon.scala:40-107) as a distributed grid join.

    Both sides are polygons, so both explode to the grid cells their
    (A: r-expanded) MBR covers — a pair can share several cells, so
    each pair is emitted ONLY in its canonical cell: the cell of the
    top-left corner of the overlap of the two exploded boxes
    (max of the mins per axis), which every candidate pair provably
    shares. Equi-join + filter, no dedup shuffle — the 2-D analog of
    interval_overlap_join's canonical-bin rule. The codegen'd
    MBR-overlap pre-filter kills candidates before the interpreted
    exact polygon-distance refine."""
    r = float(r)
    lp = polys_a.select(
        [F.col(c).alias(f"{left_prefix}{c}") for c in polys_a.columns]
    )
    rp = polys_b.select(
        [F.col(c).alias(f"{right_prefix}{c}") for c in polys_b.columns]
    )
    pa = F.col(f"{left_prefix}{poly_a_col}")
    pb = F.col(f"{right_prefix}{poly_b_col}")
    lp = _poly_mbr_cols(lp, pa, r, "__a")
    rp = _poly_mbr_cols(rp, pb, 0.0, "__b")

    if cell_size is None:
        stats = F.broadcast(
            lp.select(
                F.greatest(
                    F.col("__amxx") - F.col("__amnx"),
                    F.col("__amxy") - F.col("__amny"),
                ).alias("__ext")
            )
            .unionByName(
                rp.select(
                    F.greatest(
                        F.col("__bmxx") - F.col("__bmnx"),
                        F.col("__bmxy") - F.col("__bmny"),
                    ).alias("__ext")
                )
            )
            .agg(F.greatest(F.avg("__ext"), F.lit(1e-9)).alias("__cw"))
        )
        lp = lp.crossJoin(stats)
        rp = rp.crossJoin(stats)
        cw = F.col("__cw")
    else:
        cw = F.lit(float(cell_size))

    def explode_cells(df, mnx, mxx, mny, mxy, who):
        cxlo = F.floor(F.col(mnx) / cw).cast("long")
        cxhi = F.floor(F.col(mxx) / cw).cast("long")
        cylo = F.floor(F.col(mny) / cw).cast("long")
        cyhi = F.floor(F.col(mxy) / cw).cast("long")
        n_cells = (cxhi - cxlo + 1) * (cyhi - cylo + 1)
        guard = F.when(n_cells <= int(max_cells_per_row), cxhi).otherwise(
            F.raise_error(
                F.lit(
                    f"polygon_polygon_join: a {who} MBR covers more than "
                    f"{max_cells_per_row} cells — pass a larger cell_size"
                )
            ).cast("long")
        )
        return df.withColumn("__cx", F.explode(F.sequence(cxlo, guard))).withColumn(
            "__cy", F.explode(F.sequence(cylo, cyhi))
        )

    lg = explode_cells(lp, "__amnx", "__amxx", "__amny", "__amxy", "left")
    rg = explode_cells(rp, "__bmnx", "__bmxx", "__bmny", "__bmxy", "right")
    if cell_size is None:
        lg = lg.drop("__cw")
    canon_cx = F.floor(F.greatest(F.col("__amnx"), F.col("__bmnx")) / cw).cast("long")
    canon_cy = F.floor(F.greatest(F.col("__amny"), F.col("__bmny")) / cw).cast("long")
    out = (
        lg.join(rg, on=["__cx", "__cy"], how="inner")
        # codegen'd sargable pre-filters: boxes overlap AND this is the
        # pair's canonical cell (unique emission)
        .filter(
            (F.col("__amnx") <= F.col("__bmxx"))
            & (F.col("__bmnx") <= F.col("__amxx"))
            & (F.col("__amny") <= F.col("__bmxy"))
            & (F.col("__bmny") <= F.col("__amxy"))
            & (F.col("__cx") == canon_cx)
            & (F.col("__cy") == canon_cy)
        )
    )
    if r == 0.0:
        out = out.filter(polygons_intersect_col(pa, pb))
    else:
        out = out.filter(polygon_to_polygon_dist2(pa, pb) <= F.lit(r * r))
    drop = ["__cx", "__cy"] + [f"__{s}{c}" for s in "ab" for c in ("mnx", "mxx", "mny", "mxy")]
    if cell_size is None:
        drop.append("__cw")
    return out.drop(*drop)


def polygon_range(
    df: DataFrame, cols: Sequence[str], vertices, registry=None
) -> DataFrame:
    """All rows whose 2-D point lies in the closed literal polygon.
    The polygon's MBR is applied first as a sargable pre-filter
    (pushes to Parquet row groups; the full test runs on survivors)."""
    assert len(cols) == 2, "polygon_range is 2-D"
    xs = [v[0] for v in vertices]
    ys = [v[1] for v in vertices]
    from ..functions import in_range

    pre = in_range(cols, (min(xs), min(ys)), (max(xs), max(ys)))
    if registry is not None:
        df = registry.prune_for_range(
            df, cols, [min(xs), min(ys)], [max(xs), max(ys)]
        )
    return df.filter(pre).filter(in_polygon(cols[0], cols[1], vertices))
