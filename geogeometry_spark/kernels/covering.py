"""Geohash covering planner — faithful port of the reference's iterative
set-refinement algorithm.  Runs driver-side (or via applyInPandas for many
polygons): output is the broadcast build side (polygon_id, cell, is_border)
of the PIP equi-join.

Reference: /root/reference/src/commonMain/kotlin/com/jillesvangurp/geo/GeoHashUtils.kt
- geoHashesForPolygon (hole filtering):  GeoHashUtils.kt:442-464
- geoHashesForMultiPolygon:              GeoHashUtils.kt:466-478
- geoHashesForLinearRing:                GeoHashUtils.kt:501-607
- splitAndFilter:                        GeoHashUtils.kt:609-645
- geoHashesForPath:                      GeoHashUtils.kt:652-676
- geoHashesForLine:                      GeoHashUtils.kt:687-719
- geoHashesForCircle:                    GeoHashUtils.kt:829-843
"""

from __future__ import annotations

import numpy as np

from . import geohash as gh
from . import geometry as geo

DEFAULT_GEO_HASH_LENGTH = gh.DEFAULT_LENGTH


def geohashes_for_linear_ring(
    ring: np.ndarray,
    max_length: int | None = None,
    include_partial: bool = False,
    _return_partial: bool = False,
) -> set[str]:
    """Cover a linear ring with geohashes. GeoHashUtils.kt:501-607.

    ``ring`` is (m, 2) [lon, lat], closed or open.  Fills from the inside;
    ``include_partial`` adds border hashes any of whose bbox corners is
    inside the ring.  When ``_return_partial`` is set, returns
    (full, partial) so the PIP join can route border cells to the exact
    re-check (engine extension; the reference discards partials).
    """
    ring = np.asarray(ring, dtype=np.float64)
    if (ring[:, 1] < -89.5).any() or (ring[:, 1] > 89.5).any():
        raise ValueError("please stay away from the north pole or the south pole")
    if max_length is not None and (max_length < 1 or max_length >= DEFAULT_GEO_HASH_LENGTH):
        raise ValueError(f"maxLength should be between 2 and {DEFAULT_GEO_HASH_LENGTH} was {max_length}")

    west, south, east, north_ = geo.bounding_box(ring)
    diagonal = geo.haversine_scalar(south, west, north_, east)
    hash_length = min(
        max_length if max_length is not None else 12,
        gh.suitable_hash_length(diagonal, south, west) + 1,
    )

    # raster-scan the bbox with same-length hashes, W->E then S->N
    # (GeoHashUtils.kt:544-564)
    partially_contained: set[str] = set()
    row_hash = str(gh.encode(south, west, hash_length)[0])
    row_box = gh.decode_bbox_scalar(row_hash)
    while row_box[1] < north_:  # southLatitude < northLat
        column_hash = row_hash
        column_box = row_box
        while gh.is_west(column_box[0], east):
            partially_contained.add(column_hash)
            column_hash = str(gh.east(np.array([column_hash]))[0])
            column_box = gh.decode_bbox_scalar(column_hash)
        row_hash = str(gh.north(np.array([row_hash]))[0])
        row_box = gh.decode_bbox_scalar(row_hash)

    fully_contained: set[str] = set()
    detail = hash_length
    # refine until target detail reached AND at least one full hash
    # (GeoHashUtils.kt:581-585)
    while detail < (max_length if max_length is not None else hash_length) or len(fully_contained) == 0:
        partially_contained = _split_and_filter(ring, fully_contained, partially_contained)
        detail += 1
    if len(fully_contained) == 0:  # fallback, GeoHashUtils.kt:587-589
        fully_contained.update(partially_contained)
    border = set(partially_contained)
    if include_partial:  # GeoHashUtils.kt:590-598
        for h in partially_contained:
            w, s, e, n = gh.decode_bbox_scalar(h)
            corners_lat = np.array([n, n, s, s])
            corners_lon = np.array([w, e, e, w])
            if geo.polygon_contains(corners_lat, corners_lon, ring).any():
                fully_contained.add(h)
    if max_length is not None and detail > max_length:
        # replace tiny hashes with bigger ones (GeoHashUtils.kt:599-606)
        filtered = set()
        for h in fully_contained:
            filtered.add(h if len(h) <= hash_length else h[:max_length])
        fully_contained = filtered
        if _return_partial:
            border = {h if len(h) <= hash_length else h[:max_length] for h in border}
    if _return_partial:
        return fully_contained, border
    return fully_contained


def _box_rings(w, s, e, n) -> np.ndarray:
    """(C,) bbox edges -> (C, 5, 2) closed rings, the exact corner order
    _split_and_filter's per-child ring used."""
    c = w.shape[0]
    out = np.empty((c, 5, 2), dtype=np.float64)
    out[:, 0, 0] = w
    out[:, 0, 1] = s
    out[:, 1, 0] = e
    out[:, 1, 1] = s
    out[:, 2, 0] = e
    out[:, 2, 1] = n
    out[:, 3, 0] = w
    out[:, 3, 1] = n
    out[:, 4, 0] = w
    out[:, 4, 1] = s
    return out


def _overlap_boxes_vs_ring(w, s, e, n, ring: np.ndarray) -> np.ndarray:
    """Vectorized ``geo.overlap(child_box_ring, ring)`` over C axis-
    aligned boxes — the same OR of checks (GeoGeometry.kt:894-925:
    mutual center containment, mutual vertex containment, edge
    crossing), order-free booleans, so the per-child short-circuit
    collapses to one batch evaluation per check.  Profiled: the scalar
    overlap loop was 70% of a 27 ms/polygon covering."""
    from .overlay import polygon_contains_batch

    c = w.shape[0]
    rings_c = _box_rings(w, s, e, n)
    rc_lon, rc_lat = geo.polygon_center(ring)
    # polygon_center of an axis-aligned closed box == its bbox midpoint
    hit = polygon_contains_batch(
        np.full(c, rc_lat), np.full(c, rc_lon), rings_c
    )
    hit |= geo.polygon_contains((s + n) / 2.0, (w + e) / 2.0, ring)
    # any polygon vertex inside a box (chunked: C x m point-in-box rows)
    m = ring.shape[0]
    budget = 1 << 21
    step = max(1, budget // max(m, 1))
    for cs in range(0, c, step):
        sel = slice(cs, min(cs + step, c))
        k = sel.stop - sel.start
        hit[sel] |= (
            polygon_contains_batch(
                np.tile(ring[:, 1], k),
                np.tile(ring[:, 0], k),
                np.repeat(rings_c[sel], m, axis=0),
            )
            .reshape(k, m)
            .any(axis=1)
        )
    # any box vertex inside the polygon (all 5 ring rows, like overlap)
    hit |= (
        geo.polygon_contains(
            rings_c[:, :, 1].ravel(), rings_c[:, :, 0].ravel(), ring
        )
        .reshape(c, 5)
        .any(axis=1)
    )
    # box edge x polygon edge crossings (chunked: C x 4 x (m-1) tensor)
    todo = np.flatnonzero(~hit)
    rx1 = ring[:-1, 0][None, None, :]
    ry1 = ring[:-1, 1][None, None, :]
    rx2 = ring[1:, 0][None, None, :]
    ry2 = ring[1:, 1][None, None, :]
    step = max(1, budget // max(4 * (m - 1), 1))
    for cs in range(0, todo.size, step):
        sel = todo[cs : cs + step]
        bx1 = rings_c[sel, :-1, 0][:, :, None]
        by1 = rings_c[sel, :-1, 1][:, :, None]
        bx2 = rings_c[sel, 1:, 0][:, :, None]
        by2 = rings_c[sel, 1:, 1][:, :, None]
        cross = geo.lines_cross_vec(bx1, by1, bx2, by2, rx1, ry1, rx2, ry2)
        hit[sel] = cross.any(axis=(1, 2))
    return hit


def _split_and_filter(
    ring: np.ndarray, fully_contained: set[str], partially_contained: set[str]
) -> set[str]:
    """Refine partial hashes into their 32 children. GeoHashUtils.kt:609-645.

    A child whose 4 bbox corners are all inside is candidate-full; else if
    its bbox ring overlaps the polygon it stays partial.  If all 32
    children are full the parent is kept whole (broadcast-size win).
    """
    still_partial: set[str] = set()
    parents = list(partially_contained)
    if not parents:
        return still_partial
    # ONE batch for the whole round: every parent's 32 children share
    # the decode, the corner ray-cast, and the overlap evaluation —
    # per-parent numpy-call constants were the cost once the per-child
    # loop was gone (168 parents -> 168 overlap calls -> 2 per round)
    subs = np.array([c for h in parents for c in gh.sub_hashes(h)])
    p = len(parents)
    w, s, e, n = gh.decode_bbox(subs)
    corner_lats = np.concatenate([n, n, s, s])  # NW, NE, SW, SE
    corner_lons = np.concatenate([w, e, w, e])
    all_in = (
        geo.polygon_contains(corner_lats, corner_lons, ring)
        .reshape(4, p * 32)
        .all(axis=0)
    )
    not_full = np.flatnonzero(~all_in)
    if not_full.size:
        ov = _overlap_boxes_vs_ring(
            w[not_full], s[not_full], e[not_full], n[not_full], ring
        )
        still_partial.update(subs[not_full[ov]].tolist())
    complete_parent = all_in.reshape(p, 32).all(axis=1)
    for k, h in enumerate(parents):
        if complete_parent[k]:
            fully_contained.add(h)
        else:
            block = all_in[k * 32 : (k + 1) * 32]
            fully_contained.update(subs[k * 32 : (k + 1) * 32][block].tolist())
    return still_partial


def geohashes_for_polygon(
    rings: list[np.ndarray],
    max_length: int | None = None,
    include_partial: bool = False,
) -> set[str]:
    """Cover outer ring then drop hashes interacting with holes.
    GeoHashUtils.kt:442-464."""
    outer = geohashes_for_linear_ring(rings[0], max_length, include_partial)
    if len(rings) == 1:
        return outer
    holes = [np.asarray(h, dtype=np.float64) for h in rings[1:]]
    hole_centers = [geo.polygon_center(h) for h in holes]
    kept = set()
    for h in outer:
        w, s, e, n = gh.decode_bbox_scalar(h)
        center_lat = (s + n) / 2
        center_lon = (w + e) / 2
        drop = any(
            geo.polygon_contains_scalar(center_lat, center_lon, hole) for hole in holes
        )
        drop = drop or any(
            s <= c[1] <= n and w <= c[0] <= e for c in hole_centers
        )
        drop = drop or any(
            ((hole[:, 1] >= s) & (hole[:, 1] <= n) & (hole[:, 0] >= w) & (hole[:, 0] <= e)).any()
            for hole in holes
        )
        if not drop:
            kept.add(h)
    return kept


def geohashes_for_multi_polygon(
    polygons: list[list[np.ndarray]],
    max_length: int | None = None,
    include_partial: bool = False,
) -> set[str]:
    """Union of per-polygon covers. GeoHashUtils.kt:466-478."""
    out: set[str] = set()
    for rings in polygons:
        out |= geohashes_for_polygon(rings, max_length, include_partial)
    return out


def geohashes_for_line(
    width: float,
    lat1: float,
    lon1: float,
    lat2: float,
    lon2: float,
    max_length: int | None = None,
) -> set[str]:
    """GeoHashUtils.kt:687-719."""
    if lat1 == lat2 and lon1 == lon2:
        return {str(gh.encode(lat1, lon1, DEFAULT_GEO_HASH_LENGTH)[0])}
    hash_length = max_length if max_length is not None else gh.suitable_hash_length(width, lat1, lon1)
    h1, b1 = gh.encode_with_bbox(lat1, lon1, hash_length)
    h2, b2 = gh.encode_with_bbox(lat2, lon2, hash_length)
    if h1 == h2:
        return {h1}
    ring = np.array(
        [
            [b1[0], b1[1]],
            [b1[2], b1[1]],
            [b2[2], b2[3]],
            [b2[0], b2[3]],
            [b1[0], b1[1]],
        ]
    )
    return geohashes_for_linear_ring(ring, max_length=hash_length)


def geohashes_for_path(hash_length: int, waypoints: np.ndarray) -> set[str]:
    """Union of per-segment covers. GeoHashUtils.kt:652-676."""
    waypoints = np.asarray(waypoints, dtype=np.float64)
    if waypoints.shape[0] < 2:
        raise ValueError("must have at least two way points on the path")
    out: set[str] = set()
    for i in range(1, waypoints.shape[0]):
        prev = waypoints[i - 1]
        cur = waypoints[i]
        out |= geohashes_for_line(float(hash_length), prev[1], prev[0], cur[1], cur[0])
    return out


def geohashes_for_circle(
    max_length: int | None,
    lat: float,
    lon: float,
    radius: float,
    include_partial: bool = False,
    segments: int = 20,
) -> set[str]:
    """circle2polygon then ring cover. GeoHashUtils.kt:829-843."""
    ring = geo.circle_to_polygon(segments, lat, lon, radius)
    return geohashes_for_linear_ring(ring, max_length, include_partial)


def cover_with_borders(
    rings: list[np.ndarray], max_length: int | None = None
) -> tuple[set[str], set[str]]:
    """Engine covering for the PIP join build side.

    Returns (interior_cells, border_cells): a point whose cell prefix is in
    interior_cells is inside the outer ring without any exact re-check
    (covering guarantee, GeoHashUtils.kt:485-492); a point in a border cell
    needs the exact hole-aware PIP test.  Holes always force the exact
    check, so when holes exist every interior cell that interacts with a
    hole is demoted to border.
    """
    full, partial = geohashes_for_linear_ring(
        rings[0], max_length=max_length, include_partial=False, _return_partial=True
    )
    # the fallback path (no fully contained hash) copies partials into
    # full — those are NOT interior-guaranteed, keep them as border too
    if full & partial:
        overlap_cells = full & partial
        full = full - overlap_cells
        partial = partial | overlap_cells
    if len(rings) > 1:
        holes = [np.asarray(h, dtype=np.float64) for h in rings[1:]]
        demoted = set()
        for h in full:
            w, s, e, n = gh.decode_bbox_scalar(h)
            cell_ring = np.array(
                [[w, s], [e, s], [e, n], [w, n], [w, s]]
            )
            if any(geo.overlap(cell_ring, hole) for hole in holes):
                demoted.add(h)
        full -= demoted
        partial |= demoted
    return full, partial
