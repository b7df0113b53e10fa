"""Reference polygon fixtures (coordinates verbatim from the reference
test sources) used as the broadcast build side of joins, and as golden
test geometry.  FIXTURES.md §2.

All rings are [lon, lat], closed.
"""

from __future__ import annotations

import numpy as np

# test-fixture.kt:5-14 — Berlin landmarks big ring
BIG_RING = [
    [13.376599, 52.509515],  # potsDammerPlatz
    [13.377157, 52.516279],  # brandenBurgerGate
    [13.381921, 52.531188],  # naturkundeMuseum
    [13.412949, 52.532755],  # senefelderPlatz
    [13.410717, 52.503663],  # moritzPlatz
    [13.376599, 52.509515],
]

# test-fixture.kt:15 — small ring
SMALL_RING = [
    [13.401361, 52.529948],  # rosenthalerPlatz
    [13.38707, 52.525339],  # oranienburgerTor
    [13.3941763, 52.5298311],  # bergstr16Berlin
    [13.401361, 52.529948],
]

# GeoHashUtilsTest.kt:76-120 — concave Berlin polygon
CONCAVE_RING = [
    [13.402633666992188, 52.556785714011625],
    [13.402719497680664, 52.54713081557263],
    [13.41379165649414, 52.547078621160054],
    [13.413705825805664, 52.54968826575346],
    [13.405895233154297, 52.54927073304618],
    [13.40580940246582, 52.55459397751005],
    [13.413963317871094, 52.55433304920524],
    [13.413877487182617, 52.55683789687965],
    [13.402633666992188, 52.556785714011625],
]

# GeoGeometryMigratedTests.kt:75-80 — ±1° square around the origin
SAMPLE_SQUARE = [
    [1.0, 1.0],
    [1.0, -1.0],
    [-1.0, -1.0],
    [-1.0, 1.0],
    [1.0, 1.0],
]

# GeoHashUtilsTest.kt:505-518 — unit square with centered hole
UNIT_SQUARE = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]
UNIT_SQUARE_HOLE = [
    [0.25, 0.25],
    [0.75, 0.25],
    [0.75, 0.75],
    [0.25, 0.75],
    [0.25, 0.25],
]

# polygon_id -> list of rings (outer first); the standard broadcast set
POLYGONS: dict[str, list[list[list[float]]]] = {
    "berlin_big_ring": [BIG_RING],
    "berlin_small_ring": [SMALL_RING],
    "berlin_concave": [CONCAVE_RING],
}


def polygons_np(
    polygons: dict[str, list[list[list[float]]]] | None = None,
) -> dict[str, list[np.ndarray]]:
    src = POLYGONS if polygons is None else polygons
    return {
        pid: [np.asarray(r, dtype=np.float64) for r in rings]
        for pid, rings in src.items()
    }
