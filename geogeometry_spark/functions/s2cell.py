"""Native Spark Column builders for the S2 cell index + DuckDB SQL twin.

``s2_cell_id`` runs the whole encode (sphere -> cube face -> quadratic
ST -> 2^30 leaf grid -> Hilbert position) JVM-side: trig/case
expressions are plain codegen'd Columns, and the 8-step Hilbert
interleave is ONE ``F.aggregate`` fold over ``sequence(7,0,-1)`` with
the 1024-entry position lookup table as a constant array literal (a
single plan node, no 4^8 expression-subtree blowup, no Python workers).

HOT-PATH WARNING (measured, 5M rows, local[32]): higher-order functions
are *interpreted* per element, so this fold runs at 0.017M rows/s vs
8.4M rows/s for the Arrow-batched kernel UDF (functions/udfs.py
``s2_cell_udf``) and 7.4M rows/s for the native Morton geohash.
Operators therefore default to ``s2_cell_udf``; use ``s2_cell_id`` for
small relations, plans that must stay Python-free, and oracle-parity
tests.  The id ALGEBRA below (parent/range/sortable/token) is cheap
native bit math — always preferred on columns that already hold ids.

Ids follow the Java/Go-port convention: the uint64 cell id is stored
two's-complement-wrapped in a LongType (faces 4-5 negative).
``s2_sortable`` flips the sign bit so signed ORDER BY / BETWEEN give
unsigned cell order — the range-scan predicate works on any face.

``s2_encode_oracle`` emits a chained-CTE DuckDB query computing the
identical arithmetic (HUGEINT for the unsigned wrap; the Hilbert steps
are unrolled with materialized intermediate columns, so nothing
re-evaluates the trig tree).

Semantics source: the published S2 cell-id algorithm (s2geometry.io);
kernel twin with the same tables: kernels/s2.py.
"""

from __future__ import annotations

from functools import lru_cache as _lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..kernels.s2 import LOOKUP_POS, MAX_LEVEL

_LONG_SIGN = -(1 << 63)


@_lru_cache(maxsize=1)
def _lookup_table() -> Column:
    """1024-entry Hilbert lookup as one constant array plan node."""
    csv = ",".join(str(int(v)) for v in LOOKUP_POS)
    return F.split(F.lit(csv), ",").cast("array<bigint>")


def _face_uv(lat: Column, lon: Column) -> tuple[Column, Column, Column]:
    phi = F.radians(lat)
    theta = F.radians(lon)
    cosphi = F.cos(phi)
    x = cosphi * F.cos(theta)
    y = cosphi * F.sin(theta)
    z = F.sin(phi)
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    face0 = F.when(ax > ay, F.when(ax > az, 0).otherwise(2)).otherwise(
        F.when(ay > az, 1).otherwise(2)
    )
    comp = F.when(face0 == 0, x).when(face0 == 1, y).otherwise(z)
    face = (face0 + F.when(comp < 0.0, 3).otherwise(0)).cast("long")
    u = (
        F.when(face == 0, y / x)
        .when(face == 1, -x / y)
        .when(face == 2, -x / z)
        .when(face == 3, z / x)
        .when(face == 4, z / y)
        .otherwise(-y / z)
    )
    v = (
        F.when(face == 0, z / x)
        .when(face == 1, z / y)
        .when(face == 2, -y / z)
        .when(face == 3, y / x)
        .when(face == 4, -x / y)
        .otherwise(-x / z)
    )
    return face, u, v


def _ij(w: Column) -> Column:
    st = F.when(w >= 0.0, 0.5 * F.sqrt(1.0 + 3.0 * w)).otherwise(
        1.0 - 0.5 * F.sqrt(1.0 - 3.0 * w)
    )
    raw = F.floor(st * F.lit(float(1 << MAX_LEVEL))).cast("long")
    return F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit((1 << MAX_LEVEL) - 1).cast("long"), raw),
    )


def s2_cell_id(lat: Column, lon: Column, level: int = MAX_LEVEL) -> Column:
    """S2 cell id of (lat, lon) degrees at ``level`` — native, no UDF."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    face, u, v = _face_uv(lat, lon)
    i, j = _ij(u), _ij(v)
    lut = _lookup_table()
    init = F.struct(
        F.lit(0).cast("long").alias("n"),
        face.bitwiseAND(F.lit(1)).alias("bits"),
    )

    def step(acc: Column, k: Column) -> Column:
        i_nib = F.call_function(
            "shiftright", i, (k * 4).cast("int")
        ).bitwiseAND(F.lit(15))
        j_nib = F.call_function(
            "shiftright", j, (k * 4).cast("int")
        ).bitwiseAND(F.lit(15))
        key = i_nib * 64 + j_nib * 4 + acc["bits"]
        lk = F.element_at(lut, (key + 1).cast("int"))
        n2 = acc["n"].bitwiseOR(
            F.call_function(
                "shiftleft", F.shiftright(lk, 2), (k * 8).cast("int")
            )
        )
        return F.struct(n2.alias("n"), lk.bitwiseAND(F.lit(3)).alias("bits"))

    folded = F.aggregate(F.sequence(F.lit(7), F.lit(0), F.lit(-1)), init, step)
    leaf = (
        F.shiftleft(face, 61)
        .bitwiseOR(F.shiftleft(folded["n"], 1))
        .bitwiseOR(F.lit(1))
    )
    if level < MAX_LEVEL:
        lsb = 1 << (2 * (MAX_LEVEL - level))
        leaf = leaf.bitwiseAND(F.lit(-lsb)).bitwiseOR(F.lit(lsb))
    # NULL/NaN/±Inf coords -> NULL id (Java casts NaN to 0L and carries
    # Inf through trig to NaN, either way fabricating a cell) — same
    # quarantine posture as udfs.s2_cell_udf (np.isfinite there)
    inf = float("inf")
    valid = (
        lat.isNotNull()
        & lon.isNotNull()
        & ~F.isnan(lat)
        & ~F.isnan(lon)
        & (F.abs(lat) != F.lit(inf))
        & (F.abs(lon) != F.lit(inf))
    )
    return F.when(valid, leaf)


def s2_parent(cell: Column, level: int) -> Column:
    """Ancestor id at ``level`` (caller ensures level <= cell level)."""
    lsb = 1 << (2 * (MAX_LEVEL - level))
    return cell.bitwiseAND(F.lit(-lsb)).bitwiseOR(F.lit(lsb))


def s2_range_min(cell: Column, level: int) -> Column:
    """Smallest leaf id under a ``level`` cell (level known statically)."""
    return cell - F.lit((1 << (2 * (MAX_LEVEL - level))) - 1)


def s2_range_max(cell: Column, level: int) -> Column:
    return cell + F.lit((1 << (2 * (MAX_LEVEL - level))) - 1)


def s2_sortable(cell: Column) -> Column:
    """Sign-bit flip: signed order == unsigned cell order."""
    return cell.bitwiseXOR(F.lit(_LONG_SIGN))


def s2_token(cell: Column) -> Column:
    """Canonical hex token: the 16-nibble zero-padded hex of the uint64
    with trailing zeros stripped (hex() drops leading zeros — face-0
    ids can start with nibble 0 — so re-pad before stripping).  The
    sentinel id 0 renders as "X", matching the kernel twin."""
    return F.when(cell == 0, F.lit("X")).otherwise(
        F.regexp_replace(F.lpad(F.lower(F.hex(cell)), 16, "0"), "0+$", "")
    )


# --------------------------------------------------------------------------
# DuckDB twin
# --------------------------------------------------------------------------

def s2_encode_oracle(
    coord_subq: str,
    level: int = MAX_LEVEL,
    id_alias: str = "s2_id",
    extra_cols: str = "doc_id",
    where: str | None = None,
) -> str:
    """Full DuckDB query computing the same cell ids over ``coord_subq``
    (which must expose ``lat``/``lon`` plus ``extra_cols``).

    Identical float64 op order as :func:`s2_cell_id`; the Hilbert fold is
    unrolled into 8 chained CTEs with materialized (n, b) columns; the
    unsigned 64-bit wrap runs in HUGEINT and is brought back to BIGINT
    two's complement at the end.
    """
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    lut = "[" + ",".join(str(int(v)) for v in LOOKUP_POS) + "]"
    half = 1 << MAX_LEVEL
    steps = []
    prev_n, prev_b = "0::HUGEINT", "(face & 1)"
    prev = "c7"
    for k in range(7, -1, -1):
        lk = (
            f"t[CAST(((i >> {4 * k}) & 15) * 64 + ((j >> {4 * k}) & 15) * 4 "
            f"+ {prev_b} + 1 AS INT)]"
        )
        steps.append(
            f"h{k} AS (SELECT *, {prev_n} + (({lk} >> 2)::HUGEINT * "
            f"{1 << (8 * k)}::HUGEINT) AS n{k}, "
            f"{lk} & 3 AS b{k} FROM {prev})"
        )
        prev_n, prev_b, prev = f"n{k}", f"b{k}", f"h{k}"
    # face << 61 == face * 2^61; disjoint bit ranges make + equal to OR
    fh = (
        "(face::HUGEINT * 2305843009213693952::HUGEINT) "
        "+ (n0 * 2::HUGEINT) + 1::HUGEINT"
    )
    if level < MAX_LEVEL:
        lsb = 1 << (2 * (MAX_LEVEL - level))
        fh = f"(({fh}) - (({fh}) % {2 * lsb}::HUGEINT) + {lsb}::HUGEINT)"
    wrapped = (
        f"CAST(CASE WHEN ({fh}) >= 9223372036854775808::HUGEINT "
        f"THEN ({fh}) - 18446744073709551616::HUGEINT ELSE ({fh}) END AS BIGINT)"
    )
    where_sql = f" WHERE {where}" if where else ""
    return (
        f"WITH lut AS (SELECT {lut}::BIGINT[] AS t), "
        f"c0 AS (SELECT {extra_cols}, lat, lon, t FROM {coord_subq} CROSS JOIN lut), "
        "c1 AS (SELECT *, radians(lat) AS phi, radians(lon) AS theta FROM c0), "
        "c2 AS (SELECT *, cos(phi) * cos(theta) AS x, "
        "cos(phi) * sin(theta) AS y, sin(phi) AS z FROM c1), "
        "c3 AS (SELECT *, CASE WHEN abs(x) > abs(y) THEN "
        "(CASE WHEN abs(x) > abs(z) THEN 0 ELSE 2 END) ELSE "
        "(CASE WHEN abs(y) > abs(z) THEN 1 ELSE 2 END) END AS face0 FROM c2), "
        "c4 AS (SELECT *, face0 + CASE WHEN "
        "(CASE WHEN face0 = 0 THEN x WHEN face0 = 1 THEN y ELSE z END) < 0.0 "
        "THEN 3 ELSE 0 END AS face FROM c3), "
        "c5 AS (SELECT *, "
        "CASE WHEN face = 0 THEN y / x WHEN face = 1 THEN -x / y "
        "WHEN face = 2 THEN -x / z WHEN face = 3 THEN z / x "
        "WHEN face = 4 THEN z / y ELSE -y / z END AS u, "
        "CASE WHEN face = 0 THEN z / x WHEN face = 1 THEN z / y "
        "WHEN face = 2 THEN -y / z WHEN face = 3 THEN y / x "
        "WHEN face = 4 THEN -x / y ELSE -x / z END AS v FROM c4), "
        "c6 AS (SELECT *, "
        "CASE WHEN u >= 0.0 THEN 0.5 * sqrt(1.0 + 3.0 * u) "
        "ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * u) END AS s, "
        "CASE WHEN v >= 0.0 THEN 0.5 * sqrt(1.0 + 3.0 * v) "
        "ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * v) END AS tt FROM c5), "
        "c7 AS (SELECT *, "
        f"GREATEST(0, LEAST({half - 1}, CAST(floor(s * {float(half)}) AS BIGINT))) AS i, "
        f"GREATEST(0, LEAST({half - 1}, CAST(floor(tt * {float(half)}) AS BIGINT))) AS j "
        "FROM c6), "
        + ", ".join(steps)
        + f" SELECT {extra_cols}, {wrapped} AS {id_alias} FROM h0{where_sql}"
    )
