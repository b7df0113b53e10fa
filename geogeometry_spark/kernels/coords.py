"""Coordinate extraction from free text — the span -> geometry bridge.

Reference: /root/reference/src/commonMain/kotlin/com/jillesvangurp/geo/GeoGeometry.kt:1517-1541
(latPattern / lonPattern / latLonRegex with lookaround guards;
parseCoordinate; findAllCoordinates).  Patterns are verbatim; Python's re
supports the same lookbehind/lookahead as Kotlin's (Java) regex.
"""

from __future__ import annotations

import re

LAT_PATTERN = r"(?:[+-])?(?:90(?:(?:\.0{1,6})?)|(?:[1-8][0-9]|[0-9])(?:(?:\.[0-9]{1,6})?))"
LON_PATTERN = r"(?:\+|-)?(?:180(?:(?:\.0{1,6})?)|(?:1[0-7][0-9]|[1-9][0-9]|[0-9])(?:(?:\.[0-9]{1,6})?))"
LATLON_REGEX = re.compile(
    rf"(?<![0-9.])\s*({LAT_PATTERN})\s*,\s*({LON_PATTERN})\s*(?![0-9.])"
)
# Same pattern for Spark's Java regex engine (regexp_extract_all) — Java
# and Python share this syntax, so the string is reusable as-is.
LATLON_REGEX_JAVA = (
    rf"(?<![0-9.])\s*({LAT_PATTERN})\s*,\s*({LON_PATTERN})\s*(?![0-9.])"
)


def is_valid_coordinate(text: str) -> bool:
    """Full-match test. GeoGeometry.kt:1521-1523."""
    return LATLON_REGEX.fullmatch(text) is not None


def parse_coordinate(text: str) -> tuple[float, float] | None:
    """Strict parse -> (lon, lat). GeoGeometry.kt:1525-1531."""
    m = LATLON_REGEX.fullmatch(text)
    if m is None:
        return None
    return float(m.group(2)), float(m.group(1))


def find_all_coordinates(text: str) -> list[tuple[float, float]]:
    """All (lon, lat) occurrences. GeoGeometry.kt:1533-1541."""
    out = []
    for m in LATLON_REGEX.finditer(text):
        try:
            lat = float(m.group(1))
            lon = float(m.group(2))
        except ValueError:  # pragma: no cover - regex guarantees floats
            continue
        out.append((lon, lat))
    return out
