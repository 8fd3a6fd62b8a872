"""Geotag extraction: text → list[(lat, lon)].

Engine analogue of the reference's geometry point visitor
``item.geoShape().visitPoints(...)`` (src/OscarSgIndex.cpp:105,122):
there every OSM item yields a stream of points; here every web page
yields the coordinates mentioned in its extracted text.

Recognized patterns (FIXTURES.md §1 contract):
  - ``geo:48.7758,9.1829``           (RFC-5870-style geo URI prefix)
  - ``(lat 48.7758, lon 9.1829)``    (prose coordinate pair)

Points are returned in order of appearance.  Out-of-range coordinates
(|lat| > 90, |lon| > 180) are dropped — the analogue of the reference's
invalid-cell warning path (src/OscarSgIndex.cpp:150-155).
"""

from __future__ import annotations

import re

_NUM = r"-?\d{1,3}\.\d+"
GEOTAG_RE = re.compile(
    rf"geo:({_NUM}),({_NUM})|\(lat ({_NUM}), lon ({_NUM})\)"
)


def extract_geotags(text: str) -> list[tuple[float, float]]:
    out: list[tuple[float, float]] = []
    if not text:
        return out
    for m in GEOTAG_RE.finditer(text):
        if m.group(1) is not None:
            lat, lon = float(m.group(1)), float(m.group(2))
        else:
            lat, lon = float(m.group(3)), float(m.group(4))
        if -90.0 <= lat <= 90.0 and -180.0 <= lon <= 180.0:
            out.append((lat, lon))
    return out
