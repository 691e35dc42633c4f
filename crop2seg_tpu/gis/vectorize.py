"""Raster segments -> vector polygons + dependency-free writers.

Completes the reference's vector tail (prediction2polygon_layer + shapefile
export, /root/reference/src/helpers/postprocess.py:86-120 and the webapp's
shapefile caches) without GDAL: exact pixel-boundary polygons are traced by
crack following on the segment raster, then written as GeoJSON or as a
minimal ESRI Shapefile (.shp/.shx/.dbf, polygon type 5).

Coordinates are pixel corners mapped through an optional Affine, so the
polygons reproduce rasterio.features.shapes' geometry exactly.
"""
from __future__ import annotations

import json
import os
import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from crop2seg_tpu.gis.raster import Affine

Ring = List[Tuple[float, float]]


def _mask_rings(mask: np.ndarray) -> List[Ring]:
    """All boundary rings (outer + holes) of a binary mask, as pixel-corner
    coordinates (row, col). Crack-following: directed edges keep the interior
    on the LEFT, so outer rings come out counter-clockwise in (row, col)
    raster space and holes clockwise."""
    h, w = mask.shape
    pad = np.zeros((h + 2, w + 2), bool)
    pad[1:-1, 1:-1] = mask
    # directed edges: for each interior cell, emit edges on sides that face
    # outside; orientation keeps interior on the left.
    edges: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}

    def add(a, b):
        edges.setdefault(a, []).append(b)

    rs, cs = np.nonzero(pad)
    for r, c in zip(rs, cs):
        if not pad[r - 1, c]:   # open above: edge left->right along top
            add((r - 1, c - 1), (r - 1, c))
        if not pad[r + 1, c]:   # open below: edge right->left along bottom
            add((r, c), (r, c - 1))
        if not pad[r, c - 1]:   # open left: edge bottom->top along left side
            add((r, c - 1), (r - 1, c - 1))
        if not pad[r, c + 1]:   # open right: edge top->bottom along right
            add((r - 1, c), (r, c))

    rings: List[Ring] = []
    while edges:
        start = next(iter(edges))
        ring = [start]
        prev = None
        cur = start
        while True:
            outs = edges[cur]
            if len(outs) == 1:
                nxt = outs.pop()
            else:
                # corner with two choices: prefer the left turn relative to
                # the incoming direction (keeps rings separated at pinch
                # points)
                d = (cur[0] - prev[0], cur[1] - prev[1])
                left = (cur[0] - d[1], cur[1] + d[0])
                nxt = left if left in outs else outs[0]
                outs.remove(nxt)
            if not outs:
                del edges[cur]
            ring.append(nxt)
            prev, cur = cur, nxt
            if cur == start:
                break
        # collapse collinear points
        out: Ring = []
        for p in ring:
            if len(out) >= 2 and (
                    (out[-1][0] - out[-2][0]) * (p[1] - out[-1][1])
                    == (out[-1][1] - out[-2][1]) * (p[0] - out[-1][0])):
                out[-1] = p
            else:
                out.append(p)
        if len(out) >= 2 and out[0] == out[-1] and len(out) >= 4 and (
                (out[1][0] - out[0][0]) * (out[-1][1] - out[-2][1])
                == (out[1][1] - out[0][1]) * (out[-1][0] - out[-2][0])):
            out = out[1:-1] + [out[1]]
        rings.append(out)
    return rings


def _to_world(ring: Ring, affine: Optional[Affine]) -> Ring:
    if affine is None:
        return [(float(c), float(r)) for r, c in ring]  # (x=col, y=row)
    out = []
    for r, c in ring:
        x, y = affine.pixel_to_world(r, c)
        out.append((float(x), float(y)))
    return out


def segments_to_polygons(segments: np.ndarray, seg_class: np.ndarray,
                         affine: Optional[Affine] = None,
                         skip_background: bool = True) -> List[Dict]:
    """Segment raster (from gis.postprocess.polygonize) -> list of
    {'value', 'segment', 'rings'} features; rings[0] is the outer boundary.
    """
    from scipy import ndimage

    feats = []
    # one-pass bounding boxes: avoids O(n_segments * area) full scans
    boxes = ndimage.find_objects(segments)
    for seg_id, box in enumerate(boxes, start=1):
        if box is None:
            continue
        value = int(seg_class[seg_id])
        if skip_background and value == 0:
            continue
        r0, c0 = box[0].start, box[1].start
        sub = segments[box] == seg_id
        rings = _mask_rings(sub)
        rings = [[(r + r0, c + c0) for r, c in ring] for ring in rings]
        feats.append({
            "value": value, "segment": seg_id,
            "rings": [_to_world(ring, affine) for ring in rings],
        })
    return feats


def polygons_to_geojson(features: List[Dict], path: Optional[str] = None,
                        crs: Optional[int] = None) -> Dict:
    out = {
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature",
            "properties": {"value": f["value"], "segment": f["segment"]},
            "geometry": {"type": "Polygon",
                         "coordinates": [[list(p) for p in ring]
                                         for ring in f["rings"]]},
        } for f in features],
    }
    if crs is not None:
        out["crs"] = {"type": "name",
                      "properties": {"name": f"EPSG:{crs}"}}
    if path:
        with open(path, "w") as fh:
            json.dump(out, fh)
    return out


def write_shapefile(path: str, features: List[Dict]) -> Tuple[str, str, str]:
    """Minimal ESRI Shapefile writer (polygon type 5) + .shx + .dbf with a
    numeric 'value' field. ESRI wants outer rings clockwise in (x, y);
    rings from the tracer are reversed as needed by signed area."""
    base = os.path.splitext(path)[0]

    def ring_oriented(ring, clockwise):
        area2 = sum((x2 - x1) * (y2 + y1)
                    for (x1, y1), (x2, y2) in zip(ring, ring[1:]))
        is_cw = area2 > 0
        return ring if is_cw == clockwise else ring[::-1]

    records = []
    for f in features:
        rings = [ring_oriented(list(r), clockwise=(i == 0))
                 for i, r in enumerate(f["rings"])]
        rings = [r if r[0] == r[-1] else r + [r[0]] for r in rings]
        pts = [p for r in rings for p in r]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        bbox = (min(xs), min(ys), max(xs), max(ys))
        parts = []
        off = 0
        for r in rings:
            parts.append(off)
            off += len(r)
        content = struct.pack("<i", 5)
        content += struct.pack("<4d", *bbox)
        content += struct.pack("<2i", len(rings), len(pts))
        content += b"".join(struct.pack("<i", p) for p in parts)
        content += b"".join(struct.pack("<2d", x, y) for x, y in pts)
        records.append((content, bbox, f["value"]))

    if records:
        gxmin = min(r[1][0] for r in records)
        gymin = min(r[1][1] for r in records)
        gxmax = max(r[1][2] for r in records)
        gymax = max(r[1][3] for r in records)
    else:
        gxmin = gymin = gxmax = gymax = 0.0

    shp_records = b""
    shx_records = b""
    offset = 50  # in 16-bit words
    for i, (content, _, _) in enumerate(records):
        length = len(content) // 2
        shp_records += struct.pack(">2i", i + 1, length) + content
        shx_records += struct.pack(">2i", offset, length)
        offset += 4 + length

    def header(file_words):
        h = struct.pack(">i", 9994) + b"\x00" * 20
        h += struct.pack(">i", file_words)
        h += struct.pack("<2i", 1000, 5)
        h += struct.pack("<4d", gxmin, gymin, gxmax, gymax)
        h += struct.pack("<4d", 0, 0, 0, 0)
        return h

    shp = base + ".shp"
    with open(shp, "wb") as fh:
        fh.write(header(50 + len(shp_records) // 2) + shp_records)
    shx = base + ".shx"
    with open(shx, "wb") as fh:
        fh.write(header(50 + len(shx_records) // 2) + shx_records)

    # minimal dbf: one numeric field 'value'
    dbf = base + ".dbf"
    n = len(records)
    field = b"value" + b"\x00" * 6 + b"N" + b"\x00" * 4 + bytes([10, 0]) + b"\x00" * 14
    hdr = struct.pack("<B3BIHH", 0x03, 26, 8, 16, n, 33 + 32, 11) + b"\x00" * 20
    body = hdr + field + b"\x0d"
    for _, _, value in records:
        body += b" " + str(int(value)).rjust(10).encode()
    body += b"\x1a"
    with open(dbf, "wb") as fh:
        fh.write(body)
    return shp, shx, dbf
