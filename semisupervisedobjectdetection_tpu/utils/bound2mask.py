"""Polygon annotations -> binary PNG masks.

Reference capability: `main_other/bound2mask.py` converts labelme-style
JSON polygon annotations into per-image mask PNGs via point-in-polygon
tests (`bound2mask.py:36-45`). Rebuilt with a vectorized ray-casting
rasterizer (no matplotlib dependency) and an importable API + CLI:

    python -m semisupervisedobjectdetection_tpu.utils.bound2mask <folder>
"""

from __future__ import annotations

import json
import os
from typing import Sequence, Tuple

import numpy as np


def rasterize_polygon(points: Sequence[Tuple[float, float]],
                      shape: Tuple[int, int]) -> np.ndarray:
    """Even-odd ray casting: True inside the polygon. `points` are (x, y)
    vertices (labelme convention); `shape` is (H, W)."""
    pts = np.asarray(points, np.float64)
    h, w = shape
    yy, xx = np.mgrid[0:h, 0:w]
    inside = np.zeros((h, w), bool)
    n = len(pts)
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        cond = (y1 > yy) != (y2 > yy)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (yy - y1) / (y2 - y1) + x1
        inside ^= cond & (xx < xint)
    return inside


def labelme_to_mask(json_path: str, shape: Tuple[int, int]) -> np.ndarray:
    """All polygons of a labelme JSON rasterized into one {0,1} mask."""
    with open(json_path) as f:
        data = json.load(f)
    mask = np.zeros(shape, np.uint8)
    for poly in data.get("shapes", []):
        mask[rasterize_polygon(poly["points"], shape)] = 1
    return mask


def convert_folder(folder: str, suffix: str = "_mask.png") -> int:
    """Convert every image+JSON pair in a folder (ref loop `:16-53`).
    Returns the number of masks written."""
    from PIL import Image

    count = 0
    for name in sorted(os.listdir(folder)):
        if not name.endswith((".png", ".jpg")):
            continue
        stem = name.rsplit(".", 1)[0]
        json_path = os.path.join(folder, stem + ".json")
        if not os.path.exists(json_path):
            continue
        img = np.asarray(Image.open(os.path.join(folder, name)).convert(
            "L"))
        mask = labelme_to_mask(json_path, img.shape[:2])
        Image.fromarray(mask * 255).save(
            os.path.join(folder, stem + suffix))
        count += 1
    return count


if __name__ == "__main__":
    import sys

    n = convert_folder(sys.argv[1])
    print(f"wrote {n} masks")
