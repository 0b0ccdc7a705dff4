"""Grid-memory visualization (debug scaffolding the reference left commented
out: JPEG dumps of the map, Policy_ViewSelection_GridMap.py:700-725)."""

from __future__ import annotations

import numpy as np


def grid_occupancy_image(cell_mask: np.ndarray, cell_scores=None,
                         grid_w: int = 14, scale: int = 16) -> np.ndarray:
    """(196,) occupancy (+ optional per-cell scores) -> (H, W, 3) uint8 image.

    Occupied cells render grey (or a red heat ramp when scores are given);
    the agent cell (center of the egocentric window) is marked blue."""
    g = grid_w
    img = np.zeros((g, g, 3), np.uint8)
    occ = np.asarray(cell_mask).reshape(g, g).astype(bool)
    img[occ] = (160, 160, 160)
    if cell_scores is not None:
        s = np.asarray(cell_scores, np.float64).reshape(g, g)
        s = np.where(occ, s, np.nan)
        if np.isfinite(s).any():
            lo, hi = np.nanmin(s), np.nanmax(s)
            norm = np.nan_to_num((s - lo) / (hi - lo + 1e-9))
            heat = (norm * 255).astype(np.uint8)
            img[occ, 0] = heat[occ]
            img[occ, 1] = 60
            img[occ, 2] = 60
    c = g // 2
    img[c - 1: c + 1, c - 1: c + 1] = (40, 90, 220)
    return np.kron(img, np.ones((scale, scale, 1), np.uint8))


def save_grid_png(path: str, cell_mask, cell_scores=None) -> None:
    img = grid_occupancy_image(cell_mask, cell_scores)
    try:
        from PIL import Image

        Image.fromarray(img).save(path)
    except ImportError:  # minimal PNG writer fallback
        import struct
        import zlib

        h, w, _ = img.shape
        raw = b"".join(b"\x00" + img[i].tobytes() for i in range(h))
        def chunk(tag, data):
            c = tag + data
            return struct.pack(">I", len(data)) + c + struct.pack(
                ">I", zlib.crc32(c))
        png = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
        with open(path, "wb") as f:
            f.write(png)
