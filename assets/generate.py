"""Generate synthetic demo images for the quickstart (`assets/README.md`).

The reference's demo flow runs its released KBR model over real photos in
`assets/{slowtv,syns}` (ref `api/quickstart/run.py:118` default img-dir).
Those photos are release artifacts; this generator creates stand-ins with
real depth structure — a perspective-projected textured ground plane, a
horizon sky, and frontal boxes at staggered distances — so the quickstart
demo is runnable out of the box with zero downloads. One scene per
reference category (driving / natural / underwater palettes).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

OUT = Path(__file__).resolve().parent / 'demo'
W, H = 640, 384

PALETTES = {
    'driving': {'sky': (0.55, 0.70, 0.85), 'ground': (0.35, 0.33, 0.32),
                'boxes': [(0.7, 0.2, 0.2), (0.2, 0.3, 0.7), (0.8, 0.7, 0.2)]},
    'natural': {'sky': (0.60, 0.75, 0.90), 'ground': (0.25, 0.45, 0.20),
                'boxes': [(0.35, 0.25, 0.15), (0.45, 0.35, 0.20), (0.30, 0.40, 0.15)]},
    'underwater': {'sky': (0.05, 0.25, 0.40), 'ground': (0.70, 0.65, 0.45),
                   'boxes': [(0.80, 0.45, 0.30), (0.25, 0.55, 0.50), (0.60, 0.60, 0.35)]},
}


def make_scene(kind: str, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    pal = PALETTES[kind]
    img = np.zeros((H, W, 3), np.float32)
    horizon = H * (0.40 + 0.06 * rng.random())

    # Sky: vertical gradient + soft noise.
    ys = np.arange(H, dtype=np.float32)[:, None]
    t = np.clip(ys / max(horizon, 1), 0, 1)
    for c, v in enumerate(pal['sky']):
        img[..., c] = v * (0.75 + 0.25 * t)

    # Ground plane: depth z ~ 1/(y - horizon); texture in WORLD coords so
    # the checker pitch shrinks with distance (real perspective cue).
    gy = ys[int(horizon):] - horizon
    z = H * 0.5 / np.maximum(gy, 1.0)                      # (h_g, 1) depth
    xs = (np.arange(W, dtype=np.float32)[None] - W / 2)
    wx = xs * z / (0.6 * W)                                # world x
    checker = ((np.floor(wx * 2) + np.floor(z * 2)) % 2)
    shade = 1.0 / (1.0 + 0.25 * z)                         # distance haze
    for c, v in enumerate(pal['ground']):
        img[int(horizon):, :, c] = (
            v * (0.7 + 0.3 * checker) * shade
            + np.asarray(pal['sky'][c], np.float32) * (1 - shade))

    # Boxes: frontal rectangles standing on the ground at staggered depths.
    for color in pal['boxes']:
        z0 = 2.0 + 8.0 * rng.random()
        yb = int(horizon + H * 0.5 / z0)                   # base row on plane
        hgt = int(H * 1.2 / z0)
        wdt = int(W * 0.25 / z0)
        x0 = rng.integers(0, max(W - wdt, 1))
        tex = 0.85 + 0.15 * rng.random((max(hgt, 1), max(wdt, 1), 1)).astype(np.float32)
        y1, y0c = min(yb, H), max(min(yb, H) - hgt, 0)
        patch = np.asarray(color, np.float32) * tex[:y1 - y0c]
        img[y0c:y1, x0:x0 + wdt] = patch[:, :min(wdt, W - x0)]

    img += 0.02 * rng.standard_normal(img.shape).astype(np.float32)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def generate(out: Path = OUT) -> list:
    from PIL import Image
    out.mkdir(parents=True, exist_ok=True)
    files = []
    for kind in PALETTES:
        for i in range(2):
            f = out / f'{i:02d}_{kind}.png'
            Image.fromarray(make_scene(kind, seed=7 * i + hash(kind) % 100)).save(f)
            files.append(f)
    return files


if __name__ == '__main__':
    for f in generate():
        print(f)
