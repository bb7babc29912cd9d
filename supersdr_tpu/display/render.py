"""Headless panadapter raster: spectrum scope + waterfall → RGB array.

Reproduces the data semantics of the reference renderer
(`display_stuff.plot_spectrum` utils_supersdr.py:1669-1691 — the scope is
the mean of the newest 15 waterfall rows; the waterfall blits color rows
through the palette) as pure numpy raster composition, writable to PNG.
"""

from __future__ import annotations

import numpy as np

from supersdr_tpu.display import colormap as cm


def render_waterfall(color_history: np.ndarray,
                     palette_name: str = "cutesdr") -> np.ndarray:
    """[rows, bins] 0..255 color values → [rows, bins, 3] uint8."""
    pal = cm.get_palette(palette_name)
    return cm.apply(pal, color_history)


def render_spectrum(color_history: np.ndarray, height: int = 150,
                    n_avg_rows: int = 15, filled: bool = True,
                    color=(200, 180, 0)) -> np.ndarray:
    """Scope trace raster from the newest rows of the waterfall history
    (utils:1678 mean-of-15)."""
    rows = np.asarray(color_history)[:n_avg_rows]
    trace = rows.mean(axis=0) / 255.0            # [bins] 0..1
    bins = trace.shape[0]
    img = np.zeros((height, bins, 3), np.uint8)
    y = ((1.0 - trace) * (height - 1)).astype(int)
    col = np.asarray(color, np.uint8)
    x = np.arange(bins)
    if filled:
        mask = np.arange(height)[:, None] >= y[None, :]
        img[mask] = col // 2
    img[y, x] = col
    return img


def render_panadapter(color_history: np.ndarray, spectrum_height: int = 150,
                      palette_name: str = "cutesdr",
                      tick_bins: list[int] | None = None) -> np.ndarray:
    """Full headless panadapter frame: scope on top, tick bar, waterfall."""
    wf = render_waterfall(color_history, palette_name)
    spec = render_spectrum(color_history, height=spectrum_height)
    bins = wf.shape[1]
    bar = np.zeros((8, bins, 3), np.uint8)
    bar[:] = (40, 40, 40)
    if tick_bins:
        for b in tick_bins:
            if 0 <= b < bins:
                bar[:, b] = (255, 255, 255)
    return np.concatenate([spec, bar, wf], axis=0)
