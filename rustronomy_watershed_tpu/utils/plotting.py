"""Per-level PNG rendering of the label image.

Counterpart of the reference's ``plots`` cargo feature
(/root/reference/src/lib.rs:698-834 + src/plotting/color_maps.rs): 1:1-pixel
PNGs named ``ws_lvl{N}.png`` rendered through one of five colour maps
(grey_scale / viridis / magma / plasma / inferno).

The 256-entry MAGMA/INFERNO/PLASMA/VIRIDIS tables ship as committed data
(``colormap_tables.npz``, generated once from matplotlib — verified
bit-identical to the reference's hardcoded tables, which carry the same
CC0 mpl-colormaps data), so rendering needs no matplotlib and is faithful on
minimal installs.  Colour-map callables keep the reference's scalar signature
``cmap(count, min, max) -> (r, g, b)`` so users can pass custom maps to
``TransformBuilder.set_plot_colour_map``; a vectorised fast path is used when
rendering whole images.

Reference quirks replicated (documented, clamped where the reference would
panic): the intensity index is ``(255*count + min) / max`` (src/lib.rs:777),
and ``count <= min`` renders the NaN colour (black).
"""

from __future__ import annotations

import functools
import os

import numpy as np

NAN_COL = (0, 0, 0)


_TABLES_NPZ = os.path.join(os.path.dirname(__file__), "colormap_tables.npz")


@functools.lru_cache(maxsize=None)
def _table(name: str) -> np.ndarray:
    """256x3 float RGB table in [0, 1] (committed data, no matplotlib)."""
    if name == "grey_scale":
        g = np.linspace(0.0, 1.0, 256)
        return np.stack([g, g, g], axis=1)
    with np.load(_TABLES_NPZ) as z:
        return z[name]


def _index(count, mn, mx) -> int:
    # Reference formula (src/lib.rs:761-762): (255*count + min) / max, as
    # integer; clamped to the table instead of panicking at 256.
    if mx == 0:
        return 0
    return int(min(255, max(0, (255.0 * float(count) + float(mn)) / float(mx))))


def _make_scalar_cmap(name: str):
    def cmap(count, mn, mx):
        if count <= mn:
            return NAN_COL
        c = _table(name)[_index(count, mn, mx)]
        return tuple(int(v * 255.999) for v in c)

    cmap.__name__ = name
    cmap._table_name = name  # vectorised fast-path hint
    return cmap


grey_scale = _make_scalar_cmap("grey_scale")
viridis = _make_scalar_cmap("viridis")
magma = _make_scalar_cmap("magma")
plasma = _make_scalar_cmap("plasma")
inferno = _make_scalar_cmap("inferno")


def render_rgb(slice2d: np.ndarray, colour_map=viridis) -> np.ndarray:
    """(H, W, 3) uint8 rendering of a 2-D array through a colour map."""
    a = np.asarray(slice2d)
    mn, mx = float(a.min(initial=0)), float(a.max(initial=0))
    name = getattr(colour_map, "_table_name", None)
    if name is not None:
        # Vectorised path for the built-in maps.
        if mx == 0:
            idx = np.zeros(a.shape, dtype=np.int64)
        else:
            idx = np.clip((255.0 * a.astype(np.float64) + mn) / mx, 0, 255).astype(
                np.int64
            )
        rgb = (_table(name)[idx] * 255.999).astype(np.uint8)
        rgb[a <= mn] = NAN_COL
        return rgb
    # Generic scalar-callable path (custom user maps).
    out = np.empty(a.shape + (3,), dtype=np.uint8)
    for (y, x), v in np.ndenumerate(a):
        out[y, x] = colour_map(v, mn, mx)
    return out


def plot_slice(slice2d: np.ndarray, file_name: str, colour_map=viridis) -> None:
    """Write a 1:1-pixel PNG of ``slice2d`` (src/lib.rs:713-749)."""
    rgb = render_rgb(slice2d, colour_map)
    _write_png(file_name, rgb)


def _write_png(file_name: str, rgb: np.ndarray) -> None:
    try:
        from matplotlib.image import imsave

        imsave(file_name, rgb)
        return
    except Exception:
        pass
    # Dependency-free fallback: minimal PNG encoder (stdlib zlib).
    import struct
    import zlib

    h, w = rgb.shape[:2]
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(file_name, "wb") as f:
        f.write(png)
