"""rgba image layers for plot rendering.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/image.py
(:17-181): turn binned grids into rgba layers (monochrome/polychrome
colormapping), composit layer stacks with premultiplied-alpha blend modes,
and encode to PIL/PNG/data-URLs for the viz/jupyter ring.  Pure numpy math;
PIL only at the encode boundary.
"""

from __future__ import annotations

import base64
import io

import numpy as np

modes = ["multiply", "screen", "lighten", "darken"]


def rgba_2_pil(rgba):
    """float [H, W, 4] in [0,1] or uint8 → PIL image (reference: :17)."""
    import PIL.Image
    rgba = np.asarray(rgba)
    if rgba.dtype != np.uint8:
        rgba = (np.clip(rgba, 0, 1) * 255).astype(np.uint8)
    return PIL.Image.frombuffer("RGBA", rgba.shape[:2][::-1], rgba.tobytes(), "raw")


def pil_2_data(im, format="png"):
    """PIL image → encoded bytes (reference: :24)."""
    with io.BytesIO() as f:
        im.save(f, format)
        return f.getvalue()


def rgba_to_url(rgba, format="png"):
    """data-url for embedding in widgets/notebooks (reference: :33)."""
    data = pil_2_data(rgba_2_pil(rgba), format=format)
    return "data:image/%s;base64," % format + base64.b64encode(data).decode("ascii")


def background(shape, color="white", alpha=1, bit8=True):
    """Solid rgba layer (reference: :61)."""
    rgba = np.zeros(tuple(shape) + (4,), dtype=np.float64)
    rgba[..., :3] = _to_rgb(color)
    rgba[..., 3] = alpha
    if bit8:
        return (np.clip(rgba, 0, 1) * 255).astype(np.uint8)
    return rgba


def _to_rgb(color):
    import matplotlib.colors
    return matplotlib.colors.to_rgb(color)


def _blend_op(mode, a, b):
    if mode == "multiply":
        return a * b
    if mode == "screen":
        return a + b - a * b
    if mode == "lighten":
        return np.maximum(a, b)
    if mode == "darken":
        return np.minimum(a, b)
    raise ValueError(f"unknown blend mode {mode!r}; pick from {modes}")


def blend(image_list, blend_mode="multiply"):
    """Composit layers bottom→top with premultiplied-alpha blending
    (reference: :81-126).  Layers are float [H, W, 4] in [0,1] or uint8."""
    layers = [np.clip(np.asarray(im, dtype=np.float64) / (255 if np.asarray(im).dtype == np.uint8 else 1), 0, 1)
              for im in image_list]
    out = layers[0]
    for layer in layers[1:]:
        a_dst, a_src = out[..., 3:4], layer[..., 3:4]
        blended = _blend_op(blend_mode, out[..., :3], layer[..., :3])
        # source-over with the blend result weighted by both alphas
        rgb = (1 - a_src) * out[..., :3] + a_src * ((1 - a_dst) * layer[..., :3] + a_dst * blended)
        alpha = a_src + a_dst * (1 - a_src)
        out = np.concatenate([rgb, alpha], axis=-1)
    return np.clip(out, 0, 1)


def fade(image_list, opacity=0.5, blend_mode="multiply"):
    """Stack layers with geometrically fading opacity — the reference's
    selection-history display (:71)."""
    faded = []
    n = len(image_list)
    for i, im in enumerate(image_list):
        im = np.asarray(im, dtype=np.float64)
        if im.dtype == np.uint8:
            im = im / 255
        im = im.copy()
        im[..., 3] = im[..., 3] * opacity ** (n - 1 - i)
        faded.append(im)
    return blend(faded, blend_mode=blend_mode)


def monochrome(I, color, vmin=None, vmax=None):
    """Intensity grid → single-color rgba with intensity as alpha
    (reference: :129)."""
    I = np.asarray(I, dtype=np.float64)
    vmin = np.nanmin(I) if vmin is None else vmin
    vmax = np.nanmax(I) if vmax is None else vmax
    with np.errstate(invalid="ignore", divide="ignore"):
        norm = (I - vmin) / (vmax - vmin) if vmax != vmin else np.zeros_like(I)
    norm = np.nan_to_num(np.clip(norm, 0, 1))
    rgba = np.zeros(I.shape + (4,), dtype=np.float64)
    rgba[..., :3] = _to_rgb(color)
    rgba[..., 3] = norm
    return rgba


def polychrome(I, colors, vmin=None, vmax=None, axis=-1):
    """Stacked intensity grids (e.g. one per selection) → blended rgba, one
    color per slice (reference: :153)."""
    I = np.asarray(I, dtype=np.float64)
    I = np.moveaxis(I, axis, 0)
    layers = [monochrome(sub, color, vmin=vmin, vmax=vmax)
              for sub, color in zip(I, colors)]
    return blend(layers, blend_mode="screen")


def colormap(I, cmap="viridis", vmin=None, vmax=None):
    """Intensity grid → matplotlib-colormapped rgba."""
    import matplotlib
    I = np.asarray(I, dtype=np.float64)
    vmin = np.nanmin(I) if vmin is None else vmin
    vmax = np.nanmax(I) if vmax is None else vmax
    with np.errstate(invalid="ignore", divide="ignore"):
        norm = (I - vmin) / (vmax - vmin) if vmax != vmin else np.zeros_like(I)
    norm = np.nan_to_num(np.clip(norm, 0, 1))
    return matplotlib.colormaps[cmap](norm)
