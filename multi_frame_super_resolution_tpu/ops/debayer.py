"""Bayer demosaicing.

TPU-native redesign of the reference's per-pixel switch kernels
(DeBayerKernels.cu:54-283): instead of branching per pixel on the CFA
class, we compute every interpolation hypothesis as a full-image shifted
array expression and select with CFA phase masks — pure VPU element-wise
math with no data-dependent control flow, which is how XLA wants it.

Channel codes follow BayerColor (DeBayerKernels.cu:28-41): 0=R, 1=G, 2=B.
The CFA pattern is a static 2x2 tuple (compile-time constant, like
``c_cfaPattern`` in constant memory).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

CFA = Tuple[Tuple[int, int], Tuple[int, int]]

RGGB: CFA = ((0, 1), (1, 2))
BGGR: CFA = ((2, 1), (1, 0))
GRBG: CFA = ((1, 0), (2, 1))
GBRG: CFA = ((1, 2), (0, 1))


def cfa_channel_map(h: int, w: int, cfa: CFA) -> np.ndarray:
    """(H, W) int map of each pixel's CFA channel."""
    pat = np.asarray(cfa, np.int32)
    return np.tile(pat, ((h + 1) // 2, (w + 1) // 2))[:h, :w]


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Edge-clamped shifted view: out[y, x] = x[y+dy, x+dx] (clamped),
    matching the reference kernels' clamped neighbor reads."""
    h, w = x.shape
    pad = max(abs(dy), abs(dx))
    xp = jnp.pad(x, pad, mode="edge")
    return xp[pad + dy : pad + dy + h, pad + dx : pad + dx + w]


def scale_raw(
    raw: jnp.ndarray,
    cfa: CFA,
    black_point: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    scale: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Per-site black-point/scale normalization (the RAWR/RAWG/RAWB macros,
    DeBayerKernels.cu:43-46): every pixel normalized by its own channel's
    black point and scale."""
    h, w = raw.shape
    ch = jnp.asarray(cfa_channel_map(h, w, cfa))
    bp = jnp.asarray(black_point, raw.dtype)[ch]
    sc = jnp.asarray(scale, raw.dtype)[ch]
    return (raw.astype(jnp.float32) - bp) * sc


def debayer(
    raw: jnp.ndarray,
    cfa: CFA = RGGB,
    black_point: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    scale: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Full-resolution demosaic: gradient+Laplacian-weighted green
    interpolation (Wu-Zhang; deBayerGreenKernel, DeBayerKernels.cu:54-149)
    followed by color-difference red/blue interpolation
    (deBayerRedBlueKernel, DeBayerKernels.cu:152-231).

    raw: (H, W) mosaic. Returns (H, W, 3) float32 RGB.
    """
    h, w = raw.shape
    ch = jnp.asarray(cfa_channel_map(h, w, cfa))
    is_r = ch == 0
    is_g = ch == 1
    is_b = ch == 2
    # green pixels whose horizontal neighbors are red ("red row")
    ch_right = jnp.asarray(cfa_channel_map(h, w + 1, cfa)[:, 1:])
    is_g_redrow = is_g & (ch_right == 0)
    is_g_bluerow = is_g & (ch_right == 2)

    # every neighbor fetch in the reference is a same-mosaic read normalized
    # by the *neighbor site's own* channel — which is exactly `same` shifted.
    same = scale_raw(raw, cfa, black_point, scale)

    # ---- green interpolation at R/B sites ----
    p = same
    xm2, xm1 = _shift(same, 0, -2), _shift(same, 0, -1)
    xp1, xp2 = _shift(same, 0, 1), _shift(same, 0, 2)
    ym2, ym1 = _shift(same, -2, 0), _shift(same, -1, 0)
    yp1, yp2 = _shift(same, 1, 0), _shift(same, 2, 0)

    grad_x = 0.5 * jnp.abs(xp1 - xm1)
    grad_y = 0.5 * jnp.abs(yp1 - ym1)
    lap_x = 0.25 * jnp.abs(2.0 * p - xm2 - xp2)
    lap_y = 0.25 * jnp.abs(2.0 * p - ym2 - yp2)
    interp_x = 0.125 * (-xm2 + 4.0 * xm1 + 2.0 * p + 4.0 * xp1 - xp2)
    interp_y = 0.125 * (-ym2 + 4.0 * ym1 + 2.0 * p + 4.0 * yp1 - yp2)
    weight = (grad_y + lap_y) / (grad_x + grad_y + lap_x + lap_y + 1e-9)
    g_interp = weight * interp_x + (1.0 - weight) * interp_y
    green = jnp.where(is_g, same, g_interp)

    # ---- red/blue via color difference to green ----
    gm1x, gp1x = _shift(green, 0, -1), _shift(green, 0, 1)
    gm1y, gp1y = _shift(green, -1, 0), _shift(green, 1, 0)
    horiz = green + 0.5 * ((xm1 - gm1x) + (xp1 - gp1x))
    vert = green + 0.5 * ((ym1 - gm1y) + (yp1 - gp1y))
    smm, spm = _shift(same, -1, -1), _shift(same, -1, 1)
    smp, spp = _shift(same, 1, -1), _shift(same, 1, 1)
    gmm, gpm = _shift(green, -1, -1), _shift(green, -1, 1)
    gmp, gpp = _shift(green, 1, -1), _shift(green, 1, 1)
    diag = green + 0.25 * ((smm - gmm) + (spm - gpm) + (spp - gpp) + (smp - gmp))

    red = jnp.where(is_r, same, jnp.where(is_g_redrow, horiz, jnp.where(is_g_bluerow, vert, diag)))
    blue = jnp.where(is_b, same, jnp.where(is_g_redrow, vert, jnp.where(is_g_bluerow, horiz, diag)))

    return jnp.stack([red, green, blue], axis=-1)


def debayer_subsample(raw: jnp.ndarray, cfa: CFA = RGGB, max_val: float = 1.0) -> jnp.ndarray:
    """Half-resolution RGB from each 2x2 Bayer quad, greens averaged and
    values divided by max_val (deBayersSubSample3, DeBayerKernels.cu:243-283).

    raw: (H, W); returns (H//2, W//2, 3).
    """
    h2, w2 = raw.shape[0] // 2, raw.shape[1] // 2
    quads = raw[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2).transpose(0, 2, 1, 3)
    quads = quads.astype(jnp.float32) / max_val
    pat = np.asarray(cfa)
    out = []
    for c in range(3):
        sel = (pat == c)
        weightsum = sel.sum()
        wgt = jnp.asarray(sel.astype(np.float32) / max(weightsum, 1))
        out.append(jnp.sum(quads * wgt, axis=(2, 3)))
    return jnp.stack(out, axis=-1)
