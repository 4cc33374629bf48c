"""Tile decomposition and SSD-surface alignment primitives.

TPU-native redesign of the reference's FFT tile-correlation chain
(kernel.cu): instead of per-tile FFT cross-correlation
(convertToTilesOverlap* -> FFT -> conjugateComplexMul -> IFFT ->
squaredSum/boxFilter -> normalizedCC, kernel.cu:118-318), the SSD surface

    SSD(u,v) = sum(t^2) + sum(w(u,v)^2) - 2 * CC(u,v)

is built directly: the cross term as a batched contraction over im2col
windows (an MXU batch-matmul), the window energies via integral images.
For the small search radii used here (|S| = 2R+1 <= 9..17) this is far
fewer FLOPs than the FFT route and keeps everything in one fused XLA
program. findMinimum's subpixel argmin + significance gate
(kernel.cu:511-636) becomes a masked vectorized reduction.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.registration.subpixel import (
    quadratic_subpixel_min,
)


def tile_counts(h: int, w: int, tile_size: int) -> Tuple[int, int]:
    return -(-h // tile_size), -(-w // tile_size)


def extract_ref_tiles(img: jnp.ndarray, tile_size: int) -> jnp.ndarray:
    """(H, W) -> (nty, ntx, T, T); partial border tiles are edge-padded."""
    h, w = img.shape
    nty, ntx = tile_counts(h, w, tile_size)
    pad_h = nty * tile_size - h
    pad_w = ntx * tile_size - w
    if pad_h or pad_w:
        img = jnp.pad(img, ((0, pad_h), (0, pad_w)), mode="edge")
    return img.reshape(nty, tile_size, ntx, tile_size).transpose(0, 2, 1, 3)


def extract_search_windows(
    img: jnp.ndarray,
    tile_size: int,
    radius: int,
    pre_shift: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-tile search windows of size (T+2R)^2 from the alternate frame,
    offset by the rounded per-tile predicted shift, with clamped borders —
    the convertToTilesOverlapPreShift equivalent (kernel.cu:323-378).

    img: (H, W); pre_shift: (nty, ntx, 2) float (dy, dx) or None.
    Returns (nty, ntx, T+2R, T+2R).
    """
    h, w = img.shape
    nty, ntx = tile_counts(h, w, tile_size)
    t2 = tile_size + 2 * radius

    ty = jnp.arange(nty) * tile_size
    tx = jnp.arange(ntx) * tile_size
    if pre_shift is None:
        sy = jnp.zeros((nty, ntx), jnp.int32)
        sx = jnp.zeros((nty, ntx), jnp.int32)
    else:
        sy = jnp.round(pre_shift[..., 0]).astype(jnp.int32)
        sx = jnp.round(pre_shift[..., 1]).astype(jnp.int32)

    offs = jnp.arange(t2) - radius
    yy = ty[:, None, None, None] + sy[:, :, None, None] + offs[None, None, :, None]
    xx = tx[None, :, None, None] + sx[:, :, None, None] + offs[None, None, None, :]
    yy = jnp.clip(yy, 0, h - 1)
    xx = jnp.clip(xx, 0, w - 1)
    return img[yy, xx]


def extract_search_windows_fast(
    img: jnp.ndarray,
    tile_size: int,
    radius: int,
    pre_shift_int: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Gatherless search-window extraction (the TPU fast path).

    Tile-warps the image by the integer pre-shifts (one structured warp),
    then assembles the overlapping (T+2R)^2 windows from contiguous
    reshapes/concats/static slices — no data-dependent gather.

    Semantics vs extract_search_windows: each window's halo comes from the
    *neighboring tiles' own shifts* rather than extending this tile's
    shift into the halo (the reference extends, kernel.cu:323-378). The
    two agree wherever neighboring pre-shifts agree; elsewhere only the
    SSD surface's rim pixels differ.
    """
    from multi_frame_super_resolution_tpu.ops.warp_fast import tile_warp_int

    h, w = img.shape
    t = tile_size
    r = radius
    if 2 * r > t:
        raise ValueError("fast extraction needs search_radius <= tile_size/2")
    nty, ntx = tile_counts(h, w, t)
    b = t + 2 * r

    warped = img if pre_shift_int is None else tile_warp_int(img, pre_shift_int, t)
    # pad: R halo on top/left; bottom/right enough for one extra tile row
    pad_b = (nty + 1) * t - h + r
    pad_r = (ntx + 1) * t - w + r
    p = jnp.pad(warped, ((r, pad_b), (r, pad_r)), mode="edge")
    tiles = (
        p[: (nty + 1) * t, : (ntx + 1) * t]
        .reshape(nty + 1, t, ntx + 1, t)
        .transpose(0, 2, 1, 3)
    )  # (nty+1, ntx+1, T, T)
    dy = jnp.concatenate([tiles[:-1], tiles[1:]], axis=2)  # (nty, ntx+1, 2T, T)
    dxy = jnp.concatenate([dy[:, :-1], dy[:, 1:]], axis=3)  # (nty, ntx, 2T, 2T)
    return dxy[:, :, :b, :b]


def _window_energies(windows: jnp.ndarray, t: int) -> jnp.ndarray:
    """Sliding T x T energy sums of (..., T+2R, T+2R) windows via integral
    images (boxFilterWithBorderX/Y equivalent, kernel.cu:148-218).
    Returns (..., 2R+1, 2R+1)."""
    sq = windows * windows
    pads = ((0, 0),) * (windows.ndim - 2) + ((1, 0), (1, 0))
    ii = jnp.pad(sq, pads).cumsum(-2).cumsum(-1)
    return (
        ii[..., t:, t:]
        - ii[..., :-t, t:]
        - ii[..., t:, :-t]
        + ii[..., :-t, :-t]
    )


def ssd_surface(ref_tiles: jnp.ndarray, windows: jnp.ndarray, radius: int) -> jnp.ndarray:
    """SSD over all (2R+1)^2 integer shifts for every tile.

    ref_tiles: (nty, ntx, T, T); windows: (nty, ntx, T+2R, T+2R).
    Returns (nty, ntx, 2R+1, 2R+1); entry (u, v) is the SSD of the ref tile
    against the window patch at offset (u-R, v-R).
    """
    nty, ntx, t, _ = ref_tiles.shape
    s = 2 * radius + 1
    import numpy as np

    # template energy (squaredSum, kernel.cu:118-143)
    tsq = jnp.sum(ref_tiles * ref_tiles, axis=(-2, -1))

    # window energies via integral image (boxFilterWithBorderX/Y equivalent)
    wsq = _window_energies(windows, t)  # (nty, ntx, 2R+1, 2R+1)

    # cross term as ONE batched MXU contraction: flatten tile pixels onto
    # the lane dimension (layout-safe, unlike an (..., T, T) im2col) and
    # build the S^2 shifted patches with a single static-index gather.
    t2 = t + 2 * radius
    n = nty * ntx
    ref_flat = ref_tiles.reshape(n, t * t)
    win_flat = windows.reshape(n, t2 * t2)
    # static index map: patch s=(u,v), pixel k=(i,j) -> window pixel
    # (u+i, v+j)
    uu, vv, ii, jj = np.meshgrid(
        np.arange(s), np.arange(s), np.arange(t), np.arange(t), indexing="ij"
    )
    idx = ((uu + ii) * t2 + (vv + jj)).reshape(s * s, t * t)
    patches = win_flat[:, jnp.asarray(idx)]  # (n, S^2, T^2)
    cc = jnp.einsum(
        "nk,nsk->ns", ref_flat, patches, precision=jax.lax.Precision.HIGHEST
    ).reshape(nty, ntx, s, s)

    return tsq[..., None, None] + wsq - 2.0 * cc


def ssd_surface_fft(
    ref_tiles: jnp.ndarray, windows: jnp.ndarray, radius: int
) -> jnp.ndarray:
    """Same surface as ``ssd_surface``, with the cross term computed by
    batched per-tile FFT cross-correlation — the reference's own route
    (tile FFT -> conjugateComplexMulKernel -> IFFT, kernel.cu:484-501
    with the fftshift folded into taking the first (2R+1)^2 lags of the
    zero-padded circular correlation).

    The direct MXU contraction wins for small search windows (S^2 * T^2
    MACs/tile); the FFT route's cost grows only log-linearly with the
    window, so it takes over for LARGE radii (R >~ T/2, e.g. wide
    coarse-level searches). Identical output layout/semantics; parity is
    pinned in tests/test_registration.py.
    """
    t = ref_tiles.shape[-1]
    t2 = windows.shape[-1]
    s = 2 * radius + 1
    tsq = jnp.sum(ref_tiles * ref_tiles, axis=(-2, -1))
    wsq = _window_energies(windows, t)
    fr = jnp.fft.rfft2(ref_tiles, s=(t2, t2))
    fw = jnp.fft.rfft2(windows)
    # circular correlation of the zero-padded template is linear for the
    # first 2R+1 lags (t + 2R <= t2, no wraparound)
    cc = jnp.fft.irfft2(jnp.conj(fr) * fw, s=(t2, t2))[..., :s, :s]
    return tsq[..., None, None] + wsq - 2.0 * cc


def ssd_surface_image(
    ref_img: jnp.ndarray,
    warped_img: jnp.ndarray,
    tile_size: int,
    radius: int,
) -> jnp.ndarray:
    """Image-level fused SSD surfaces for ALL tiles at once — the TPU fast
    path pairing with extract_search_windows_fast (same halo semantics:
    the alternate image is already tile-warped, halos cross tile borders).

    Builds the (2R+1)^2 shifted copies as one stacked array, multiplies by
    the reference once, and reduces per tile with a single reshape-sum —
    a handful of kernels instead of (2R+1)^2 multiply-reduces.

    Returns (nty, ntx, 2R+1, 2R+1).
    """
    h, w = ref_img.shape
    t = tile_size
    r = radius
    s = 2 * r + 1
    nty, ntx = tile_counts(h, w, t)
    pad_h = nty * t - h
    pad_w = ntx * t - w
    if pad_h or pad_w:
        ref_img = jnp.pad(ref_img, ((0, pad_h), (0, pad_w)), mode="edge")
        warped_img = jnp.pad(warped_img, ((0, pad_h), (0, pad_w)), mode="edge")
        h, w = ref_img.shape

    padded = jnp.pad(warped_img, r, mode="edge")  # (H+2R, W+2R)
    hp, wp = padded.shape
    dt = padded.dtype
    prec = jax.lax.Precision.HIGHEST

    # Ones-band matrices turn every tile/window box sum into an MXU
    # matmul. The round-2 formulation sampled an integral image with
    # 4(2R+1)^2 strided slices and did the tile reductions with
    # lane-axis reshape-sums — several hundred tiny ops costing ~250 us
    # per burst (round-3 device trace); the matmul forms are a handful
    # of layout-native ops.
    #   rows_t (nty, H):   rows_t[ty, i]      = 1  for i in [ty*t, ty*t+t)
    #   cols_t (W, ntx):   cols_t[j, tx]      = 1  for j in [tx*t, tx*t+t)
    #   rows_w (S*nty,HP): rows_w[u*nty+ty,i] = 1  for i in [u+ty*t, ..+t)
    #   cols_w (WP,S*ntx): cols_w[j,v*ntx+tx] = 1  for j in [v+tx*t, ..+t)
    iy = np.arange(nty * t)
    rows_t = jnp.asarray(
        (iy // t == np.arange(nty)[:, None]).astype(np.float32), dt
    )
    cols_t = rows_t.T if nty == ntx and h == w else jnp.asarray(
        ((np.arange(ntx * t) // t)[:, None] == np.arange(ntx)).astype(np.float32),
        dt,
    )
    uu = np.arange(s * nty)
    u0 = (uu // nty) + (uu % nty) * t
    rows_w = jnp.asarray(
        ((np.arange(hp) >= u0[:, None]) & (np.arange(hp) < (u0 + t)[:, None]))
        .astype(np.float32),
        dt,
    )
    vv = np.arange(s * ntx)
    v0 = (vv // ntx) + (vv % ntx) * t
    cols_w = jnp.asarray(
        ((np.arange(wp)[:, None] >= v0) & (np.arange(wp)[:, None] < (v0 + t)))
        .astype(np.float32),
        dt,
    )

    # window energies: one sandwich matmul over padded^2
    sq = padded * padded
    wsq = (
        jnp.einsum("ui,ij,jv->uv", rows_w, sq, cols_w, precision=prec)
        .reshape(s, nty, s, ntx)
        .transpose(1, 3, 0, 2)
    )  # (nty, ntx, S, S)

    # template energy per tile
    tsq = jnp.einsum(
        "ti,ij,jx->tx", rows_t, ref_img * ref_img, cols_t, precision=prec
    )

    # cross term: the S column shifts via one selector matmul (a lane
    # dim slice-stack materializes S^2 full copies), the S row shifts as
    # cheap sublane slices fused into the multiply, row-sums within
    # tiles on sublanes, and the final tile-column sum on the MXU.
    csel = np.zeros((wp, s, w), np.float32)
    jj = np.arange(w)
    for v in range(s):
        csel[jj + v, v, jj] = 1.0
    colsh = jnp.einsum(
        "ij,jvk->vik", padded, jnp.asarray(csel, dt), precision=prec
    )  # (S, HP, W)
    cc_u = []
    for u in range(s):
        m = (ref_img[None] * colsh[:, u : u + h, :]).reshape(s, nty, t, w)
        cc_u.append(
            jnp.einsum("vnw,wx->vnx", m.sum(axis=2), cols_t, precision=prec)
        )
    cc = jnp.stack(cc_u, axis=0)  # (S_u, S_v, nty, ntx)

    return (
        tsq[..., None, None] + wsq - 2.0 * cc.transpose(2, 3, 0, 1)
    )


def find_min_shift(
    ssd: jnp.ndarray,
    radius: int,
    threshold: float = 0.0,
    subpixel: bool = True,
) -> jnp.ndarray:
    """Per-tile subpixel argmin of the SSD surface with findMinimum's exact
    gating (kernel.cu:511-636): border minima and insignificant peaks
    (min + threshold > max) give zero shift.

    ssd: (nty, ntx, S, S) -> shifts (nty, ntx, 2) as (dy, dx).
    """
    nty, ntx, s, _ = ssd.shape
    flat = ssd.reshape(nty, ntx, s * s)
    idx = jnp.argmin(flat, axis=-1)
    min_val = jnp.min(flat, axis=-1)
    max_val = jnp.max(flat, axis=-1)
    py = idx // s
    px = idx % s

    on_border = (py < 1) | (py >= s - 1) | (px < 1) | (px >= s - 1)
    shift = jnp.stack(
        [py.astype(jnp.float32) - radius, px.astype(jnp.float32) - radius], axis=-1
    )

    if subpixel:
        # gatherless 3x3 neighborhood: one-hot row/col masks of the
        # (clipped) argmin select each patch entry as a masked reduction
        # over the surface — the per-tile advanced-index gather this
        # replaces cost 74 us/burst on v5e (round-3 device trace) for a
        # 41 KB array
        cy = jnp.clip(py, 1, s - 2)
        cx = jnp.clip(px, 1, s - 2)
        ar = jnp.arange(s)
        oy = (ar == cy[..., None]).astype(ssd.dtype)  # (nty, ntx, S)
        ox = (ar == cx[..., None]).astype(ssd.dtype)
        sel = oy[..., :, None] * ox[..., None, :]  # (nty, ntx, S, S)
        ssd_p = jnp.pad(ssd, ((0, 0), (0, 0), (1, 1), (1, 1)))
        patch = jnp.stack(
            [
                jnp.stack(
                    [
                        (sel * ssd_p[..., k : k + s, l : l + s]).sum((-2, -1))
                        for l in range(3)
                    ],
                    axis=-1,
                )
                for k in range(3)
            ],
            axis=-2,
        )  # (nty, ntx, 3, 3)
        shift = shift + quadratic_subpixel_min(patch)

    zero = jnp.zeros_like(shift)
    shift = jnp.where(on_border[..., None], zero, shift)
    insignificant = (min_val + threshold) > max_val
    return jnp.where(insignificant[..., None], zero, shift)


def upsample_shift_field(
    shifts: jnp.ndarray,
    new_nty: int,
    new_ntx: int,
    value_scale: float,
) -> jnp.ndarray:
    """Bilinear upsample of a per-tile shift field between pyramid levels
    with level rescaling of the shift values (UpSampleShifts,
    kernel.cu:641-688)."""
    nty, ntx, _ = shifts.shape
    oy = jnp.clip(
        jnp.arange(new_nty, dtype=jnp.float32) * (nty / new_nty), 0, nty - 1
    )
    ox = jnp.clip(
        jnp.arange(new_ntx, dtype=jnp.float32) * (ntx / new_ntx), 0, ntx - 1
    )
    y0 = jnp.floor(oy).astype(jnp.int32)
    x0 = jnp.floor(ox).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, nty - 1)
    x1 = jnp.minimum(x0 + 1, ntx - 1)
    fy = (oy - y0)[:, None, None]
    fx = (ox - x0)[None, :, None]
    p00 = shifts[y0][:, x0]
    p01 = shifts[y0][:, x1]
    p10 = shifts[y1][:, x0]
    p11 = shifts[y1][:, x1]
    top = p00 + (p01 - p00) * fx
    bot = p10 + (p11 - p10) * fx
    return (top + (bot - top) * fy) * value_scale
