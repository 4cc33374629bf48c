"""Golden regression numbers on the real reference bursts.

Pins end-to-end quality floors so cross-round refactors can't silently
regress the pipelines (SURVEY.md §6: correctness is judged by PSNR on the
bundled bursts; datasets at multi_frame_sr.cpp:151-163). Metric:
psnr(reference frame, downsample2(2x SR output)).

The golden runs pin the MERGE (final_restore=False): the Wiener
restoration filter deliberately deconvolves the sampling PSF, which
self-consistency double-counts as error (round-4 measurement: restore
costs car RAW -1.0 dB on this metric while gaining +1.1 dB against true
HR ground truth on a car-scene synthetic burst, tools/fit_restore.py).
Restore itself is pinned by the true-HR fidelity floors
(tests/test_fidelity.py), which is the metric it optimizes.

Round-4 measured values (order-1 plugin RAW merge, order-0 RGB merge,
smooth_residual, k_min_rb=0.25; CPU/TPU agree to ~0.05 dB):
city RAW 29.71 / RGB 38.76; car RAW 30.13 / RGB 33.97; iso RAW 22.44 /
RGB 27.55. Floors sit <= 0.5 dB under measurement (VERDICT r2 weak #6)
so a half-dB regression fails the suite. vs round 3 the RAW floors gave
back ~0.1-0.4 dB of self-consistency and car RGB ~1.5 dB
(smooth_residual smears per-tile measurement noise on the small noisy
car burst) — bought deliberately: true-HR fidelity rose 26.18 -> 27.58
dB (fast) and the RGB true-HR check measures the smooth residual as a
wash (+0.07 dB), see tests/test_fidelity.py and BENCH_NOTES.md.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

needs_reference = pytest.mark.skipif(
    not os.path.exists("/root/reference"), reason="reference data not mounted"
)

# (dataset, tile_size, raw_floor_db, rgb_floor_db)
_CASES = [
    ("city", 16, 29.3, 38.3),
    ("car", 8, 29.7, 33.5),
    ("iso", 16, 22.0, 27.1),
]


def _cfg(tile_size):
    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig

    cfg = HandheldConfig(
        align=AlignConfig(tile_size=tile_size, search_radius=4, levels=2),
        gamma=False,
    )
    # pin the merge; the restoration filter is covered by the true-HR
    # fidelity floors (see module docstring)
    return dataclasses.replace(cfg, final_restore=False)


@needs_reference
@pytest.mark.parametrize("name,tile,floor,_", _CASES)
def test_raw_handheld_psnr_floor(name, tile, floor, _):
    from multi_frame_super_resolution_tpu.data import load_burst, mosaic_rggb
    from multi_frame_super_resolution_tpu.models import handheld_superres_raw
    from multi_frame_super_resolution_tpu.ops.geometry import downsample2
    from multi_frame_super_resolution_tpu.utils import psnr

    burst = load_burst(name)
    raw = jnp.asarray(np.stack([mosaic_rggb(f) for f in burst]))
    out = jax.jit(lambda b: handheld_superres_raw(b, _cfg(tile)))(raw)
    p = float(psnr(jnp.asarray(burst[0]), downsample2(out)))
    assert p > floor, (name, p)


@needs_reference
@pytest.mark.parametrize("name,tile,_,floor", _CASES)
def test_rgb_handheld_psnr_floor(name, tile, _, floor):
    from multi_frame_super_resolution_tpu.data import load_burst
    from multi_frame_super_resolution_tpu.models import handheld_superres
    from multi_frame_super_resolution_tpu.ops.geometry import downsample2
    from multi_frame_super_resolution_tpu.utils import psnr

    burst = jnp.asarray(load_burst(name))
    out = jax.jit(lambda b: handheld_superres(b, _cfg(tile)))(burst)
    p = float(psnr(burst[0], downsample2(out)))
    assert p > floor, (name, p)
