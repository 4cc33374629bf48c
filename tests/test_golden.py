"""Golden regression numbers on the real reference bursts.

Pins end-to-end quality floors so cross-round refactors can't silently
regress the pipelines (SURVEY.md §6: correctness is judged by PSNR on the
bundled bursts; datasets at multi_frame_sr.cpp:151-163). Metric:
psnr(reference frame, downsample2(2x SR output)).

Round-3 measured values (prealign on, k_min_rb=0.5, CPU/TPU agree to
~0.05 dB): city RAW 29.84 / RGB 38.65; car RAW 30.50 / RGB 35.68;
iso RAW 22.59 / RGB 27.70 (iso is a real high-ISO burst — frame noise
bounds the metric). Floors sit <= 0.5 dB under measurement (VERDICT r2
weak #6) so a half-dB regression fails the suite.
"""

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
    ("city", 16, 29.4, 38.2),
    ("car", 8, 30.0, 35.2),
    ("iso", 16, 22.1, 27.2),
]


def _cfg(tile_size):
    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig

    return HandheldConfig(
        align=AlignConfig(tile_size=tile_size, search_radius=4, levels=2),
        gamma=False,
    )


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
