"""Configuration dataclasses for every pipeline in the framework.

Every named constant of the CUDA reference is preserved here as a tunable
(reference: SURVEY.md §5 config row). Configs are frozen (hashable) so they
can be passed as static arguments to ``jax.jit``.

Reference constants and their origins:
  * tile alignment:   tileSize / maxShift grids (kernel.cu:264-378), findMinimum
                      peak-significance ``threshold`` (kernel.cu:629)
  * Lucas-Kanade:     halfWindowSize / minDet (opticalFlow.cu:199-200)
  * robustness model: alpha, beta, thresholdM (RobustnessModell.cu:38-40),
                      s=1.5 (RobustnessModell.cu:147), t=0.12 (:151)
  * merge kernel:     kDetail/kDenoise/kStretch/kShrink/Dth/Dtr
                      (kernel.cu:723-728), ApplyWeighting threshold (kernel.cu:433)
  * BTV-L1 SR:        scale=2 (multi_frame_sr.cpp:146), iterations CLI arg
                      (:133), temporalAreaRadius=1 (:182)
  * dark channel:     window=15 (main.cpp:98), omega=0.95 (main.cpp:159),
                      t0=0.1 (main.cpp:176), top 0.1% airlight (main.cpp:128)
  * polar defog:      percent=0.005 (polar_defog.cpp:177), radius=12 (:153),
                      beta CLI arg (:75), t/R clamps 0.001/0.999
                      (myKernels.cu:35-48)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class AlignConfig:
    """Tile-pyramid subpixel alignment (the HDR+-style coarse-to-fine search).

    Equivalent of the reference's convertToTilesOverlap* / normalizedCC /
    findMinimum / UpSampleShifts kernel chain (kernel.cu:118-688).
    """

    tile_size: int = 16          # alignment tile edge in pixels (per level)
    search_radius: int = 4       # maxShift: +/- search window per level
    # search radius at the FINEST level only (None = search_radius). The
    # finest level starts from the coarse level's upsampled prediction, so
    # its residual is small; radius 2 cuts the SSD volume (2R+1)^2 from
    # 81 to 25 shifted copies on the hottest level. The reference's
    # per-level maxShift grids are the same idea (kernel.cu:264-378).
    # Round-4 measurement: 2 is true-HR-fidelity-free on the synthetic
    # burst (27.58 dB) and ~0.08 ms faster at city size, but the car
    # burst's finest-level residual exceeds it (golden -0.84 dB; 3 still
    # -0.44) — default stays None, flip to 2 for smooth-motion bursts.
    fine_radius: int | None = None
    levels: int = 3              # pyramid levels (coarse-to-fine)
    downsample: int = 2          # pyramid decimation factor between levels
    # findMinimum peak-significance gate: if (min + threshold) > max over the
    # SSD surface the tile is considered featureless and gets zero shift
    # (kernel.cu:629-633). Expressed relative to tile energy.
    peak_threshold: float = 0.0
    subpixel: bool = True        # 3x3 quadratic interpolation of the SSD argmin
    # NOTE (round 4): the former ``use_pallas`` per-tile DMA extraction
    # path is RETIRED — Mosaic requires DMA slice shapes 128-aligned on
    # the lane dim, fundamentally incompatible with a 16-px tile grid
    # (probe re-run 2026-08-19: "slice shape along dimension 2 must be
    # aligned to tiling (128)"). The kernels remain in pallas_ops/ as
    # interpret-mode research artifacts; see BENCH_NOTES.md "Pallas
    # verdict (round 4)".
    # gatherless window extraction (tile-warp + static block assembly);
    # halo semantics differ slightly from the reference at tile borders
    # (see tiles.extract_search_windows_fast) but no data-dependent gather
    # is emitted — much faster on TPU. Requires search_radius <= tile/2.
    fast_extract: bool = True
    # compute the tile SSD cross term by batched per-tile FFT correlation
    # (the reference's route, kernel.cu:484-501) instead of the direct
    # MXU contraction — worthwhile for LARGE search radii (R >~ T/2),
    # where it is also the only non-gather window path (fast_extract
    # requires R <= T/2)
    use_fft: bool = False


@dataclasses.dataclass(frozen=True)
class LKConfig:
    """Dense Lucas-Kanade refinement (opticalFlow.cu:189-325)."""

    half_window: int = 8         # halfWindowSize: window is (2h+1)^2
    iterations: int = 2          # warp-and-refine outer iterations
    min_sigma: float = 1e-4      # minDet: minimum singular value gate
    # >0: warp with the gatherless bounded-residual scheme (flows clamped
    # to +-bounded_warp px) instead of the general gather warp
    bounded_warp: int = 0
    # >0: handle LARGE flows gatherlessly by decomposing each iteration's
    # flow into per-tile integer shifts (one-hot select warp) + a bounded
    # residual (warp_tile = tile size; residual clamp = max(bounded_warp, 2))
    warp_tile: int = 0
    # window sums via bfloat16 banded matmuls on the MXU (f32
    # accumulation; only input quantization at ~2^-8 relative) instead
    # of the f32 sliding cumsum on the VPU — see ops.filters
    # box_filter_planes(mxu_bf16=...). Round-4 default on: true-HR
    # fidelity unchanged (27.58 dB), ~0.1 ms faster at city size.
    bf16: bool = True


@dataclasses.dataclass(frozen=True)
class RobustnessConfig:
    """Merge robustness / certainty model (RobustnessModell.cu:28-158)."""

    alpha: float = 0.004         # noise model sigma_md = sqrt(alpha*mean + beta)
    beta: float = 1e-4
    threshold_m: float = 0.8     # motion inconsistency gate: s -> 0 if M > thresholdM
    s: float = 1.5               # mask scale (RobustnessModell.cu:147)
    t: float = 0.12              # mask offset (RobustnessModell.cu:151)


@dataclasses.dataclass(frozen=True)
class MergeConfig:
    """Anisotropic kernel-regression merge (kernel.cu:717-790,
    DeBayerKernels.cu:289-468). Defaults follow the published handheld
    multi-frame SR parameter ranges."""

    k_detail: float = 0.25
    k_denoise: float = 3.0
    k_stretch: float = 2.0
    k_shrink: float = 2.0
    d_th: float = 0.001
    d_tr: float = 0.006
    # merge-kernel variance clamps in output-pixel^2 units: k_min bounds
    # the kernel below (sample density floor — narrower kernels leave
    # coverage holes that collapse to the fallback), k_max bounds the
    # along-edge smearing above
    k_min: float = 0.25
    k_max: float = 1.0
    # RAW merge: R/B sites are 2 raw px apart, so their kernels need a
    # higher variance floor than green to cover the output grid without
    # CFA-period fallback patterns. Under the order-0 merge 0.5 measured
    # best (round 3: city +0.28, car +0.57 golden); under the order-1
    # merge the fit tolerates narrower R/B kernels and 0.25 (= no extra
    # floor beyond k_min) gains +0.11 dB true-HR (round-4 sweep,
    # tools/eval_fidelity.py). Raise toward 0.5 for very noisy bursts.
    k_min_rb: float = 0.25
    # guided R/B accumulation: merge R-G / B-G color differences (computed
    # against a gradient-weighted green estimate on the warped planes) and
    # reconstruct R = G + D_R, so chroma rides the sharp green channel
    # instead of blurring under the wide R/B kernels
    # (deBayerRedBlueKernel's color-difference fill lifted into the merge,
    # DeBayerKernels.cu:152-231). Round-3 verdict: decisively OFF. The
    # round-2 "alignment pollution" hypothesis was tested by swapping in
    # smooth bilinear residual fields (smooth_residual) — guided still
    # loses at every k_min_rb (city golden 29.2-29.3 guided vs 29.84
    # unguided at k_min_rb=0.5), while simply lowering k_min_rb captures
    # the chroma sharpness the guide was meant to buy (+0.4 dB true-HR
    # R/B, tools/eval_fidelity.py). Kept as an option for parity with
    # the reference's strategy.
    guided_rb: bool = False
    # ApplyWeighting: where accumulated weight < threshold, blend in the
    # fallback (reference/demosaiced) image (kernel.cu:425-481).
    weight_threshold: float = 1e-2
    # regression order of the merge estimator (round 4):
    #   0 = the reference's Nadaraya-Watson weighted average
    #       (accumulateImagesSuperRes, DeBayerKernels.cu:378-468)
    #   1 = local LINEAR kernel regression (Takeda et al. IEEE TIP 2007):
    #       fits value + gradient per output pixel, removing the sample-
    #       centroid bias that capped true-HR fidelity at ~26.8 dB even
    #       with perfect flows (+0.6 dB measured, tools/eval_gt_flow.py /
    #       proto_order1.py). Default: the quality bar of the north star
    #       outranks reference behavioral parity (order=0 kept for it).
    order: int = 1
    # merge order for the RGB-input pipeline (handheld_superres); None =
    # follow ``order``. Measured round 4 (city true-HR, RGB synthetic
    # burst): order 1 buys only +0.11 dB over order 0 there (29.97 vs
    # 29.86 — the Wiener restore supplies the RGB gain, +1.5 dB) at ~2x
    # merge volume and -3.5 dB self-consistency on the real bursts, so
    # the RGB path keeps the Nadaraya-Watson merge by default.
    rgb_order: int | None = 0
    # order-1 Tikhonov ridge on the gradient block, scaled by the local
    # weight sum (density-invariant). 0.01-0.05 measure within 0.03 dB;
    # larger values shrink toward the order-0 average.
    ridge: float = 0.02
    # order-1 solver:
    #   "exact"  — per-pixel 3x3 weighted normal equations (jointly fits
    #              value + gradient; 9 moment stacks accumulated)
    #   "plugin" — first-order centroid-bias correction est = pilot -
    #              grad(pilot) . centroid with the gradient iterated from
    #              the pilot image (models.merge.solve_plugin); only 4
    #              moment stacks, ~2x order-0 merge volume instead of
    #              4.5x — the fast-path default once quality parity was
    #              measured (round 4)
    solver: str = "plugin"
    # plugin gradient iterations: 1 measures identical true-HR fidelity
    # to 2 (26.88 dB at matched settings, round 5) and mixed-sign
    # golden deltas within 0.2 dB, while each iteration costs a
    # gradient + correction pass over the full phase stack (~0.06-0.16
    # ms/burst at city size, k=24 differencing)
    plugin_iters: int = 1
    # order-1 fast RAW merge: evaluate the Gaussian weights at the same
    # parity-interpolated per-pixel displacement as the moments (the
    # oracle's convention) instead of the block-center approximation.
    # 4 weight quads per tap instead of 2.
    exact_weights: bool = False
    # plugin solver: restrict the centroid moments (m01, m02) to the
    # taps that survive this tighter prune threshold (None = all merge
    # taps). The bias correction is a small smooth field; 1.0 keeps the
    # inner 3x3 and cuts the centroid accumulate volume ~2.8x.
    centroid_prune: float | None = None
    # plugin solver: bf16 products (f32 reduces) for the centroid moment
    # chain — ~0.4% relative on the already-small correction term.
    # Measured round 4: the dtype casts made it SLOWER on v5e (1.47 vs
    # 1.36 ms full pipeline) — the products feed f32 reduces, so the
    # conversions add ops without saving bandwidth. Default off.
    centroid_bf16: bool = False
    # plugin solver: evaluate the centroid moments at the BLOCK-CENTER
    # flow (the same res_y/res_x fields the weight pass reads in the
    # same fusion) instead of the parity-interpolated per-output-pixel
    # flow — the rho field reads and the cross-tap wc accumulator
    # disappear, leaving only extra reduce outputs per tap (device
    # trace round 4: the parity-rho reads + finalize were ~0.2 ms of
    # the 0.33 ms order-1 overhead at city size). The phase offsets phi
    # still fold exactly (as scalars); only the sub-block flow
    # VARIATION is dropped from the centroid (not from the weights).
    centroid_block: bool = False
    # plugin solver: drop the CERTAINTY factor from the centroid moments
    # (weights only). The centroid is a weight RATIO — smooth certainty
    # variation cancels between numerator and denominator — and without
    # cert the block-center centroid is IDENTICAL for every CFA parity
    # (the Gaussian weight never depends on the output parity, only on
    # tap and phase): the whole centroid collapses from 16 per-cell
    # accumulator chains to 3 shared ones (sum w, sum res_y*w, sum
    # res_x*w per green/rb kernel family), making the order-1 correction
    # nearly free on top of the order-0 merge. Where a frame is
    # motion-masked (cert ~ 0) its weight still counts toward the shared
    # centroid — a second-order error in an already-small (<~0.2 px)
    # correction; fidelity measured round 5 (tools/eval_fidelity.py):
    # true-HR 26.88 dB both ways at matched settings, goldens city
    # 30.36/30.36, car 30.62/30.56, iso 22.58/22.63 — quality-free, and
    # the k=16 variant bench measured the certless default ~0.3-0.6 ms
    # faster at city size. False (default) = shared certless centroid
    # (implies centroid_block; block-center weights).
    centroid_cert: bool = False
    # plugin solver (centroid_block form only): reduce the weighted-mean-
    # residual part of the centroid (sum_F res*wc) at ONE phase and share
    # it across the s^2 output phases. The per-phase phi offsets still
    # fold exactly (scalars on the per-phase m00 reduce) and m00/b0 keep
    # full phase resolution — only the residual-average's sub-phase
    # VARIATION is dropped, and the residual field is block-constant to
    # begin with (a half-res estimate), so the weighted mean over taps x
    # frames is very nearly phase-independent. Cuts the two extra
    # centroid reduces from (s^2, F, hh, hw) -> (1, F, hh, hw) inputs.
    centroid_shared_res: bool = False
    # static tap pruning threshold: taps whose best-case Gaussian weight
    # is below e^-prune_exp are dropped at trace time (fast merges).
    # 6.0 reproduces the reference's 5x5 window at the order-0 defaults;
    # at radius=1 + residual_bound=1.0 the levels are 25 taps (3.0),
    # 21 taps (1.5, drops the |2|,|2| corners) and 9 taps (1.0).
    # Round-4 measurements: 1.5 is true-HR-fidelity-free (27.58 dB both)
    # and ~0.1 ms faster at city size; 1.0 costs 0.49 dB.
    prune_exp: float = 1.5
    radius: int = 1              # tap neighborhood (reference: 2 => 5x5,
    #                              DeBayerKernels.cu:317; order-1 default
    #                              1 — see prune_exp)
    # run the accumulate stage through the Pallas merge kernel
    # (pallas_ops/merge.py) instead of the XLA static-tap formulation.
    # Round-4 verdict: compiles AND matches on real Mosaic (probe
    # 2026-08-19) but is SLOWER than the XLA static-tap path (4.3 vs
    # 2.9 ms, round-2 measurement; the XLA path has only gotten faster
    # since) — kept as a working alternative, off by default
    # (BENCH_NOTES.md "Pallas verdict (round 4)").
    use_pallas: bool = False
    # accumulate in bfloat16 (weights/products; the num/den outputs are
    # converted back to f32 before normalization). The reference merges
    # in f32 (DeBayerKernels.cu:289-376); bf16 halves the VPU/HBM
    # traffic of the tap loop at ~2^-8 relative precision — quality
    # impact is pinned by the golden floors (tests/test_golden.py).
    bf16: bool = False


@dataclasses.dataclass(frozen=True)
class RegistrationConfig:
    """FFT phase-correlation / log-polar registration (main.cpp:721-1194)."""

    apodization_ratio: float = 0.12   # hanning border radius = ratio*min(h,w)
    eps: float = 1e-15                # cross-power-spectrum epsilon
    subpixel: bool = True
    # --- TPU fast-path knobs (defaults = reference-parity slow path) ---
    # log-polar resampling kernel: "bicubic" matches cv::cuda::remap cubic
    # (main.cpp:1139); "bilinear" quarters the gather volume (the
    # magnitude spectrum is smooth, measured estimate drift < 0.05 cells)
    logpolar_interp: str = "bicubic"
    # unrotate/unscale via the gatherless tile-decomposed warp
    # (tile_warp_select + warp_bounded) instead of a per-pixel gather
    # remap — the same one-hot machinery as the pipeline warps
    fast_warp: bool = False
    # estimate on 2^k-box-downsampled luma (translation rescaled back);
    # halves every FFT/log-polar axis per step
    downsample: int = 1
    # >0: local matrix-DFT peak refinement at this upsampling factor
    # instead of 3x3 quadratic interpolation (two small MXU matmuls;
    # ~1/factor cell accuracy — recovers the precision downsampling and
    # bilinear log-polar give up)
    peak_upsample: int = 0
    # subsample the log-polar RADIAL axis by this step (same spectral
    # span, coarser log-radius sampling): halves the gather volume of
    # the log-polar remap at step 2; recovered scale rescales by the
    # step, and the DFT peak refinement keeps sub-cell accuracy
    lp_radius_step: int = 1
    # compute the log-polar remap as two static dense matmuls (MXU)
    # instead of a per-pixel gather — numerically identical weights; the
    # gather form runs at ~9 cycles/element on TPU and dominated the
    # round-2 pre-alignment estimator (~1 ms for a 128x64 map)
    lp_matmul: bool = False


# the similarity pre-alignment stage runs with the TPU-fast settings;
# standalone registration keeps reference-parity defaults above
PREALIGN_FAST = RegistrationConfig(
    logpolar_interp="bilinear", fast_warp=True, downsample=2, peak_upsample=16,
    lp_radius_step=2, lp_matmul=True,
)


@dataclasses.dataclass(frozen=True)
class HandheldConfig:
    """End-to-end handheld burst super-resolution pipeline."""

    align: AlignConfig = AlignConfig()
    lk: LKConfig = LKConfig()
    robustness: RobustnessConfig = RobustnessConfig()
    merge: MergeConfig = MergeConfig()
    scale: int = 2               # super-resolution factor
    cfa_pattern: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 1), (1, 2))
    # cfa ints: 0=R 1=G 2=B, matching BayerColor (DeBayerKernels.cu:28-41);
    # default RGGB.
    use_lk: bool = True          # dense LK refinement after tile alignment
    st_window: int = 3           # structure-tensor smoothing window
    gamma: bool = False          # sRGB-encode the output (RAW/linear input)
    fast: bool = True            # gatherless tile-warp + static-tap merge
    # fast path: subpixel residual clamp (px). The integer tile warp
    # leaves a residual in [-0.5, 0.5] per tile, but the per-pixel LK
    # correction legitimately exceeds that within a tile — clamping at
    # 0.5 cost 0.45 dB true-HR fidelity under the order-1 merge
    # (round-4 bisect, tools/eval_fidelity.py); 1.0 vs 2.0 is a wash.
    residual_bound: float = 1.0
    # RGB fast path: run the tile-pyramid search on 2x-downsampled luma
    # (the reference's own alignment resolution — deBayersSubSample3,
    # DeBayerKernels.cu:243-283) and lift the shifts to full res; the
    # full-res LK refinement then recovers the subpixel precision the
    # coarse search grid gives up (its +-2 px bound covers half-res
    # measurement error). ~4x less search volume. Requires even H, W
    # (else the full-res search runs as before).
    half_align: bool = True
    # RGB fast path: run the LK refinement and the robustness model on
    # 2x-downsampled luma/RGB (the reference's own resolution for both —
    # deBayersSubSample3 feeds ComputeRobustnessMask and the LK chain,
    # RobustnessModell.cu:28, opticalFlow.cu:189) and lift the residual
    # flow / certainty back to full res. MEASURED NEGATIVE, default off
    # (round 5): 7.5 vs 6.5 ms/burst at city size — the channel-minor
    # (H, W, 2/3) lift passes cost more than the quarter-volume LK
    # saves — and the lifted masks lose what the full-res robustness
    # catches on the small noisy bursts (RGB goldens: car 33.13 vs
    # 34.73, iso 26.45 vs 27.79). The RAW pipeline gets the same
    # economics for free because its inputs are NATIVELY half-res CFA
    # planes (no lift back).
    rgb_half_stats: bool = False
    # alignment via the pairwise global-consistency solve (ShiftMinimizer
    # equivalent) instead of direct-to-reference measurements; ~2x the
    # alignment cost, more robust on low-texture frames
    use_consistency: bool = False
    # fast paths: densify the subpixel residual by bilinear tile-shift
    # interpolation (flow_from_tile_shifts — the texture read of
    # CreateFlowFieldFromTiles, opticalFlow.cu:88-90) instead of
    # block-repeating each tile's residual. Under the order-0 merge this
    # was a wash on true-HR fidelity and smeared unreliable tile
    # measurements on small noisy bursts (round 3: car RAW −0.8 dB).
    # Under the order-1 merge the fit needs accurate per-pixel
    # displacements, and the smooth residual gains +0.11 dB true-HR
    # (round-4 sweep) — default on; flip off for tiny low-texture
    # bursts if car-style golden scores regress.
    smooth_residual: bool = True
    # post-merge restoration filter (ops/restore.py): a fixed 7x7 FIR
    # fitted against true-HR ground truth (tools/fit_restore.py) that
    # deconvolves the scene-independent sampling PSF (sensor box +
    # interpolation + merge kernel). +0.5-1.0 dB true-HR on clean
    # bursts, -0.2 dB on very noisy HR targets (iso) — the calibrated
    # equivalent of the reference's unconditional output sharpen
    # (sharpenImg2, multi_frame_sr.cpp:207-209). Applied only at
    # scale=2 (the calibration point).
    final_restore: bool = True
    # noise-adaptive restoration (round 5): scale the restore FIR by a
    # gain from the REGISTERED temporal noise statistic
    # (ops.restore.temporal_noise_stat — the data-driven analog of the
    # reference's sigma_md noise model, RobustnessModell.cu:130-132):
    # full strength below restore_gate_lo, off above restore_gate_hi.
    # Spatial (Laplacian/MAD) estimators cannot arbitrate here — a
    # detailed clean burst outscores the noisy iso burst on them
    # (round-5 measurement); the compensated temporal statistic
    # separates the measured cases (tools/calib_restore_gate.py,
    # half-res luma): car 0.0006, city 0.0102, clean synthetic 0.0120,
    # synthetic+sigma-0.02 read noise 0.0168 (restore still helps ALL
    # of these: +0.6 to +1.3 dB) vs iso 0.0224 (restore hurts,
    # -0.3 dB). Thresholds sit between the populations.
    restore_noise_gate: bool = True
    restore_gate_lo: float = 0.014
    restore_gate_hi: float = 0.020
    # fast paths: apply the integer tile warp as banded MXU selector
    # matmuls (warp_fast.tile_warp_matmul) instead of per-plane one-hot
    # VPU selects — the selection matrices are built once per frame and
    # shared by its planes, and the contraction runs on the MXU.
    # Round-5 measurements: throughput-neutral (1.428 vs 1.435 ms k=64)
    # and +0.21 dB true-HR (27.87 vs 27.66) because the matmul form is
    # EXACT — the one-hot form's two-level decomposition mis-warps
    # tile-crossing bands at bound > 6.
    warp_matmul: bool = True
    # global similarity pre-alignment (FFT log-polar rotation/scale +
    # translation per alternate, registration/prealign.py) before the
    # tile pyramid — the reference's baseShift/baseRotation tile model
    # (kernel.cu:264-318) estimated by the PreAlignment FFT stage it
    # left unfinished (boxFilterNPP.cpp:102-166). Required for bursts
    # with per-frame rotation (city: 0/0/5/10/-15 deg, main.cpp:1896).
    prealign: bool = True
    # registration settings for the pre-alignment stage (TPU-fast
    # defaults; swap in RegistrationConfig() for reference-parity
    # gather-based estimation)
    prealign_cfg: RegistrationConfig = PREALIGN_FAST


@dataclasses.dataclass(frozen=True)
class BTVConfig:
    """BTV-L1 multi-frame super-resolution (OpenCV superres::BTVL1_CUDA
    equivalent; multi_frame_sr.cpp:165-184)."""

    scale: int = 2
    iterations: int = 10         # gradient-descent iterations per output frame
    temporal_radius: int = 1     # temporalAreaRadius
    tau: float = 1.3             # step size (OpenCV BTVL1 default)
    lam: float = 0.03            # data-term weight (OpenCV `lambda`)
    alpha: float = 0.7           # BTV spatial decay
    btv_kernel_size: int = 7     # BTV window
    blur_sigma: float = 0.0      # 0 => box-like blur of size `scale`
    optical_flow: str = "pyrlk"  # farneback | tvl1 | brox | pyrlk
    fast: bool = True            # gatherless decomposed warps (TPU path)
    warp_tile: int = 16          # tile size of the flow decomposition
    # residual clamp of the decomposed warp: 1 px halves the bounded-warp
    # tap window (16 vs 36 taps) and measures slightly BETTER than 2 on
    # the city burst (upsampled LR flows are tile-smooth)
    warp_residual_bound: int = 1


@dataclasses.dataclass(frozen=True)
class FlowConfig:
    """Dense optical flow backends (createOptFlow surface,
    multi_frame_sr.cpp:61-87)."""

    method: str = "pyrlk"        # pyrlk | farneback | tvl1 | brox
    pyramid_levels: int = 3
    # pyrlk
    lk_half_window: int = 6
    lk_iterations: int = 5
    # farneback
    fb_poly_n: int = 5
    fb_poly_sigma: float = 1.1
    fb_win_size: int = 13
    fb_iterations: int = 5
    # tvl1 (variational, primal-dual)
    tv_tau: float = 0.25
    tv_lambda: float = 0.15
    tv_theta: float = 0.3
    tv_iterations: int = 30
    tv_warps: int = 3
    # brox (variational with gradient constancy, Brox et al. ECCV 2004;
    # the reference delegates to createOptFlow_Brox_CUDA,
    # multi_frame_sr.cpp:79-80). alpha/gamma defaults follow the paper's
    # recommended smoothness/gradient weights for [0,1] intensities.
    brox_alpha: float = 0.03        # smoothness weight
    brox_gamma: float = 8.0         # gradient-constancy weight
    brox_epsilon: float = 1e-3      # Ψ robustness epsilon
    brox_presmooth: float = 0.8     # pre-smoothing sigma
    brox_outer_iterations: int = 3  # warps per pyramid level
    brox_inner_iterations: int = 3  # fixed-point relinearizations
    brox_solver_iterations: int = 12  # Jacobi sweeps per linearization
    brox_omega: float = 0.9         # Jacobi under-relaxation


@dataclasses.dataclass(frozen=True)
class DarkChannelConfig:
    """He-style dark-channel-prior dehazing (main.cpp:94-190)."""

    window: int = 15             # min-filter window (window_h = window_w = 15)
    omega: float = 0.95          # haze retention factor
    t0: float = 0.1              # transmission floor
    top_percent: float = 0.001   # brightest dark-channel fraction for airlight


@dataclasses.dataclass(frozen=True)
class PolarDefogConfig:
    """Polarization-difference defogging (polar_defog.cpp:64-303,
    myKernels.cu:16-52)."""

    radius: int = 12             # dark-prior erode radius => 25x25 window
    percent: float = 0.005       # top fraction of dark channel for airlight
    beta: float = 1.55           # polarization-degree scale (CLI arg)
    t_min: float = 0.001         # transmission clamp (myKernels.cu:35-39)
    t_max: float = 0.999
    r_min: float = 0.001         # recovered radiance clamp (myKernels.cu:43-48)
    r_max: float = 0.999




@dataclasses.dataclass(frozen=True)
class BenchConfig:
    """Warmup-then-measure protocol shared by all benchmark harnesses
    (multi_frame_sr.cpp:187-206, polar_defog.cpp:126-141)."""

    warmup: int = 5
    iters: int = 20
