import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.ops import (
    apodization_window,
    cross_power_spectrum,
    fftshift2,
    fourier_filter,
    high_pass_filter,
)


def test_apodization_window_reference_construction():
    """getApodizationWindow (main.cpp:721-739): Hann ramp of length
    2*radius split across edges, ones in the middle, outer product."""
    w = apodization_window(32, 48, 6)
    assert w.shape == (32, 48)
    assert np.allclose(w[16, 24], 1.0)
    assert w[0, 24] < 1e-6  # hann[0] == 0
    # separability
    assert np.allclose(w, np.outer(w[:, 24], w[16, :]) / w[16, 24], atol=1e-6)


def test_high_pass_filter_reference_values():
    """getHighPassFilter (main.cpp:741-760): zero at center (cos^2(0)=1),
    ~1 in the corners."""
    f = high_pass_filter(33, 33)
    assert abs(f[16, 16]) < 1e-6
    # corner: r = pi/sqrt(2), 1-cos^2 ~= 0.636; edge midpoint: r = pi/2 -> 1.0
    assert abs(f[0, 0] - (1.0 - np.cos(np.pi / np.sqrt(2)) ** 2)) < 1e-5
    assert abs(f[0, 16] - 1.0) < 1e-6
    # symmetric
    np.testing.assert_allclose(f, f[::-1, :], atol=1e-6)
    np.testing.assert_allclose(f, f[:, ::-1], atol=1e-6)


def test_cross_power_spectrum_peak_at_shift(rng):
    """Phase-correlation identity: CPS of an integer-shifted image has an
    impulse at the shift."""
    img = rng.random((32, 32)).astype(np.float32)
    shifted = np.roll(img, (3, 5), axis=(0, 1))
    fa = jnp.fft.fft2(jnp.asarray(shifted))
    fb = jnp.fft.fft2(jnp.asarray(img))
    r = np.asarray(jnp.real(jnp.fft.ifft2(cross_power_spectrum(fa, fb))))
    peak = np.unravel_index(np.argmax(r), r.shape)
    assert peak == (3, 5)
    assert r[peak] > 0.9


def test_fftshift2():
    x = jnp.arange(16.0).reshape(4, 4)
    np.testing.assert_allclose(
        np.asarray(fftshift2(x)), np.fft.fftshift(np.asarray(x))
    )


def test_fourier_filter_lowpass_smooths(rng):
    img = rng.random((32, 32)).astype(np.float32)
    out = np.asarray(fourier_filter(jnp.asarray(img), lp=0.15, hp=0.0, lps=0.05, hps=0.0))
    assert out.shape == img.shape
    # high-frequency energy reduced
    def hf_energy(x):
        s = np.fft.fftshift(np.abs(np.fft.fft2(x)))
        c = 16
        s[c - 4 : c + 4, c - 4 : c + 4] = 0
        return s.sum()

    assert hf_energy(out) < 0.5 * hf_energy(img)


def test_fftshift_signflip_centers_spectrum(rng):
    """(-1)^(i+j) premultiply == post-FFT fftshift (kernel.cu:871-891):
    for even dims, F{x * (-1)^(i+j)}[k] = F{x}[k - N/2]."""
    from multi_frame_super_resolution_tpu.ops.fourier import fftshift_signflip

    x = rng.random((8, 16)).astype(np.float32)
    flipped = np.asarray(fftshift_signflip(jnp.asarray(x)))
    got = np.fft.fft2(flipped)
    want = np.fft.fftshift(np.fft.fft2(x))
    np.testing.assert_allclose(got, want, atol=1e-4)
