import jax
import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.registration import (
    design_matrix,
    measurement_pairs,
    shifts_to_reference,
    solve_consistent_shifts,
)


def test_measurement_pairs():
    pairs = measurement_pairs(4, max_span=2)
    assert (0, 1) in pairs and (1, 2) in pairs and (2, 3) in pairs
    assert (0, 2) in pairs and (1, 3) in pairs
    assert (0, 3) not in pairs


def test_design_matrix():
    pairs = [(0, 1), (1, 2), (0, 2)]
    a = design_matrix(3, pairs)
    np.testing.assert_array_equal(a, [[1, 0], [0, 1], [1, 1]])


def _make_measurements(rng, num_frames, pairs, nty, ntx, noise=0.0):
    true = rng.uniform(-2, 2, size=(num_frames - 1, 2)).astype(np.float32)
    m = np.zeros((len(pairs), nty, ntx, 2), np.float32)
    for p, (i, j) in enumerate(pairs):
        m[p] = true[i:j].sum(0)
    m += rng.normal(0, noise, m.shape).astype(np.float32)
    return true, m


def test_solve_exact(rng):
    pairs = measurement_pairs(5, max_span=2)
    true, m = _make_measurements(rng, 5, pairs, 3, 4)
    s, w = jax.jit(
        lambda m: solve_consistent_shifts(m, 5, tuple(pairs))
    )(jnp.asarray(m))
    s = np.asarray(s)
    for t in range(3):
        for x in range(4):
            np.testing.assert_allclose(s[:, t, x], true, atol=1e-3)
    assert np.asarray(w).min() == 1.0  # nothing removed


def test_solve_rejects_outlier(rng):
    pairs = measurement_pairs(5, max_span=2)
    true, m = _make_measurements(rng, 5, pairs, 2, 2, noise=0.01)
    # corrupt one long-span measurement badly in one tile
    m[4, 0, 0] += np.array([5.0, -4.0])
    s, w = jax.jit(lambda m: solve_consistent_shifts(m, 5, tuple(pairs)))(
        jnp.asarray(m)
    )
    s = np.asarray(s)
    w = np.asarray(w)
    assert w[4, 0, 0] == 0.0  # outlier removed
    np.testing.assert_allclose(s[:, 0, 0], true, atol=0.1)
    # clean tiles untouched
    assert w[:, 1, 1].min() == 1.0


def test_shifts_to_reference():
    s = jnp.asarray(np.arange(3 * 1 * 1 * 2, dtype=np.float32).reshape(3, 1, 1, 2))
    out = np.asarray(shifts_to_reference(s, ref_index=1))
    # out[f] = csum[f] - csum[1]; csum = [0, s0, s0+s1, s0+s1+s2]
    np.testing.assert_allclose(out[1], 0.0)
    np.testing.assert_allclose(out[0, 0, 0], -np.asarray(s[0, 0, 0]))
    np.testing.assert_allclose(out[2, 0, 0], np.asarray(s[1, 0, 0]))
    np.testing.assert_allclose(out[3, 0, 0], np.asarray(s[1, 0, 0] + s[2, 0, 0]))
