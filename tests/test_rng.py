"""Counter-based RNG: NumPy and JAX implementations must agree bit-exactly."""

import numpy as np

from polaris_tpu.ops import rng


def test_np_jnp_bit_equality():
    import jax.numpy as jnp

    pix = np.arange(1000, dtype=np.uint32)
    for seed in (0, 1, 12345):
        for sample in (0, 7):
            for counter in (0, 63, 9999):
                a = rng.np_uniform(seed, pix, sample, counter)
                b = np.asarray(rng.jnp_uniform(seed, jnp.asarray(pix), sample, counter))
                assert a.dtype == np.float32
                np.testing.assert_array_equal(a, b)


def test_uniform_range_and_distribution():
    pix = np.arange(200_000, dtype=np.uint32)
    u = rng.np_uniform(7, pix, 0, 3)
    assert u.min() >= 0.0 and u.max() < 1.0
    # roughly uniform
    hist, _ = np.histogram(u, bins=16, range=(0, 1))
    assert hist.min() > 0.8 * len(pix) / 16
    assert hist.max() < 1.2 * len(pix) / 16


def test_streams_decorrelated():
    pix = np.arange(10_000, dtype=np.uint32)
    a = rng.np_uniform(0, pix, 0, 0)
    b = rng.np_uniform(0, pix, 0, 1)
    c = rng.np_uniform(0, pix, 1, 0)
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.05
    assert abs(np.corrcoef(a, c)[0, 1]) < 0.05


def test_make_uniform_layout():
    pix = np.arange(16, dtype=np.uint32)
    U = rng.make_uniform(rng.np_uniform, 5, pix, 2, 3)
    direct = rng.np_uniform(5, pix, 2, 3 * 64 + 7)
    np.testing.assert_array_equal(U(7), direct)
