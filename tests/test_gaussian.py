"""Gaussian target encoding tests: host/device parity and radius properties."""

import numpy as np
import jax
import jax.numpy as jnp

from centernet_uda_tpu.ops.gaussian import (
    draw_gaussian,
    gaussian_2d,
    gaussian_radius,
    splat_gaussians,
)


def test_radius_monotone():
    small = gaussian_radius((10, 10))
    big = gaussian_radius((100, 100))
    assert 0 < small < big


def test_radius_known_value():
    # r must satisfy the CornerNet min-overlap quadratics; sanity anchor:
    r = gaussian_radius((24, 32), min_overlap=0.7)
    assert 3.0 < r < 12.0


def test_gaussian_2d_peak():
    g = gaussian_2d((7, 7), sigma=7 / 6)
    assert g[3, 3] == 1.0
    assert g.shape == (7, 7)
    assert np.all(g >= 0)


def test_draw_gaussian_clips_at_border():
    hm = np.zeros((16, 16), np.float32)
    draw_gaussian(hm, (0, 0), radius=3)
    assert hm[0, 0] == 1.0
    assert hm.max() == 1.0


def test_draw_gaussian_max_composited():
    hm = np.zeros((16, 16), np.float32)
    draw_gaussian(hm, (5, 5), radius=2)
    snapshot = hm.copy()
    draw_gaussian(hm, (7, 5), radius=2)
    # overlapping region takes the max, never sums
    assert np.all(hm >= snapshot)
    assert hm.max() == 1.0


def test_splat_matches_host_drawing():
    h, w, c, kmax = 32, 40, 3, 8
    rng = np.random.RandomState(0)
    centers = np.zeros((kmax, 2), np.int32)
    radii = np.zeros((kmax,), np.int32)
    classes = np.zeros((kmax,), np.int32)
    mask = np.zeros((kmax,), np.float32)

    want = np.zeros((h, w, c), np.float32)
    for k in range(5):
        x, y = rng.randint(0, w), rng.randint(0, h)
        r = rng.randint(1, 6)
        cls = rng.randint(0, c)
        centers[k] = (x, y)
        radii[k] = r
        classes[k] = cls
        mask[k] = 1.0
        draw_gaussian(want[:, :, cls], (x, y), r)

    got = np.asarray(
        splat_gaussians(
            jnp.asarray(centers), jnp.asarray(radii), jnp.asarray(classes),
            jnp.asarray(mask), h, w, c,
        )
    )
    # device computes the gaussian in float32, host in float64
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_splat_batch_vmap():
    f = jax.vmap(
        lambda c, r, cl, m: splat_gaussians(c, r, cl, m, 16, 16, 2)
    )
    out = f(
        jnp.zeros((4, 3, 2), jnp.int32),
        jnp.ones((4, 3), jnp.int32),
        jnp.zeros((4, 3), jnp.int32),
        jnp.ones((4, 3)),
    )
    assert out.shape == (4, 16, 16, 2)
