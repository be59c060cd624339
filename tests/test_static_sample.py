"""Static-coordinate bilinear sampler: exact parity with the generic
grid_sample in BOTH directions (the backward replaces a scatter-add with a
precomputed-inverse gather)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from acfm_video_3d_reconstruction_tpu.ops.grid_sample import grid_sample  # noqa: E402
from acfm_video_3d_reconstruction_tpu.ops.static_sample import (  # noqa: E402
    make_static_bilinear,
)


@pytest.mark.parametrize("seed", [0, 1])
def test_forward_matches_grid_sample(seed):
    rng = np.random.default_rng(seed)
    H, W, B, P = 16, 24, 3, 200
    img = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32))
    coords = rng.uniform(-0.99, 0.99, (P, 2)).astype(np.float32)

    sampler = make_static_bilinear(coords, H, W, align_corners=True)
    out = sampler(img)
    flow = jnp.broadcast_to(jnp.asarray(coords)[None], (B, P, 2))
    ref = grid_sample(img, flow, align_corners=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_backward_matches_grid_sample():
    rng = np.random.default_rng(2)
    H, W, B, P = 12, 20, 2, 150
    img = jnp.asarray(rng.random((B, H, W, 2)).astype(np.float32))
    coords = rng.uniform(-0.99, 0.99, (P, 2)).astype(np.float32)
    ct = jnp.asarray(rng.random((B, P, 2)).astype(np.float32))

    sampler = make_static_bilinear(coords, H, W, align_corners=True)
    flow = jnp.broadcast_to(jnp.asarray(coords)[None], (B, P, 2))

    g_new = jax.grad(lambda im: (sampler(im) * ct).sum())(img)
    g_ref = jax.grad(
        lambda im: (grid_sample(im, flow, align_corners=True) * ct).sum()
    )(img)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), atol=1e-5)


def test_points_on_pixel_centers_and_borders():
    """Degenerate coords (exact pixel centers, +-1 borders) stay exact."""
    H, W = 8, 8
    ys, xs = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    coords = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)
    img = jnp.arange(H * W, dtype=jnp.float32).reshape(1, H, W, 1)
    sampler = make_static_bilinear(coords, H, W, align_corners=True)
    out = np.asarray(sampler(img)).reshape(H * W)
    np.testing.assert_allclose(out, np.arange(H * W), atol=1e-4)
    # gradient sums to the cotangent total (conservation)
    g = jax.grad(lambda im: sampler(im).sum())(img)
    assert float(jnp.sum(g)) == pytest.approx(H * W, rel=1e-5)
