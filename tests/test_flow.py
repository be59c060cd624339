"""Flow subsystem tests: correlation/deform-conv/warp vs torch, net shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acfm_video_3d_reconstruction_tpu.flow import maskflownet as mfn
from acfm_video_3d_reconstruction_tpu.flow import ops


class TestCorrelation:
    def test_matches_naive(self):
        rng = np.random.default_rng(0)
        f1 = rng.normal(size=(2, 6, 7, 8)).astype(np.float32)
        f2 = rng.normal(size=(2, 6, 7, 8)).astype(np.float32)
        md = 2
        out = np.asarray(ops.correlation(jnp.asarray(f1), jnp.asarray(f2), md))
        assert out.shape == (2, 6, 7, 25)
        f2p = np.pad(f2, [(0, 0), (md, md), (md, md), (0, 0)])
        for dy in (-2, 0, 1):
            for dx in (-1, 0, 2):
                ch = (dy + md) * (2 * md + 1) + (dx + md)
                expect = (
                    f1 * f2p[:, md + dy : md + dy + 6, md + dx : md + dx + 7]
                ).mean(-1)
                np.testing.assert_allclose(out[..., ch], expect, atol=1e-5)

    def test_zero_displacement_is_inner(self):
        rng = np.random.default_rng(1)
        f = rng.normal(size=(1, 4, 4, 16)).astype(np.float32)
        out = np.asarray(ops.correlation(jnp.asarray(f), jnp.asarray(f), 4))
        center = out[..., 40]  # (4+4)*9/... md=4 -> ch (4)*9+(4) = 40
        np.testing.assert_allclose(center, (f * f).mean(-1), atol=1e-5)


def _deform_conv2d_oracle(x, offsets, w, b, padding=1):
    """Scalar-loop oracle for torchvision deform_conv2d(k=3, s=1) semantics
    (NCHW; offsets (B, 18, H, W) = per-tap (dy, dx) interleaved, taps
    row-major; bilinear sampling with zero outside the image). Used when
    torchvision itself is not installed so the parity test always runs."""
    B, C, H, W = x.shape
    O = w.shape[0]
    out = np.tile(b[None, :, None, None], (B, 1, H, W)).astype(np.float64)
    for bi in range(B):
        for oy in range(H):
            for ox in range(W):
                for k in range(9):
                    ky, kx = k // 3, k % 3
                    py = oy - padding + ky + offsets[bi, 2 * k, oy, ox]
                    px = ox - padding + kx + offsets[bi, 2 * k + 1, oy, ox]
                    y0, x0 = int(np.floor(py)), int(np.floor(px))
                    wy, wx = py - y0, px - x0
                    v = np.zeros(C)
                    for yy, cy in ((y0, 1 - wy), (y0 + 1, wy)):
                        for xx, cx in ((x0, 1 - wx), (x0 + 1, wx)):
                            if 0 <= yy < H and 0 <= xx < W:
                                v += cy * cx * x[bi, :, yy, xx]
                    out[bi, :, oy, ox] += w[:, :, ky, kx] @ v
    return out


class TestDeformConv:
    def test_matches_torchvision(self):
        rng = np.random.default_rng(0)
        B, H, W, C, O = 2, 5, 6, 4, 3
        x = rng.normal(size=(B, C, H, W)).astype(np.float32)
        offsets = (rng.normal(size=(B, 18, H, W)) * 0.7).astype(np.float32)
        w = rng.normal(size=(O, C, 3, 3)).astype(np.float32)
        b = rng.normal(size=(O,)).astype(np.float32)
        try:
            import torch
            from torchvision.ops import deform_conv2d

            ref = deform_conv2d(
                torch.from_numpy(x), torch.from_numpy(offsets),
                torch.from_numpy(w), torch.from_numpy(b), padding=1,
            ).numpy()
        except ImportError:
            # torchvision is absent in this environment — fall back to the
            # self-contained oracle (same documented semantics) so this
            # parity test never silently skips out of the fast tier.
            ref = _deform_conv2d_oracle(x, offsets, w, b).astype(np.float32)
        ours = ops.deform_conv3x3(
            jnp.asarray(np.moveaxis(x, 1, -1)),
            jnp.asarray(np.moveaxis(offsets, 1, -1)),
            jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            jnp.asarray(b),
        )
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(ours), -1, 1), ref, atol=2e-4
        )


class TestWarpResample:
    def test_zero_flow_identity(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
        out = ops.backward_warp(x, jnp.zeros((1, 8, 8, 2)))
        np.testing.assert_allclose(out, x, atol=1e-5)

    def test_integer_shift(self):
        x = jnp.zeros((1, 8, 8, 1)).at[0, 2, 3, 0].set(1.0)
        flow = jnp.ones((1, 8, 8, 2)) * jnp.asarray([1.0, 0.0])  # u=1
        out = np.asarray(ops.backward_warp(x, flow))
        assert out[0, 2, 2, 0] == pytest.approx(1.0)

    def test_upsample_constant(self):
        x = jnp.ones((1, 4, 4, 2)) * 3.0
        up = np.asarray(ops.upsample2d_flow(x, 2))
        assert up.shape == (1, 8, 8, 2)
        # interior preserved for constant input
        np.testing.assert_allclose(up[0, 2:-2, 2:-2], 3.0, atol=1e-5)

    def test_downsample_constant(self):
        x = jnp.ones((1, 8, 8, 2)) * 5.0
        dn = np.asarray(ops.downsample2d_flow(x, 2))
        assert dn.shape == (1, 4, 4, 2)
        np.testing.assert_allclose(dn, 5.0, atol=1e-5)


class TestMaskFlownet:
    @pytest.mark.heavy
    def test_stage1_shapes(self):
        params = mfn.init_params(jax.random.PRNGKey(0))
        im = jnp.zeros((1, 64, 128, 3))
        preds, occ, srcs = mfn.maskflownet_s(params["s"], im, im)
        assert len(preds) == 5
        assert preds[-1].shape == (1, 16, 32, 2)  # stride 4
        assert preds[0].shape == (1, 1, 2, 2)     # stride 64
        assert occ[0].shape == (1, 16, 32, 1)
        c1, c2, flows, c30, c40 = srcs
        assert c30.shape == (1, 64, 128, 4) and c40.shape == (1, 64, 128, 4)

    @pytest.mark.heavy
    def test_full_net_shapes(self):
        params = mfn.init_params(jax.random.PRNGKey(0))
        im = jnp.asarray(
            np.random.default_rng(0).random((1, 64, 128, 3)).astype(np.float32)
        )
        preds, visuals, _ = mfn.maskflownet(params, im, im)
        assert preds[-1].shape == (1, 16, 32, 2)
        assert np.all(np.isfinite(np.asarray(preds[-1])))

    @pytest.mark.heavy
    def test_identical_frames_small_flow(self):
        """Same image twice with a well-formed net -> finite, modest flow."""
        params = mfn.init_params(jax.random.PRNGKey(1))
        im = jnp.asarray(
            np.random.default_rng(1).random((1, 64, 64, 3)).astype(np.float32)
        )
        preds, _, _ = mfn.maskflownet_s(params["s"], im, im)
        up = ops.upsample2d_flow(preds[-1], 4)
        assert up.shape == (1, 64, 64, 2)
        assert np.all(np.isfinite(np.asarray(up)))


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
