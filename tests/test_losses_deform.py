"""Loss-stack and deformation-solve tests vs closed forms / torch reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acfm_video_3d_reconstruction_tpu.deform import (
    lbs_from_logits,
    screened_poisson_solve,
)
from acfm_video_3d_reconstruction_tpu.geometry import icosphere, mesh_ops
from acfm_video_3d_reconstruction_tpu.losses import losses as L


class TestBasicLosses:
    def test_iou_perfect(self):
        m = jnp.ones((2, 8, 8))
        np.testing.assert_allclose(L.iou_loss(m, m), 0.0, atol=1e-5)

    def test_iou_half(self):
        a = jnp.zeros((1, 4, 4)).at[:, :2].set(1.0)
        b = jnp.ones((1, 4, 4))
        np.testing.assert_allclose(L.iou_loss(a, b), 0.5, atol=1e-5)

    def test_l1_reduce_modes(self):
        a = jnp.zeros((3, 5, 5))
        b = jnp.ones((3, 5, 5)) * jnp.asarray([1.0, 2.0, 3.0])[:, None, None]
        per = L.l1_loss(a, b, reduce=False)
        np.testing.assert_allclose(per, [1.0, 2.0, 3.0], atol=1e-6)
        np.testing.assert_allclose(L.l1_loss(a, b), 2.0, atol=1e-6)

    def test_kp_loss_ignores_invisible(self):
        kp_gt = jnp.asarray([[[0.5, 0.5, 1.0], [0.9, 0.9, 0.0]]])
        kp_pred = jnp.asarray([[[0.5, 0.5], [0.0, 0.0]]])
        loss = L.kp_l2_loss(kp_pred, kp_gt)
        np.testing.assert_allclose(loss, 0.0, atol=1e-3)

    def test_camera_loss_zero_self(self):
        cam = jnp.asarray([[1.0, 0.1, -0.1, 1, 0, 0, 0]])
        np.testing.assert_allclose(L.camera_loss(cam, cam), 0.0, atol=1e-6)

    def test_entropy_loss_onehot_lowest(self):
        sharp = jnp.asarray([[1.0 - 1e-6, 1e-6 / 2, 1e-6 / 2]])
        flat = jnp.ones((1, 3)) / 3.0
        assert float(L.entropy_loss(sharp)) < float(L.entropy_loss(flat))

    def test_edt_loss(self):
        mask = jnp.zeros((1, 4, 4)).at[0, 0, 0].set(1.0)
        edt = jnp.ones((1, 1, 4, 4)) * 2.0
        np.testing.assert_allclose(L.edt_loss(mask, edt), 2.0 / 16.0, atol=1e-6)

    def test_deform_l2reg(self):
        V = jnp.ones((2, 3, 3))  # norm sqrt(3) each
        np.testing.assert_allclose(L.deform_l2reg(V), np.sqrt(3.0), rtol=1e-6)


class TestStructuralLosses:
    def setup_method(self):
        v, f = icosphere.icosphere(1)
        self.v = jnp.asarray(v, jnp.float32)
        self.f = np.asarray(f)
        self.edges = jnp.asarray(mesh_ops.compute_edges(self.f))

    def test_rigid_zero_on_template(self):
        batch = jnp.tile(self.v[None], (2, 1, 1))
        out = L.locally_rigid_loss(batch, batch, self.edges)
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    def test_rigid_positive_on_scaled(self):
        batch = jnp.tile(self.v[None], (2, 1, 1))
        out = L.locally_rigid_loss(batch * 1.1, batch, self.edges)
        assert float(out) > 0

    def test_template_edge_loss_zero(self):
        batch = jnp.tile(self.v[None], (2, 1, 1))
        np.testing.assert_allclose(
            L.template_edge_loss(batch, batch, self.edges), 0.0, atol=1e-6
        )

    def test_triangle_loss_flat_vs_sphere(self):
        e2v = jnp.asarray(mesh_ops.compute_edges2verts(self.f))
        sphere = float(L.triangle_loss(self.v[None], e2v))
        assert np.isfinite(sphere) and sphere > 0
        # a planar pair of triangles has exactly zero dihedral loss
        verts = jnp.asarray([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]])
        faces = np.asarray([[0, 1, 2], [1, 3, 2]])
        e2v_flat = jnp.asarray(mesh_ops.compute_edges2verts(faces))
        # only the shared edge has 2 opposite verts
        flat_loss = float(L.triangle_loss(verts[None], e2v_flat))
        np.testing.assert_allclose(flat_loss, 0.0, atol=1e-6)

    def test_boundaries_loss_vertex_on_boundary(self):
        proj = jnp.asarray([[[0.0, 0.0], [0.5, 0.5]]])
        bds = jnp.asarray([[[0.0, 0.0, 1.0], [0.5, 0.5, 1.0]]])
        vis = jnp.ones((1, 2))
        out = L.boundaries_loss(proj, bds, vis)
        np.testing.assert_allclose(out, 0.0, atol=1e-6)
        # invisible vertices are pushed far away
        out2 = L.boundaries_loss(proj, bds, jnp.zeros((1, 2)))
        assert float(out2) > 100


class TestOpticalFlowLoss:
    def test_static_scene_zero_flow(self):
        """A static mesh with zero GT flow gives ~zero loss."""
        v, f = icosphere.icosphere(1)
        verts = jnp.tile(jnp.asarray(v, jnp.float32)[None, None] * 0.5, (1, 2, 1, 1))
        cams = jnp.tile(jnp.asarray([[1.0, 0, 0, 1, 0, 0, 0]]), (2, 1))
        flows = jnp.zeros((1, 2, 16, 16, 2))
        loss, *_ = L.optical_flow_loss(
            verts, cams, flows, jnp.asarray(f, jnp.int32), 16, face_chunk=80
        )
        np.testing.assert_allclose(loss, 0.0, atol=1e-5)

    def test_translating_scene(self):
        """Mesh translated by known amount: zero loss iff GT flow matches."""
        v, f = icosphere.icosphere(1)
        base = jnp.asarray(v, jnp.float32) * 0.4
        shift = 0.25  # in [-1,1] units; = 0.25*W/2 pixels
        H = 16
        v0 = base + jnp.asarray([shift, 0.0, 0.0])
        v1 = base
        verts = jnp.stack([v0, v1])[None]
        cams = jnp.tile(jnp.asarray([[1.0, 0, 0, 1, 0, 0, 0]]), (2, 1))
        px = shift * H / 2.0
        # frame1 holds flow (current - next) = p0 - p1 = +shift
        flows = jnp.zeros((1, 2, H, H, 2)).at[:, 1, :, :, 0].set(px)
        loss_match, *_ = L.optical_flow_loss(
            verts, cams, flows, jnp.asarray(f, jnp.int32), H, face_chunk=80
        )
        flows_wrong = jnp.zeros((1, 2, H, H, 2)).at[:, 1, :, :, 0].set(-px)
        loss_wrong, *_ = L.optical_flow_loss(
            verts, cams, flows_wrong, jnp.asarray(f, jnp.int32), H, face_chunk=80
        )
        assert float(loss_match) < 0.1 * float(loss_wrong)


class TestScreenedPoisson:
    def setup_method(self):
        v, f = icosphere.icosphere(2)
        self.v = jnp.asarray(v, jnp.float32)
        self.f = np.asarray(f)
        self.L = jnp.asarray(mesh_ops.uniform_laplacian(self.f, len(v)))

    def _lbs(self, K=6):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(len(self.v), K)) * 2.0, jnp.float32)
        return lbs_from_logits(logits)

    def test_zero_offset_recovers_template(self):
        A = self._lbs()
        delta = jnp.zeros((3, A.shape[0], 3))
        out = screened_poisson_solve(self.v, A, delta, self.L)
        # 5e-3 bound: f32 normal-equation formation error amplified by the
        # system's conditioning; matches the reference's torch f32 path.
        np.testing.assert_allclose(out, jnp.tile(self.v[None], (3, 1, 1)), atol=5e-3)

    def test_matches_batched_torch_cholesky(self):
        torch = pytest.importorskip("torch")
        A = self._lbs()
        rng = np.random.default_rng(1)
        delta = jnp.asarray(rng.normal(size=(2, A.shape[0], 3)) * 0.05, jnp.float32)
        ours = np.asarray(screened_poisson_solve(self.v, A, delta, self.L))

        # reference formulation (monocular/main.py:212-218). Normal equations
        # are formed in f32 (as both implementations do), then solved in f64
        # so the comparison isolates formulation parity from solver noise.
        Lt = torch.from_numpy(np.asarray(self.L)).float()
        At = torch.from_numpy(np.asarray(A)).float()
        mv = torch.from_numpy(np.asarray(self.v)).float()
        target = At @ mv + torch.from_numpy(np.asarray(delta)).float()
        M = (Lt.T @ Lt + At.T @ At).double()
        b = (Lt.T @ (Lt @ mv) + torch.einsum("kv,bkc->bvc", At, target)).double()
        sol = torch.linalg.solve(M.unsqueeze(0).expand(2, -1, -1), b)
        np.testing.assert_allclose(ours, sol.numpy(), atol=2e-3)

    def test_gradients_flow(self):
        A = self._lbs()

        def loss(delta, mean_v):
            out = screened_poisson_solve(mean_v, A, delta, self.L)
            return (out**2).sum()

        delta = jnp.zeros((1, A.shape[0], 3))
        g1, g2 = jax.grad(loss, argnums=(0, 1))(delta, self.v)
        assert np.all(np.isfinite(np.asarray(g1)))
        assert np.abs(np.asarray(g2)).max() > 0


class TestDegenerateGradients:
    """Every norm-bearing loss must have FINITE gradients at degenerate
    geometry (collapsed edges, degenerate triangles, zero offsets):
    jnp.linalg.norm's VJP is NaN at 0 even behind a maximum() guard, which
    poisoned a 40-epoch multiframe run (epoch 29) before safe_norm."""

    def test_rigid_and_edge_losses_finite_at_collapsed_edge(self):
        v, f = icosphere.icosphere(1)
        edges = mesh_ops.compute_edges(f)
        verts = jnp.asarray(v, jnp.float32)[None]
        # collapse one edge exactly: both endpoints bitwise equal
        collapsed = verts.at[:, edges[0, 1]].set(verts[:, edges[0, 0]])
        for loss in (
            lambda x: L.locally_rigid_loss(x, verts, jnp.asarray(edges)),
            lambda x: L.template_edge_loss(x, x, jnp.asarray(edges)),
        ):
            g = jax.grad(loss)(collapsed)
            assert np.all(np.isfinite(np.asarray(g))), loss

    def test_triangle_loss_finite_at_degenerate_triangle(self):
        v, f = icosphere.icosphere(1)
        e2v = jnp.asarray(mesh_ops.compute_edges2verts(f))
        verts = jnp.asarray(v, jnp.float32)[None]
        # make the first dihedral's four vertices exactly collinear
        deg = verts.at[:, e2v[0, 1]].set(verts[:, e2v[0, 0]])
        deg = deg.at[:, e2v[0, 2]].set(verts[:, e2v[0, 0]])
        deg = deg.at[:, e2v[0, 3]].set(verts[:, e2v[0, 0]])
        g = jax.grad(lambda x: L.triangle_loss(x, e2v))(deg)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_deform_l2reg_finite_at_zero_offsets(self):
        V = jnp.zeros((2, 6, 3))
        g = jax.grad(lambda x: L.deform_l2reg(x))(V)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_quat_normalize_finite_at_zero(self):
        from acfm_video_3d_reconstruction_tpu.geometry import quaternion as Q

        g = jax.grad(lambda q: Q.quat_normalize(q).sum())(jnp.zeros((4,)))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_smoothing_losses_finite_on_flat_vertex(self):
        v, f = icosphere.icosphere(1)
        Lap = jnp.asarray(mesh_ops.uniform_laplacian(f, v.shape[0]))
        verts = jnp.asarray(v, jnp.float32)[None]
        # a vertex equal to the mean of its neighbors gives Lv == 0 rows;
        # simplest exact case: all vertices at one point
        flat = jnp.zeros_like(verts)
        g = jax.grad(
            lambda x: mesh_ops.uniform_laplacian_smoothing(x, Lap)
        )(flat)
        assert np.all(np.isfinite(np.asarray(g)))
        g2 = jax.grad(
            lambda x: mesh_ops.cot_laplacian_smoothing(x, jnp.asarray(f))
        )(flat)
        assert np.all(np.isfinite(np.asarray(g2)))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
