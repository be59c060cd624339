"""Unit tests for geometry primitives vs closed forms / numpy references."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acfm_video_3d_reconstruction_tpu.geometry import (
    camera,
    geodesic,
    icosphere,
    mesh_ops,
    quaternion as quat,
    symmetry,
)


def rand_unit_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternion:
    def test_hamilton_identity(self):
        rng = np.random.default_rng(0)
        q = rand_unit_quat(rng, (5,))
        e = np.zeros((5, 4))
        e[:, 0] = 1.0
        out = quat.hamilton_product(jnp.asarray(e), jnp.asarray(q))
        np.testing.assert_allclose(out, q, atol=1e-6)

    def test_rotate_matches_matrix(self):
        rng = np.random.default_rng(1)
        q = rand_unit_quat(rng, (3,))
        X = rng.normal(size=(3, 7, 3))
        R = np.asarray(quat.quat_to_matrix(jnp.asarray(q)))
        expected = np.einsum("bij,bnj->bni", R, X)
        out = quat.quat_rotate(jnp.asarray(X), jnp.asarray(q))
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_matrix_quat_roundtrip(self):
        rng = np.random.default_rng(2)
        q = rand_unit_quat(rng, (16,))
        q = np.asarray(quat.standardize_quaternion(jnp.asarray(q)))
        q2 = quat.matrix_to_quat(quat.quat_to_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(q2, q, atol=1e-5)

    def test_geodesic_loss_zero_for_same(self):
        rng = np.random.default_rng(3)
        q = jnp.asarray(rand_unit_quat(rng, (4,)))
        loss = quat.quat_geodesic_loss(q, q)
        np.testing.assert_allclose(loss, 0.0, atol=1e-6)
        # sign flip is the same rotation
        loss2 = quat.quat_geodesic_loss(q, -q)
        np.testing.assert_allclose(loss2, 0.0, atol=1e-6)

    def test_mirror_quat_is_rotation_composition(self):
        rng = np.random.default_rng(4)
        q = jnp.asarray(rand_unit_quat(rng, (6,)))
        Rm = np.asarray(quat.quat_to_matrix(quat.mirror_quat(q)))
        R = np.asarray(quat.quat_to_matrix(q))
        D = np.diag([-1.0, 1.0, -1.0])
        np.testing.assert_allclose(Rm, np.einsum("ij,bjk->bik", D, R), atol=1e-5)


class TestCamera:
    def test_identity_cam(self):
        X = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 3)))
        cam = jnp.tile(jnp.asarray([1.0, 0, 0, 1, 0, 0, 0]), (2, 1))
        proj = camera.orthographic_proj_withz(X, cam, offset_z=5.0)
        np.testing.assert_allclose(proj[..., :2], X[..., :2], atol=1e-6)
        np.testing.assert_allclose(proj[..., 2], X[..., 2] + 5.0, atol=1e-6)

    def test_scale_trans(self):
        X = jnp.ones((1, 1, 3))
        cam = jnp.asarray([[2.0, 0.5, -0.25, 1, 0, 0, 0]])
        proj = camera.project_points(X, cam)
        np.testing.assert_allclose(proj[0, 0], [2.5, 1.75], atol=1e-6)

    def test_mirror_camera_consistency(self):
        """Mirroring camera == mirroring the projected points' x coords."""
        rng = np.random.default_rng(5)
        X = jnp.asarray(rng.normal(size=(3, 10, 3)))
        q = rand_unit_quat(rng, (3,))
        cam = jnp.concatenate(
            [jnp.ones((3, 1)), jnp.asarray(rng.normal(size=(3, 2)) * 0.1), jnp.asarray(q)],
            axis=-1,
        )
        cam_m = camera.mirror_camera(cam, jnp.ones((3,)))
        proj = camera.project_points(X, cam)
        proj_m = camera.project_points(X, cam_m)
        # diag(-1,1,-1) rotation flips x of rotated points; plus tx -> -tx:
        np.testing.assert_allclose(proj_m[..., 0], -proj[..., 0], atol=1e-5)
        np.testing.assert_allclose(proj_m[..., 1], proj[..., 1], atol=1e-5)

    def test_transform_camera_flag_off_is_identity(self):
        cam = jnp.asarray([[1.5, 0.1, -0.2, 1, 0, 0, 0]])
        t = jnp.asarray([[2.0, 0.3, 0.4, 0.0]])
        np.testing.assert_allclose(camera.transform_camera(cam, t), cam)

    def test_az_el_decode_unit_quat(self):
        raw = jnp.asarray(np.random.default_rng(6).normal(size=(4, 6)))
        cams = camera.decode_az_el_camera(raw)
        n = jnp.linalg.norm(cams[..., 3:7], axis=-1)
        np.testing.assert_allclose(n, 1.0, atol=1e-5)


class TestIcosphere:
    def test_counts(self):
        v, f = icosphere.icosphere(3)
        assert v.shape == (642, 3)
        assert f.shape == (1280, 3)

    def test_unit_norm(self):
        v, _ = icosphere.icosphere(2)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-12)

    def test_watertight(self):
        v, f = icosphere.icosphere(2)
        # Every edge appears in exactly 2 faces.
        e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        e = np.sort(e, axis=1)
        _, counts = np.unique(e, axis=0, return_counts=True)
        assert np.all(counts == 2)

    def test_exact_mirror_symmetry(self):
        v, _ = icosphere.icosphere(3)
        mirrored = v * np.array([-1.0, 1.0, 1.0])
        a = v[np.lexsort(v.T)]
        b = mirrored[np.lexsort(mirrored.T)]
        assert np.array_equal(a, b)


class TestSymmetry:
    def test_make_symmetric_layout(self):
        v, f = icosphere.icosphere(2)
        sym = symmetry.make_symmetric(v, f)
        ni, ns = sym.num_indept, sym.num_sym
        assert ni + 2 * ns == len(v)
        assert np.all(sym.verts[:ni, 0] == 0)
        assert np.all(sym.verts[ni:ni + ns, 0] > 0)
        np.testing.assert_array_equal(
            sym.verts[ni + ns:], sym.verts[ni:ni + ns] * np.array([-1.0, 1.0, 1.0])
        )
        assert sym.num_indept_faces + 2 * sym.num_sym_faces == len(f)

    def test_symmetric_faces_mirror(self):
        v, f = icosphere.icosphere(2)
        sym = symmetry.make_symmetric(v, f)
        nif, nsf = sym.num_indept_faces, sym.num_sym_faces
        right = sym.faces[nif:nif + nsf]
        left = sym.faces[nif + nsf:]
        flip = sym.verts * np.array([-1.0, 1.0, 1.0])
        # left face verts == mirrored right face verts (same order)
        np.testing.assert_allclose(sym.verts[left], flip[right], atol=0)

    def test_symmetrize_roundtrip(self):
        v, f = icosphere.icosphere(2)
        sym = symmetry.make_symmetric(v, f)
        half = jnp.asarray(sym.verts[: sym.num_learnable])
        full = symmetry.symmetrize(half, sym.num_sym)
        np.testing.assert_allclose(full, sym.verts, atol=1e-7)


class TestMeshOps:
    def test_uniform_laplacian_rows(self):
        v, f = icosphere.icosphere(1)
        L = mesh_ops.uniform_laplacian(f, len(v))
        np.testing.assert_allclose(np.diag(L), -1.0)
        np.testing.assert_allclose(L.sum(1), 0.0, atol=1e-6)

    def test_uniform_laplacian_sphere_points_inward(self):
        v, f = icosphere.icosphere(2)
        L = mesh_ops.uniform_laplacian(f, len(v))
        Lv = L @ v
        # L v = centroid(neighbors) - v: points toward origin on a sphere.
        cos = np.sum(Lv * (-v), axis=1) / np.maximum(np.linalg.norm(Lv, axis=1), 1e-9)
        assert np.all(cos > 0.8)

    def test_cot_laplacian_symmetric_rowsum(self):
        v, f = icosphere.icosphere(2)
        L = np.asarray(mesh_ops.cot_laplacian(jnp.asarray(v), jnp.asarray(f)))
        np.testing.assert_allclose(L, L.T, atol=1e-5)
        np.testing.assert_allclose(L.sum(1), 0.0, atol=1e-4)

    def test_cot_smoothing_zero_grad_direction(self):
        v, f = icosphere.icosphere(1)
        loss = mesh_ops.cot_laplacian_smoothing(jnp.asarray(v)[None], jnp.asarray(f))
        assert np.isfinite(float(loss))

    def test_uvsampler_shape_range(self):
        v, f = icosphere.icosphere(1)
        uv = mesh_ops.compute_uvsampler(v, f, tex_size=4)
        assert uv.shape == (len(f), 4, 4, 2)
        assert uv.min() >= -1.0 - 1e-9 and uv.max() <= 1.0 + 1e-9

    def test_edges2verts(self):
        v, f = icosphere.icosphere(1)
        e2v = mesh_ops.compute_edges2verts(f)
        E = len(mesh_ops.compute_edges(f))
        assert e2v.shape == (E, 4)


class TestGeodesic:
    def test_distance_symmetric_zero_diag(self):
        v, f = icosphere.icosphere(1)
        d = geodesic.geodesic_distance_matrix(v, f)
        np.testing.assert_allclose(d, d.T, atol=1e-9)
        np.testing.assert_allclose(np.diag(d), 0.0)

    def test_fps_spread(self):
        v, f = icosphere.icosphere(2)
        d = geodesic.geodesic_distance_matrix(v, f)
        idx = geodesic.farthest_point_sampling(d, 7)
        assert len(np.unique(idx)) == 8
        # FPS picks should be mutually far apart: min pairwise distance is a
        # decent fraction of the sphere diameter.
        sub = d[np.ix_(idx, idx)]
        np.fill_diagonal(sub, np.inf)
        assert sub.min() > 0.5

    def test_lbs_init_shapes(self):
        v, f = icosphere.icosphere(2)
        logits, idx = geodesic.init_lbs_logits(v, f, num_lbs=8)
        assert logits.shape == (len(v), 8)
        assert np.all(np.isfinite(logits))
        w = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=0))
        # each handle's own vertex carries the (possibly tied) max weight
        col_max = w.max(axis=0)
        np.testing.assert_allclose(w[idx, np.arange(8)], col_max, rtol=1e-5)

    def test_vert2kp_inits(self):
        v, f = icosphere.icosphere(1)
        # offset points slightly so no vertex coincides exactly (the
        # reference's SfM kp locations never coincide with mesh verts)
        kp_pts = v[[0, 5, 10]] * 1.05
        logits = geodesic.init_vert2kp_logits_from_points(v, kp_pts)
        assert logits.shape == (3, len(v))
        w = jax.nn.softmax(jnp.asarray(logits), axis=1)
        np.testing.assert_array_equal(np.asarray(jnp.argmax(w, axis=1)), [0, 5, 10])
        logits2 = geodesic.init_vert2kp_logits_from_dict(v, [[0], [5], [10]])
        assert np.all(np.isfinite(logits2))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
