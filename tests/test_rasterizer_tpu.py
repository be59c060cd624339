"""Golden tests: Pallas binned rasterizer vs the pure-JAX reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acfm_video_3d_reconstruction_tpu.geometry import camera, icosphere
from acfm_video_3d_reconstruction_tpu.ops import rasterizer as ref
from acfm_video_3d_reconstruction_tpu.ops import rasterizer_tpu as tpu

IMG = 32
INTERP = True  # interpret mode on CPU


@pytest.fixture(scope="module")
def scene():
    v, f = icosphere.icosphere(2)
    cams = jnp.asarray(
        [
            [0.9, 0.05, -0.05, 1.0, 0.0, 0.0, 0.0],
            [0.7, -0.1, 0.1, 0.9238795, 0.0, 0.3826834, 0.0],
        ]
    )
    proj = camera.orthographic_proj_withz(
        jnp.asarray(v, jnp.float32)[None].repeat(2, 0) * 0.7, cams, offset_z=5.0
    )
    return proj, jnp.asarray(f, jnp.int32)


class TestForwardParity:
    def test_soft_mask_matches_reference(self, scene):
        proj, faces = scene
        mask_ref, p2f_ref = ref.soft_silhouette(proj, faces, IMG, face_chunk=80)
        mask_tpu, p2f_tpu, vis_tpu = tpu.soft_silhouette_tpu(
            proj, faces, IMG, 320, interpret=INTERP
        )
        np.testing.assert_allclose(
            np.asarray(mask_tpu), np.asarray(mask_ref), atol=2e-4
        )
        # pix_to_face agrees everywhere (same z ordering)
        agree = (np.asarray(p2f_tpu) == np.asarray(p2f_ref)).mean()
        assert agree > 0.999, agree

    def test_hard_matches_reference(self, scene):
        proj, faces = scene
        frags = ref.hard_rasterize(proj, faces, IMG, face_chunk=80)
        B = proj.shape[0]
        p2f_ref = np.asarray(frags.pix_to_face).reshape(B, IMG, IMG)
        out = tpu.hard_rasterize_tpu(proj, faces, IMG, 320, interpret=INTERP)
        agree = (np.asarray(out.pix_to_face) == p2f_ref).mean()
        assert agree > 0.999, agree
        bary_ref = np.asarray(frags.bary).reshape(B, IMG, IMG, 3)
        cov = p2f_ref >= 0
        np.testing.assert_allclose(
            np.asarray(out.bary)[cov], bary_ref[cov], atol=1e-4
        )


@pytest.mark.heavy
class TestBinnedAtlas:
    def test_matches_flat_gather(self, scene):
        proj, faces = scene
        frags = tpu.hard_rasterize_tpu(proj, faces, IMG, 320, interpret=INTERP)
        rng = np.random.default_rng(0)
        atlas = jnp.asarray(
            rng.random((2, faces.shape[0], 4, 4, 3)).astype(np.float32)
        )
        B = 2
        rgb_flat, cov_flat = ref.sample_atlas(
            atlas, frags.pix_to_face.reshape(B, -1), frags.bary.reshape(B, -1, 3)
        )
        rgb_bin, cov_bin = tpu.sample_atlas_binned(atlas, frags, IMG)
        np.testing.assert_array_equal(
            np.asarray(cov_bin), np.asarray(cov_flat).reshape(B, IMG, IMG)
        )
        # bf16 matmul path: tolerance at bf16 epsilon on [0,1] colors
        np.testing.assert_allclose(
            np.asarray(rgb_bin),
            np.asarray(rgb_flat).reshape(B, IMG, IMG, 3),
            atol=1.6e-2,
        )

    def test_atlas_grads_match(self, scene):
        proj, faces = scene
        frags = tpu.hard_rasterize_tpu(proj, faces, IMG, 320, interpret=INTERP)
        B = 2
        w = jax.random.uniform(jax.random.PRNGKey(1), (B, IMG, IMG, 3))

        def loss_flat(a):
            rgb, _ = ref.sample_atlas(
                a, frags.pix_to_face.reshape(B, -1), frags.bary.reshape(B, -1, 3)
            )
            return (rgb.reshape(B, IMG, IMG, 3) * w).sum()

        def loss_bin(a):
            rgb, _ = tpu.sample_atlas_binned(a, frags, IMG)
            return (rgb * w).sum()

        atlas = jnp.full((B, faces.shape[0], 4, 4, 3), 0.5)
        g1 = np.asarray(jax.grad(loss_flat)(atlas))
        g2 = np.asarray(jax.grad(loss_bin)(atlas))
        np.testing.assert_allclose(g2, g1, atol=0.05, rtol=2e-2)

    def test_chunked_matmul_matches_one_shot(self):
        """The tile-chunked path (view count above _ATLAS_PAIR_BUDGET)
        is bit-identical to the fully vectorized one-shot path, values
        and atlas gradients."""
        rng = np.random.default_rng(3)
        B, T, P, K, ncell, C = 5, 8, 64, 12, 4, 3
        slot = jnp.asarray(rng.integers(-1, K, (B, T, P)), jnp.int32)
        cell = jnp.asarray(rng.integers(0, ncell, (B, T, P)), jnp.int32)
        slots = jnp.asarray(rng.random((B, T, K, ncell * C)), jnp.float32)

        def run(budget, s):
            return tpu._atlas_matmul(slot, s, cell, K, ncell, C,
                                     pair_budget=budget)

        one = run(B * T, slots)           # single-shot
        for budget in (B, 2 * B, 4 * B):  # tc = 1, 2, 4 tile chunks
            np.testing.assert_array_equal(
                np.asarray(run(budget, slots)), np.asarray(one)
            )
        g_one = jax.grad(lambda s: (run(B * T, s) ** 2).sum())(slots)
        g_chk = jax.grad(lambda s: (run(B, s) ** 2).sum())(slots)
        np.testing.assert_array_equal(np.asarray(g_chk), np.asarray(g_one))


class TestBackwardParity:
    @pytest.mark.heavy
    def test_grad_matches_reference(self, scene):
        """Grad parity at a well-conditioned sigma.

        At the production sigma=1e-4 the gradient is ill-conditioned: the
        1/sigma factor amplifies sub-ULP op-ordering differences in the
        signed distances into O(1) per-vertex gradient differences near
        silhouette edges (three independent implementations — dense, scan,
        pallas — all disagree pairwise there while agreeing on the forward
        to 1e-6; PyTorch3D shares this property). A larger sigma validates
        the VJP structure; the exact-match case is covered by the
        single-tile scene in tools/dbg_raster_bwd.py.
        """
        proj, faces = scene
        w = jax.random.uniform(jax.random.PRNGKey(0), (2, IMG, IMG))
        # blur >> sigma so the in-radius cutoff contribution (log_sigmoid
        # (blur/sigma) ~ -6e-6) is below tolerance: f32 op-ordering near the
        # cutoff then cannot flip O(0.1) gradient terms.
        sigma, blur = 5e-3, 6e-2

        def loss_ref(p):
            m, _ = ref.soft_silhouette(
                p, faces, IMG, face_chunk=80, sigma=sigma, blur_radius=blur,
                impl="ref",
            )
            return (m * w).sum()

        def loss_tpu(p):
            m, _, _ = tpu.soft_silhouette_tpu(
                p, faces, IMG, 320, sigma, blur, interpret=INTERP
            )
            return (m * w).sum()

        g_ref = np.asarray(jax.grad(loss_ref)(proj))
        g_tpu = np.asarray(jax.grad(loss_tpu)(proj))
        # Per-element grad comparison is meaningless at edge-on faces (the
        # `inside` predicate flips under 1-ULP perturbation and the slope
        # sign with it — two pure-XLA implementations differ by O(0.5)
        # there too). Vector-level relative error still catches any
        # structural error (wrong scatter/tiling => rel err ~ 1).
        rel = np.linalg.norm(g_tpu - g_ref) / np.linalg.norm(g_ref)
        assert rel < 0.05, rel

    @pytest.mark.heavy
    def test_grad_exact_single_tile(self):
        """Exact grad parity when numerics are order-identical (1 tile)."""
        v, f = icosphere.icosahedron()
        proj = camera.orthographic_proj_withz(
            jnp.asarray(v, jnp.float32)[None] * 0.7,
            jnp.asarray([[0.9, 0.05, -0.05, 1.0, 0, 0, 0]]), offset_z=5.0,
        )
        faces = jnp.asarray(f, jnp.int32)
        w = jnp.ones((1, 8, 8))
        sigma, blur = 5e-3, 6e-2  # conditioning: see docstring above

        def loss_ref(p):
            m, _ = ref.soft_silhouette(
                p, faces, 8, face_chunk=20, sigma=sigma, blur_radius=blur,
                impl="ref",
            )
            return (m * w).sum()

        def loss_tpu(p):
            m, _, _ = tpu.soft_silhouette_tpu(
                p, faces, 8, 20, sigma, blur, interpret=INTERP
            )
            return (m * w).sum()

        g_ref = np.asarray(jax.grad(loss_ref)(proj))
        g_tpu = np.asarray(jax.grad(loss_tpu)(proj))
        rel = np.linalg.norm(g_tpu - g_ref) / np.linalg.norm(g_ref)
        assert rel < 0.05, rel


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestBinOverflow:
    def test_no_overflow_at_bench_config(self):
        """The bench mesh (642v/1280f icosphere at 256^2) must not drop
        faces under the default K for either the soft (256) or hard (192)
        kernels — guards the silent top-K truncation."""
        from acfm_video_3d_reconstruction_tpu.geometry import icosphere as ico

        v, f = ico.icosphere(3)
        cams = jnp.asarray([[0.9, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]])
        proj = camera.orthographic_proj_withz(
            jnp.asarray(v, jnp.float32)[None] * 0.7, cams, offset_z=5.0
        )
        faces = jnp.asarray(f, jnp.int32)
        for K in (256, 192):
            ovf = tpu.bin_overflow_counts(proj, faces, 256, K)
            assert int(np.asarray(ovf).max()) == 0, (K, np.asarray(ovf).max())

    def test_face_table_compaction_semantics(self, scene):
        """The binning stream-compacts each tile's overlapping faces to a
        K-prefix in ascending face-index order, -1 padded; on overflow the
        K lowest face indices win (same contract the old top_k-by-
        (overlap, -rank) formulation had)."""
        proj, faces = scene
        bh, bw, _ = tpu._pick_layout(IMG)
        for K in (64, 128):
            tab, idx = tpu._face_tables(
                proj, faces, IMG, bh, bw, K, margin=0.1
            )
            ov = np.asarray(
                tpu._tile_overlap(proj, faces, IMG, bh, bw, 0.1)
            )
            idx = np.asarray(idx)
            for b in range(idx.shape[0]):
                for t in range(idx.shape[1]):
                    want = np.nonzero(ov[b, t])[0][:K]
                    got = idx[b, t]
                    np.testing.assert_array_equal(got[: len(want)], want)
                    assert (got[len(want):] == -1).all()

    def test_overflow_detected_when_k_too_small(self):
        from acfm_video_3d_reconstruction_tpu.geometry import icosphere as ico

        v, f = ico.icosphere(3)
        cams = jnp.asarray([[0.9, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]])
        proj = camera.orthographic_proj_withz(
            jnp.asarray(v, jnp.float32)[None] * 0.7, cams, offset_z=5.0
        )
        ovf = tpu.bin_overflow_counts(proj, jnp.asarray(f, jnp.int32), 256, 8)
        assert int(np.asarray(ovf).max()) > 0

    def test_auto_k_prevents_small_image_overflow(self):
        """auto_K must cover the measured per-tile overlap at every image
        size the trainers/tests use (the silent top-K drop found in round
        2 produced block holes in 64-128^2 renders)."""
        from acfm_video_3d_reconstruction_tpu.geometry import icosphere as ico

        v, f = ico.icosphere(3)
        faces = jnp.asarray(f, jnp.int32)
        for S in (64, 96, 128, 192, 256):
            for scale in (0.5, 0.75, 0.9, 1.1):
                cams = jnp.asarray([[scale, 0.05, -0.05, 1.0, 0.0, 0.0, 0.0]])
                proj = camera.orthographic_proj_withz(
                    jnp.asarray(v, jnp.float32)[None] * 0.7, cams, offset_z=5.0
                )
                K = tpu.auto_K(f.shape[0], S, 192)
                ovf = tpu.bin_overflow_counts(proj, faces, S, K)
                assert int(np.asarray(ovf).max()) == 0, (S, scale, K)

    def test_auto_k_no_overflow_at_512_1024_frame_filling(self):
        """VERDICT r2 #6: assert zero bin overflow one octave up — a
        frame-filling 1280-face mesh at 512^2 and 1024^2 across object
        scales, under auto_K's chosen capacity (K picked from measurement
        at the worst case 256^2, not extrapolation)."""
        from acfm_video_3d_reconstruction_tpu.geometry import icosphere as ico

        v, f = ico.icosphere(3)
        faces = jnp.asarray(f, jnp.int32)
        for S in (512, 1024):
            for scale in (0.5, 0.75, 0.9, 1.1, 1.3):
                cams = jnp.asarray([[scale, 0.05, -0.05, 1.0, 0.0, 0.0, 0.0]])
                proj = camera.orthographic_proj_withz(
                    jnp.asarray(v, jnp.float32)[None] * 0.7, cams, offset_z=5.0
                )
                K = tpu.auto_K(f.shape[0], S, 192)
                ovf = tpu.bin_overflow_counts(proj, faces, S, K)
                assert int(np.asarray(ovf).max()) == 0, (S, scale, K)

    def test_pick_layout_divides_image(self):
        for s in (32, 64, 96, 128, 192, 256, 320, 512, 1024):
            lay = tpu._pick_layout(s)
            assert s % lay.bh == 0 and s % lay.bw == 0, (s, lay)
            blk_h, blk_w = lay.block
            assert blk_h * blk_w == lay.pixels
            # packed layouts must fill a full (8, 128) Mosaic block
            if lay.r > 1:
                assert lay.block == (8, 128), lay


@pytest.mark.heavy
class TestLargeImage:
    def test_golden_and_grad_512(self):
        """Forward + gradient parity at 512^2 (interpret mode, small mesh)
        — sizes beyond the 256^2 bench path stay correct."""
        v, f = icosphere.icosphere(1)
        cams = jnp.asarray([[0.85, 0.02, -0.03, 0.9659258, 0.0, 0.258819, 0.0]])
        proj = camera.orthographic_proj_withz(
            jnp.asarray(v, jnp.float32)[None] * 0.7, cams, offset_z=5.0
        )
        faces = jnp.asarray(f, jnp.int32)
        S = 512
        ovf = tpu.bin_overflow_counts(proj, faces, S, 96)
        assert int(np.asarray(ovf).max()) == 0

        mask_t, p2f_t, vis_t = tpu.soft_silhouette_tpu(
            proj, faces, S, 96, interpret=INTERP
        )
        mask_r, p2f_r = ref.soft_silhouette(
            proj, faces, S, face_chunk=f.shape[0], impl="ref"
        )
        np.testing.assert_allclose(
            np.asarray(mask_t), np.asarray(mask_r), atol=2e-3
        )
        agree = (np.asarray(p2f_t) == np.asarray(p2f_r)).mean()
        assert agree > 0.995, agree

        def loss_t(p):
            m, _, _ = tpu.soft_silhouette_tpu(p, faces, S, 96, interpret=INTERP)
            return (m * m).sum() + m.sum() * 0.1

        def loss_r(p):
            m, _ = ref.soft_silhouette(p, faces, S, face_chunk=f.shape[0], impl="ref")
            return (m * m).sum() + m.sum() * 0.1

        gt = jax.grad(loss_t)(proj)
        gr = jax.grad(loss_r)(proj)
        scale = np.abs(np.asarray(gr)).max() + 1e-9
        np.testing.assert_allclose(
            np.asarray(gt) / scale, np.asarray(gr) / scale, atol=5e-3
        )


@pytest.mark.heavy
class TestFusedSilhouetteTexture:
    def test_matches_separate_calls(self, scene):
        """Fused soft+texture == soft_silhouette_vis + atlas sampling from
        the same (soft) fragments, on both paths."""
        proj, faces = scene
        rng = np.random.default_rng(0)
        F = faces.shape[0]
        atlas = jnp.asarray(rng.random((2, F, 3, 3, 3)).astype(np.float32))

        m_t, p_t, v_t, rgb_t, cov_t = tpu.soft_silhouette_vis_tex_tpu(
            proj, faces, atlas, IMG, 320, interpret=INTERP
        )
        m_s, p_s, v_s = tpu.soft_silhouette_tpu(
            proj, faces, IMG, 320, interpret=INTERP
        )
        np.testing.assert_allclose(np.asarray(m_t), np.asarray(m_s), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(p_t), np.asarray(p_s))
        np.testing.assert_allclose(np.asarray(v_t), np.asarray(v_s), atol=1e-6)
        # rgb covered exactly where a face wins the z-buffer
        np.testing.assert_array_equal(
            np.asarray(cov_t), np.asarray(p_t) >= 0
        )

        # reference path agrees (same soft-fragment sampling semantics)
        m_r, p_r, v_r, rgb_r, cov_r = ref.soft_silhouette_vis_tex(
            proj, faces, atlas, IMG, proj.shape[1],
            face_chunk=faces.shape[0], impl="ref",
        )
        agree = (np.asarray(p_t) == np.asarray(p_r)).mean()
        assert agree > 0.995, agree
        both = (
            (np.asarray(cov_t) > 0) & (np.asarray(cov_r) > 0)
            & (np.asarray(p_t) == np.asarray(p_r))
        )
        np.testing.assert_allclose(
            np.asarray(rgb_t)[both], np.asarray(rgb_r)[both], atol=2e-2
        )

    def test_gradients_flow_to_verts_and_atlas(self, scene):
        proj, faces = scene
        rng = np.random.default_rng(1)
        F = faces.shape[0]
        atlas = jnp.asarray(rng.random((2, F, 3, 3, 3)).astype(np.float32))

        def loss(p, a):
            m, _, _, rgb, _ = tpu.soft_silhouette_vis_tex_tpu(
                p, faces, a, IMG, 320, interpret=INTERP
            )
            return (m**2).sum() + (rgb**2).sum()

        gv, ga = jax.grad(loss, argnums=(0, 1))(proj, atlas)
        assert float(jnp.abs(gv).max()) > 0   # mask grad to verts
        assert float(jnp.abs(ga).max()) > 0   # texture grad to atlas
        assert np.isfinite(np.asarray(gv)).all()
        assert np.isfinite(np.asarray(ga)).all()


class TestPackedLayout:
    def test_tile_untile_roundtrip(self):
        """The packed (8,128)-block bin layout must be an exact bijection
        image <-> tiles (gradients tile the cotangent with _tile and the
        outputs untile with _untile)."""
        for S in (32, 64, 256):
            lay = tpu._pick_layout(S)
            x = jnp.arange(2 * S * S, dtype=jnp.float32).reshape(2, S, S)
            t = tpu._tile(x, S, lay)
            assert t.shape[2:] == lay.block
            back = tpu._untile(t, S, lay)
            np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_tile_pixels_match_layout(self):
        """Kernel pixel coordinates must address exactly the bin's pixels."""
        S = 64
        lay = tpu._pick_layout(S)
        n_bx = S // lay.bw
        for t in (0, 1, n_bx, n_bx + 1):
            px, py = tpu._tile_pixels(t, S, lay, jnp.float32)
            xs = np.round((np.asarray(px) + 1) * S / 2 - 0.5).astype(int)
            ys = np.round((np.asarray(py) + 1) * S / 2 - 0.5).astype(int)
            by, bx = t // n_bx, t % n_bx
            got = set(zip(ys.reshape(-1), xs.reshape(-1)))
            want = {
                (by * lay.bh + i, bx * lay.bw + j)
                for i in range(lay.bh) for j in range(lay.bw)
            }
            assert got == want
