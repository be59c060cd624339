"""Synthetic self-consistent dataset for tests, benchmarks and CI.

Renders the category template itself under random known cameras and
deformations using the framework's own (trusted, golden-tested) rasterizer,
yielding batches with exactly the reference dataset dict contract:
{img, mask, kp, sfm_pose, frames_idx, mirror_flag, transforms, ...}. A
model trained on this data has a known global optimum, giving fixed-seed
end-to-end regression targets the reference repo never had (SURVEY.md §4).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import camera as cam_utils
from ..models.template import Template
from ..ops import rasterizer as ras
from . import image_utils


@dataclasses.dataclass
class SyntheticConfig:
    num_frames_total: int = 32   # dataset size (frames)
    clip_len: int = 2            # frames per sample (multiframe T)
    image_size: int = 64
    num_kps: int = 4
    seed: int = 0
    offset_z: float = 5.0
    # keypoint anchor vertex ids; None -> random choice. Pass the same ids
    # to build_template(kp_vertex_ids=...) so vert2kp starts from a sane
    # assignment like the reference's kp-dictionary init
    # (monocular/nnutils/mesh_net.py:354-397).
    kp_vertex_ids: tuple | None = None


class SyntheticDataset:
    """Deterministic synthetic video dataset over a template."""

    def __init__(self, template: Template, cfg: SyntheticConfig):
        self.template = template
        self.cfg = cfg
        rng = np.random.default_rng(cfg.seed)
        N = cfg.num_frames_total
        # Ground-truth cameras: mild rotations about y + jittered scale/trans.
        ang = rng.uniform(-0.6, 0.6, N)
        self.gt_cams = np.zeros((N, 7), np.float32)
        self.gt_cams[:, 0] = rng.uniform(0.7, 0.9, N)
        self.gt_cams[:, 1:3] = rng.uniform(-0.1, 0.1, (N, 2))
        self.gt_cams[:, 3] = np.cos(ang / 2)
        self.gt_cams[:, 5] = np.sin(ang / 2)
        # Per-frame small handle offsets (smooth over time).
        K = template.num_lbs
        base = rng.normal(size=(N // cfg.clip_len + 1, K, 3)) * 0.05
        self.gt_deform = np.repeat(base, cfg.clip_len, axis=0)[:N].astype(np.float32)
        # keypoint anchor vertices
        if cfg.kp_vertex_ids is not None:
            self.kp_verts = np.asarray(cfg.kp_vertex_ids)
        else:
            self.kp_verts = rng.choice(
                template.num_verts, cfg.num_kps, replace=False
            )
        self._render_all()

    def _render_all(self):
        t = self.template
        cfg = self.cfg
        verts = jnp.asarray(t.verts)[None] + 0.0
        from ..deform.solve import lbs_from_logits, screened_poisson_solve

        A = lbs_from_logits(jnp.asarray(t.lbs_logits))
        pred_v = screened_poisson_solve(
            jnp.asarray(t.verts), A, jnp.asarray(self.gt_deform), jnp.asarray(t.uniform_L)
        )
        cams = jnp.asarray(self.gt_cams)
        proj = cam_utils.orthographic_proj_withz(pred_v, cams, offset_z=cfg.offset_z)
        fc = 40 if t.num_faces % 40 == 0 else t.num_faces
        mask, _ = ras.soft_silhouette(
            proj, jnp.asarray(t.faces), cfg.image_size, face_chunk=fc
        )
        self.masks = np.asarray(mask > 0.5, np.float32)
        kp3d = pred_v[:, self.kp_verts]
        kp2d = np.asarray(cam_utils.project_points(kp3d, cams))
        vis = np.ones((*kp2d.shape[:2], 1), np.float32)
        self.kps = np.concatenate([kp2d, vis], axis=-1).astype(np.float32)
        # images: mask-colored RGB with a gradient (texture learning signal)
        H = cfg.image_size
        gx = np.linspace(0, 1, H, dtype=np.float32)
        img = np.stack(
            [
                self.masks * gx[None, None, :],
                self.masks * gx[None, :, None],
                self.masks * 0.5,
            ],
            axis=-1,
        )
        self.imgs = img.astype(np.float32)

    def __len__(self):
        return self.cfg.num_frames_total // self.cfg.clip_len

    def get_batch(self, sample_ids: np.ndarray) -> dict:
        """Batch of clips: dict with (B, T, ...) arrays, reference contract."""
        cfg = self.cfg
        T = cfg.clip_len
        frame_idx = np.stack(
            [np.arange(s * T, (s + 1) * T) for s in np.asarray(sample_ids)]
        )
        B = frame_idx.shape[0]
        flat = frame_idx.reshape(-1)
        imgs = self.imgs[flat].reshape(B, T, cfg.image_size, cfg.image_size, 3)
        masks = self.masks[flat].reshape(B, T, cfg.image_size, cfg.image_size)
        kps = self.kps[flat].reshape(B, T, cfg.num_kps, 3)
        cams = self.gt_cams[flat].reshape(B, T, 7)
        flows = self._flows(frame_idx)
        return {
            "img": imgs,
            "mask": masks,
            "kp": kps,
            "sfm_pose": cams,
            "frames_idx": frame_idx.astype(np.int32),
            "mirror_flag": np.zeros((B, T), np.int32),
            "transforms": np.tile(
                np.asarray([1.0, 0, 0, 0], np.float32), (B, T, 1)
            ),
            "optical_flows": flows,
        }

    def _flows(self, frame_idx: np.ndarray) -> np.ndarray:
        """Constant GT flow per clip from known camera/deform motion.

        Layout matches flow.infer.clip_flows: slot t holds flow(t -> t+1),
        last slot zero. The trainer shifts it so the loss compares
        proj_t - proj_{t+1} (sampled at frame t+1) against it; we provide
        the mean vertex motion in pixels as a constant field inside the
        frame-(t+1) mask.
        """
        cfg = self.cfg
        B, T = frame_idx.shape
        H = cfg.image_size
        flows = np.zeros((B, T, H, H, 2), np.float32)
        for b in range(B):
            for t in range(T - 1):
                i0, i1 = frame_idx[b, t], frame_idx[b, t + 1]
                k0, k1 = self.kps[i0, :, :2], self.kps[i1, :, :2]
                motion_px = (k0 - k1).mean(0) * H / 2.0
                flows[b, t, :, :, :] = motion_px[None, None]
                flows[b, t] *= self.masks[i1][..., None]
        return flows


def preprocess_batch(batch: dict, image_size: int) -> dict:
    """Add DT / barrier-DT / boundary-point tensors (host-side).

    Mirrors the reference set_input CPU work (multiframe/main.py:364-377).
    """
    masks = np.asarray(batch["mask"])
    B, T = masks.shape[:2]
    flat = masks.reshape(B * T, *masks.shape[2:])
    edts = np.stack([image_utils.compute_dt(m, norm=False) for m in flat])
    bdts = np.stack([image_utils.compute_dt_barrier(m) for m in flat])
    bounds = image_utils.compute_boundaries(flat)
    out = dict(batch)
    out["edt"] = edts.astype(np.float32)
    out["bdt"] = bdts.astype(np.float32)
    out["boundaries"] = bounds
    return out
