"""Visualization: keypoint/mask overlays and novel-viewpoint mesh renders.

Parity target: reference */utils/bird_vis.py (VisRenderer: default blue
texture, side/top diff_vp renders, kp2im overlays) and visutil.py tensor
converters — re-built on our own rasterizer instead of PyTorch3D, writing
PNG panels instead of visdom (train/metrics_logger.py handles scalars).
"""
from __future__ import annotations

import numpy as np

COLORS = np.asarray(
    [
        [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0], [255, 0, 255],
        [0, 255, 255], [255, 128, 0], [128, 0, 255], [0, 128, 255],
        [128, 255, 0], [255, 0, 128], [0, 255, 128], [128, 128, 255],
        [255, 128, 128], [128, 255, 128], [200, 200, 200], [90, 60, 30],
        [30, 90, 60], [60, 30, 90],
    ],
    np.uint8,
)


def tensor2im(img) -> np.ndarray:
    """(H, W, 3) float [0,1] -> uint8."""
    return (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)


def tensor2mask(mask) -> np.ndarray:
    """(H, W) float [0,1] -> uint8 RGB."""
    m = (np.clip(np.asarray(mask), 0, 1) * 255).astype(np.uint8)
    return np.stack([m, m, m], axis=-1)


def kp2im(kps, img, radius: int = 2) -> np.ndarray:
    """Overlay [-1,1]-normalized keypoints on an image (reference kp2im).

    kps: (K, 2) or (K, 3) with optional vis; img: (H, W, 3) float.
    """
    out = tensor2im(img).copy()
    H, W = out.shape[:2]
    kps = np.asarray(kps)
    for i, kp in enumerate(kps):
        if kp.shape[-1] > 2 and kp[2] <= 0:
            continue
        x = int(round((kp[0] + 1) * W / 2))
        y = int(round((kp[1] + 1) * H / 2))
        color = COLORS[i % len(COLORS)]
        y0, y1 = max(0, y - radius), min(H, y + radius + 1)
        x0, x1 = max(0, x - radius), min(W, x + radius + 1)
        out[y0:y1, x0:x1] = color
    return out


class VisRenderer:
    """Human-facing mesh renders via the framework rasterizer.

    Default flat blue texture; `diff_vp` renders from rotated viewpoints
    (reference bird_vis.py:18-158).
    """

    def __init__(self, img_size: int, faces: np.ndarray, offset_z: float = 5.0):
        self.img_size = img_size
        self.faces = np.asarray(faces, np.int32)
        self.offset_z = offset_z
        self.default_color = np.asarray([156 / 255.0, 199 / 255.0, 234 / 255.0])

    def __call__(self, verts, cam, texture=None) -> np.ndarray:
        import jax.numpy as jnp

        from ..geometry import camera as cam_utils
        from ..ops import rasterizer as ras

        verts = jnp.asarray(verts)[None]
        cam = jnp.asarray(cam)[None]
        proj = cam_utils.orthographic_proj_withz(verts, cam, offset_z=self.offset_z)
        if texture is None:
            F = len(self.faces)
            texture = jnp.broadcast_to(
                jnp.asarray(self.default_color, jnp.float32), (1, F, 2, 2, 3)
            )
        else:
            texture = jnp.asarray(texture)[None]
        rgb, sil, _ = ras.render_texture(
            proj, jnp.asarray(self.faces), texture, self.img_size
        )
        img = np.asarray(rgb[0])
        img = img + (1.0 - np.asarray(sil[0]))[..., None]  # white background
        return tensor2im(img)

    def diff_vp(self, verts, cam, angle_deg: float = 90.0, axis=(1, 0, 0), texture=None):
        """Render after rotating the object by angle about `axis`."""
        import jax.numpy as jnp

        from ..geometry import quaternion as quat

        ang = np.deg2rad(angle_deg)
        q = quat.axis_angle_to_quat(
            jnp.asarray(np.asarray(axis, np.float32)), jnp.asarray(ang, jnp.float32)
        )
        v = quat.quat_rotate(jnp.asarray(verts)[None], q[None])[0]
        return self(v, cam, texture=texture)


def save_image(path: str, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(img).save(path)


def make_panel(images: list[np.ndarray]) -> np.ndarray:
    """Horizontally stack equal-height images (reference np.hstack panels)."""
    h = min(im.shape[0] for im in images)
    return np.concatenate([im[:h] for im in images], axis=1)
