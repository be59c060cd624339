"""Pallas TPU rasterizer: binned coarse-to-fine, VMEM-resident, analytic VJP.

The production path behind the same semantics as ops/rasterizer.py (which
remains the golden reference — tests/test_rasterizer_tpu.py checks
bit-level agreement modulo bin overflow). Design:

  1. Bin pass (XLA): per-face screen bboxes (+ blur margin) are tested
     against a static pixel-tile grid; each (batch, tile) stream-compacts
     its overlapping faces to a K-prefix (cumsum + compare-reduce; no
     sort — lowest face indices win on overflow). The gathered
     per-tile face table (B, T, 16comp, K) is the kernel input — faces the
     tile never sees are never touched (PyTorch3D's coarse-to-fine
     rasterization, recast as static-shape gathers).
  2. Forward kernel (grid (B, T)): each program holds its K-face table and
     per-pixel state in VMEM and walks the faces in a fori_loop; per face
     ~60 VPU ops on the (tile_h, tile_w) block. Computes
     S = sum_f log_sigmoid(signed_f / sigma) (so alpha = 1 - exp(S)),
     argmin-z face id and clipped barycentrics.
  3. Backward kernel: recomputes per-face signed distances, scaled by the
     saved A = cot_alpha * (-exp(S)) map, accumulating d/d(face coords)
     via jax.grad of the per-face scalar contribution (autodiff *inside*
     the kernel body — traced at lowering, all ops VPU). Per-(tile, slot)
     gradients are scatter-added back to vertices in XLA.

Overflow: a tile with more than K overlapping faces silently drops the
lowest-overlap ones (PyTorch3D's bin_size overflow behaves the same); K
defaults high enough for 1280-face meshes at 256^2.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterizer import BLUR_RADIUS, SIGMA, _BIG

_FAR = 4.0  # sentinel coordinate for invalid face slots (off-screen in NDC)


# ---------------------------------------------------------------- binning --

def _tile_overlap(verts: jax.Array, faces: jax.Array, image_size: int,
                  tile_h: int, tile_w: int, margin: float) -> jax.Array:
    """(B, T, F) bool: face bbox (+margin) overlaps pixel tile t."""
    fv = verts[:, faces]  # (B, F, 3, 3)
    xy = fv[..., :2]
    xmin = xy[..., 0].min(-1) - margin  # (B, F)
    xmax = xy[..., 0].max(-1) + margin
    ymin = xy[..., 1].min(-1) - margin
    ymax = xy[..., 1].max(-1) + margin

    n_ty = image_size // tile_h
    n_tx = image_size // tile_w
    # tile extents in NDC ([-1, 1], pixel centers at (2i+1)/S - 1)
    ty = jnp.arange(n_ty)
    tx = jnp.arange(n_tx)
    y0 = (2.0 * (ty * tile_h) + 1.0) / image_size - 1.0
    y1 = (2.0 * (ty * tile_h + tile_h - 1) + 1.0) / image_size - 1.0
    x0 = (2.0 * (tx * tile_w) + 1.0) / image_size - 1.0
    x1 = (2.0 * (tx * tile_w + tile_w - 1) + 1.0) / image_size - 1.0
    ty0 = jnp.repeat(y0, n_tx)  # (T,)
    ty1 = jnp.repeat(y1, n_tx)
    tx0 = jnp.tile(x0, n_ty)
    tx1 = jnp.tile(x1, n_ty)

    return (
        (xmin[:, None, :] <= tx1[None, :, None])
        & (xmax[:, None, :] >= tx0[None, :, None])
        & (ymin[:, None, :] <= ty1[None, :, None])
        & (ymax[:, None, :] >= ty0[None, :, None])
    )


def bin_overflow_counts(
    verts: jax.Array,
    faces: jax.Array,
    image_size: int,
    K: int,
    margin: float = BLUR_RADIUS,
) -> jax.Array:
    """(B, T) number of faces each tile DROPS under top-K binning.

    The kernels silently keep only K faces per tile; this diagnostic makes
    the overflow measurable (asserted ~0 in tests for the bench meshes;
    call it when bringing up new mesh/image-size combinations).
    """
    bh, bw, _ = _pick_layout(image_size)
    ov = _tile_overlap(verts, faces, image_size, bh, bw, margin)
    return jnp.maximum(ov.sum(-1) - K, 0)


def _face_tables(verts: jax.Array, faces: jax.Array, image_size: int,
                 tile_h: int, tile_w: int, K: int, margin: float):
    """Build per-tile face tables.

    Returns (table (B, T, 16, K) f32, idx (B, T, K) int32). Table rows:
    [ax, ay, bx, by, cx, cy, za, zb, zc, 0...]; invalid slots get
    coordinates at _FAR (no coverage, ~zero soft contribution) and idx -1.
    """
    B = verts.shape[0]
    fv = verts[:, faces]  # (B, F, 3, 3)
    F = faces.shape[0]
    ov = _tile_overlap(verts, faces, image_size, tile_h, tile_w, margin)
    # Stream-compact the overlapping faces to a K-prefix per tile (stable
    # face-index order, lowest-index-first on overflow — identical to the
    # previous top_k-by-(overlap, -rank) formulation, which lowered to a
    # ~108-pass XLA sort and dominated the binning cost on chip). The k-th
    # overlapping face sits where the inclusive cumsum first reaches k+1,
    # i.e. at index #{f : c_f <= k} — one fused compare-reduce per slot.
    c = jnp.cumsum(ov.astype(jnp.int32), axis=-1)  # (B, T, F) inclusive
    total = c[..., -1:]  # (B, T, 1) overlapping faces per tile
    kk = jnp.arange(K, dtype=jnp.int32)
    idx = jnp.sum(
        c[..., None, :] <= kk[:, None], axis=-1, dtype=jnp.int32
    )  # (B, T, K)
    idx = jnp.where(kk < total, idx, -1)

    # gather face data
    comp = jnp.concatenate(
        [
            fv[..., 0, 0:2], fv[..., 1, 0:2], fv[..., 2, 0:2],
            fv[..., :, 2],
        ],
        axis=-1,
    )  # (B, F, 9)
    comp = jnp.pad(comp, [(0, 0), (0, 0), (0, 7)])  # (B, F, 16)
    safe_idx = jnp.where(idx >= 0, idx, 0)
    tab = jnp.take_along_axis(
        comp[:, None], safe_idx[..., None], axis=2
    )  # (B, T, K, 16)
    # poison invalid slots: far-away coords
    inval = (idx < 0)[..., None]
    poison = jnp.asarray([_FAR, _FAR, _FAR + 0.1, _FAR, _FAR, _FAR + 0.1,
                          _BIG, _BIG, _BIG, 0, 0, 0, 0, 0, 0, 0], jnp.float32)
    tab = jnp.where(inval, poison, tab)
    return jnp.swapaxes(tab, 2, 3), idx  # (B, T, 16, K), (B, T, K)


class Layout(NamedTuple):
    """Pixel-bin layout for the kernels.

    A bin covers a (bh, bw) pixel region. With r == 1 the block IS the
    region ((bh, bw), the legacy row-strip layout). With r > 1 the region
    is PACKED into a single (8, r*bw) Mosaic block: r groups of 8 pixel
    rows sit side by side along the lane axis (lane = g*bw + x,
    y = sublane + 8*g). Packing lets the bin be geometrically compact
    (32x32 instead of 16x128) without giving up the (8, 128) VPU block —
    a compact bin overlaps ~2x fewer faces of a typical mesh AND halves
    the per-face pixel work, which is what makes the soft-rasterizer
    kernels fast (PyTorch3D's bin_size=32 coarse rasterization makes the
    same locality argument, monocular/nnutils/nmr.py:192-224).
    """

    bh: int
    bw: int
    r: int

    @property
    def block(self) -> tuple[int, int]:
        return (self.bh // self.r, self.r * self.bw)

    @property
    def pixels(self) -> int:
        return self.bh * self.bw


def _pick_layout(image_size: int) -> Layout:
    """Row-strip bins (the (8,128)-aligned tile from _pick_tiles).

    Compact packed bins (e.g. Layout(32, 32, 4)) halve the kernels' pixel
    work, but every XLA-side structure indexed by (T, K) — the top_k
    binning, the slot->face gradient scatter, the atlas slot gather —
    scales with bins x capacity and measured SLOWER overall on chip
    (214 -> 175 fps at 256^2: bins 2x, K 192 -> 256 for small-object
    density). The kernels themselves are per-face-iteration bound, not
    pixel bound, so the strip layout + face-vectorized kernels win.
    """
    th, tw = _pick_tiles(image_size)
    return Layout(th, tw, 1)


def _tile_pixels(t, image_size, layout: Layout, dtype):
    """Pixel-center NDC coords for bin index t over the layout's block."""
    bh, bw, r = layout
    blk_h, blk_w = layout.block
    n_bx = image_size // bw
    byi = t // n_bx
    bxi = t % n_bx
    rows = jax.lax.broadcasted_iota(jnp.int32, (blk_h, blk_w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (blk_h, blk_w), 1)
    if r > 1:
        ly = rows + blk_h * (cols // bw)
        lx = cols % bw
    else:
        ly, lx = rows, cols
    py = (2.0 * (byi * bh + ly).astype(jnp.float32) + 1.0) / image_size - 1.0
    px = (2.0 * (bxi * bw + lx).astype(jnp.float32) + 1.0) / image_size - 1.0
    return px.astype(dtype), py.astype(dtype)


def _face_geometry(c, px, py, sigma, blur_radius, soft):
    """Per-face per-pixel quantities from 9 packed scalars.

    c: (16,)-ish indexable of scalars; returns (log1mp, z, bary0, bary1,
    in_radius) each (th, tw). Pure jnp so it is jax.grad-able in the
    backward kernel.
    """
    ax, ay, bx, by, cx, cy = c[0], c[1], c[2], c[3], c[4], c[5]
    za, zb, zc = c[6], c[7], c[8]

    # signed sub-areas
    w0 = (bx - px) * (cy - py) - (by - py) * (cx - px)
    w1 = (cx - px) * (ay - py) - (cy - py) * (ax - px)
    w2 = (ax - px) * (by - py) - (ay - py) * (bx - px)
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    denom = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    b0, b1, b2 = w0 / denom, w1 / denom, w2 / denom
    inside = (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0)

    b0c = jnp.clip(b0, 0.0, 1.0)
    b1c = jnp.clip(b1, 0.0, 1.0)
    b2c = jnp.clip(b2, 0.0, 1.0)
    s = jnp.maximum(b0c + b1c + b2c, 1e-12)
    b0c, b1c, b2c = b0c / s, b1c / s, b2c / s
    z = b0c * za + b1c * zb + b2c * zc

    if soft:
        def seg_d2(ux, uy, vx, vy):
            ex, ey = vx - ux, vy - uy
            wx, wy = px - ux, py - uy
            ee = jnp.maximum(ex * ex + ey * ey, 1e-12)
            t = jnp.clip((wx * ex + wy * ey) / ee, 0.0, 1.0)
            dx = wx - t * ex
            dy = wy - t * ey
            return dx * dx + dy * dy

        d2 = jnp.minimum(
            jnp.minimum(seg_d2(ax, ay, bx, by), seg_d2(bx, by, cx, cy)),
            seg_d2(cx, cy, ax, ay),
        )
        signed = jnp.where(inside, -d2, d2)
        in_radius = inside | (signed < blur_radius)
        log1mp = jnp.where(in_radius, jax.nn.log_sigmoid(signed / sigma), 0.0)
    else:
        # hard rasterization: coverage only — no boundary distances needed
        in_radius = inside
        log1mp = jnp.where(inside, -16.0, 0.0)
    return log1mp, z, b0c, b1c, in_radius


K_CHUNK = 64  # faces per grid step; face-table chunk lives in SMEM (4 KB)


def _fwd_kernel(image_size, layout, k_chunk, sigma, blur_radius, soft,
                count_ref, tab_ref, s_ref, slot_ref, b0_ref, b1_ref, z_ref):
    """Grid (B, T, NKC). tab_ref: (1, 1, 16, k_chunk) in SMEM (dynamic
    scalar indexing is only legal in scalar memory — Mosaic rejects dynamic
    lane offsets in VMEM). Output blocks are revisited across the NKC axis
    and stay resident in VMEM; initialized at kc == 0. Chunks with no
    valid faces (count_ref == 0) are skipped entirely."""
    t = pl.program_id(1)
    kc = pl.program_id(2)
    px, py = _tile_pixels(t, image_size, layout, jnp.float32)
    shape = layout.block

    @pl.when(kc == 0)
    def _():
        s_ref[0, 0] = jnp.zeros(shape, jnp.float32)
        slot_ref[0, 0] = jnp.full(shape, -1, jnp.int32)
        b0_ref[0, 0] = jnp.zeros(shape, jnp.float32)
        b1_ref[0, 0] = jnp.zeros(shape, jnp.float32)
        z_ref[0, 0] = jnp.full(shape, _BIG, jnp.float32)

    @pl.when(count_ref[0, 0, 0, 0] > 0)
    def _():
        def body(k, state):
            S, slot, bb0, bb1, zbuf = state
            c = [tab_ref[0, 0, i, k] for i in range(9)]
            log1mp, z, b0, b1, in_r = _face_geometry(
                c, px, py, sigma, blur_radius, soft
            )
            S = S + log1mp
            zm = jnp.where(in_r, z, _BIG)
            better = zm < zbuf
            slot = jnp.where(better, kc * k_chunk + k, slot)
            bb0 = jnp.where(better, b0, bb0)
            bb1 = jnp.where(better, b1, bb1)
            zbuf = jnp.where(better, zm, zbuf)
            return S, slot, bb0, bb1, zbuf

        init = (s_ref[0, 0], slot_ref[0, 0], b0_ref[0, 0], b1_ref[0, 0],
                z_ref[0, 0])
        S, slot, bb0, bb1, zbuf = jax.lax.fori_loop(
            0, count_ref[0, 0, 0, 0], body, init
        )
        s_ref[0, 0] = S
        slot_ref[0, 0] = slot
        b0_ref[0, 0] = bb0
        b1_ref[0, 0] = bb1
        z_ref[0, 0] = zbuf


def _soft_logterm(cs, px, py, sigma, blur_radius):
    """Soft-silhouette log-term for a SUBLANE-VECTORIZED face group.

    cs: 6 (G, W) blocks [ax, ay, bx, by, cx, cy] (one face per sublane,
    broadcast along lanes); px/py: (1, W) pixel row. Only the signed-
    distance path of _face_geometry — z / clipped barycentrics are not
    part of the alpha gradient and are omitted (bit-identical log term).
    """
    ax, ay, bx, by, cx, cy = cs
    w0 = (bx - px) * (cy - py) - (by - py) * (cx - px)
    w1 = (cx - px) * (ay - py) - (cy - py) * (ax - px)
    w2 = (ax - px) * (by - py) - (ay - py) * (bx - px)
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    denom = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    inside = (w0 / denom >= 0.0) & (w1 / denom >= 0.0) & (w2 / denom >= 0.0)

    def seg_d2(ux, uy, vx, vy):
        ex, ey = vx - ux, vy - uy
        wx, wy = px - ux, py - uy
        ee = jnp.maximum(ex * ex + ey * ey, 1e-12)
        t = jnp.clip((wx * ex + wy * ey) / ee, 0.0, 1.0)
        dx = wx - t * ex
        dy = wy - t * ey
        return dx * dx + dy * dy

    d2 = jnp.minimum(
        jnp.minimum(seg_d2(ax, ay, bx, by), seg_d2(bx, by, cx, cy)),
        seg_d2(cx, cy, ax, ay),
    )
    signed = jnp.where(inside, -d2, d2)
    in_radius = inside | (signed < blur_radius)
    return jnp.where(in_radius, jax.nn.log_sigmoid(signed / sigma), 0.0)


def _flat_tile_pixels(t, image_size, layout: Layout, pixels: int):
    """Pixel-center NDC coords for bin t as FLAT (1, P) lane vectors.

    The backward kernel keeps the whole tile's pixels in the lane axis of
    one (8, P) logical block (Mosaic splits it into P/128 VREGs per op) —
    sublanes are the 8 faces of the current group.
    """
    bh, bw, r = layout
    blk_h, blk_w = layout.block
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, pixels), 1)
    row = pix // blk_w
    col = pix % blk_w
    if r > 1:
        ly = row + blk_h * (col // bw)
        lx = col % bw
    else:
        ly, lx = row, col
    n_bx = image_size // bw
    byi = t // n_bx
    bxi = t % n_bx
    py = (2.0 * (byi * bh + ly).astype(jnp.float32) + 1.0) / image_size - 1.0
    px = (2.0 * (bxi * bw + lx).astype(jnp.float32) + 1.0) / image_size - 1.0
    return px, py


def _soft_logterm_grad(tab8, px, py, sigma, blur_radius, A):
    """Hand-derived Σ_px A · ∂logterm/∂coords for an 8-face sublane group.

    Same math as jax.grad(Σ A · _soft_logterm) but ~1.8x fewer VPU ops:

      * the min-of-3-segment-distances gradient routes through the argmin
        segment only (AD runs all three segments' reverse sweeps), and
      * the clamped point-segment distance has a closed-form endpoint
        gradient by the envelope theorem — with t* = clip(w·e/|e|², 0, 1)
        and d = w − t*e,  ∂d²/∂u = 2d(t*−1),  ∂d²/∂v = −2t*d,  valid in
        BOTH the interior case (the ∂/∂t term vanishes because d ⊥ e at
        the unclamped optimum) and the clamped case (t* is constant) — so
        no reverse pass through t's quotient is needed, and
      * the inside test uses sign products instead of three (8, P)-wide
        divides (w/denom ≥ 0 ⟺ w·denom ≥ 0; divides are the slowest VPU
        op in the AD formulation), the only divide left being a narrow
        (8, 1) reciprocal of |e|² per segment.

    tab8: (8, 16) face rows [ax ay bx by cx cy ...]; px/py/A: (1, P).
    Returns (8, 16) rows [gax gay gbx gby gcx gcy, 0 x10] — z never
    enters the alpha term, so its gradients are identically zero.
    """
    ax, ay, bx, by, cx, cy = (tab8[:, i : i + 1] for i in range(6))  # (8,1)

    w0 = (bx - px) * (cy - py) - (by - py) * (cx - px)  # (8, P)
    w1 = (cx - px) * (ay - py) - (cy - py) * (ax - px)
    w2 = (ax - px) * (by - py) - (ay - py) * (bx - px)
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)  # (8, 1)
    dsn = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    inside = (w0 * dsn >= 0.0) & (w1 * dsn >= 0.0) & (w2 * dsn >= 0.0)

    def seg(ux, uy, vx, vy):
        ex, ey = vx - ux, vy - uy                       # (8, 1)
        wx, wy = px - ux, py - uy                       # (8, P)
        ee = jnp.maximum(ex * ex + ey * ey, 1e-12)      # (8, 1)
        # divide (not reciprocal-multiply): keeps t bit-identical to the
        # forward kernel's — a 1-ULP difference in t flips the `inside`/
        # argmin selects near silhouette edges where 1/sigma amplifies
        # them to O(1) per-vertex gradient changes
        t = jnp.clip((wx * ex + wy * ey) / ee, 0.0, 1.0)
        dx = wx - t * ex
        dy = wy - t * ey
        return dx * dx + dy * dy, dx, dy, t

    d20, dx0, dy0, t0 = seg(ax, ay, bx, by)
    d21, dx1, dy1, t1 = seg(bx, by, cx, cy)
    d22, dx2, dy2, t2 = seg(cx, cy, ax, ay)
    d2 = jnp.minimum(jnp.minimum(d20, d21), d22)
    signed = jnp.where(inside, -d2, d2)
    in_radius = inside | (signed < blur_radius)

    # dL/dd² per pixel: A · σ'(signed/σ)/σ · (inside ? −1 : +1)
    g = jax.nn.sigmoid(-signed * (1.0 / sigma)) * (1.0 / sigma) * A
    g = jnp.where(in_radius, jnp.where(inside, -g, g), 0.0)

    # min-of-3 routing with jnp.minimum's exact VJP semantics (ties split
    # 50/50 per nesting level): sliver faces — two vertices projecting to
    # the same xy, common on closed meshes under orthographic cameras —
    # make d20 == d22 over whole pixel regions, where an exclusive argmin
    # would visibly re-route gradient between the duplicated vertices
    inner = jnp.minimum(d20, d21)
    s_in = jnp.where(inner < d22, 1.0, jnp.where(inner == d22, 0.5, 0.0))
    s0 = s_in * jnp.where(d20 < d21, 1.0, jnp.where(d20 == d21, 0.5, 0.0))
    g0 = g * s0
    g1 = g * (s_in - s0)
    g2 = g * (1.0 - s_in)

    # a = u(seg0), v(seg2); b = v(seg0), u(seg1); c = v(seg1), u(seg2)
    gax = g0 * (dx0 * (t0 - 1.0)) - g2 * (t2 * dx2)
    gay = g0 * (dy0 * (t0 - 1.0)) - g2 * (t2 * dy2)
    gbx = g1 * (dx1 * (t1 - 1.0)) - g0 * (t0 * dx0)
    gby = g1 * (dy1 * (t1 - 1.0)) - g0 * (t0 * dy0)
    gcx = g2 * (dx2 * (t2 - 1.0)) - g1 * (t1 * dx1)
    gcy = g2 * (dy2 * (t2 - 1.0)) - g1 * (t1 * dy1)
    return jnp.concatenate(
        [2.0 * jnp.sum(gi, axis=1, keepdims=True)
         for gi in (gax, gay, gbx, gby, gcx, gcy)]
        + [jnp.zeros((8, 10), jnp.float32)],
        axis=1,
    )  # (8, 16)


def _bwd_kernel(image_size, layout, k_chunk, sigma, blur_radius,
                count_ref, tabt_ref, a_ref, grad_ref):
    """Accumulate d(loss)/d(face coords) per (tile, slot).

    Grid (B, T, NKC). Inputs: tabt_ref (1, 1, k_chunk, 16) VMEM — the face
    table TRANSPOSED so a face group is a static (8, 16) sublane slice (no
    scalar assembly); a_ref (1, 1, 1, P) VMEM — cot_mask * (-exp(S)) with
    the tile's pixels FLAT in the lane axis. grad_ref out (1,1,k_chunk,16).

    Faces go 8 per group into SUBLANES, all P tile pixels into LANES: the
    hand-derived group gradient (_soft_logterm_grad) over (8, P) blocks
    replaces the serial per-face formulation (9 scalar SMEM reads + 9
    full-block reductions per face, ~550 cycles/face measured) with ~130
    wide ops + 6 lane-reductions per 8 faces. Groups are statically
    unrolled (8 per chunk) so the (8, 16) result rows store at static
    sublane offsets (Mosaic rejects dynamic sublane stores); empty groups
    are skipped via the chunk count.
    """
    t = pl.program_id(1)
    P = layout.pixels
    px, py = _flat_tile_pixels(t, image_size, layout, P)
    A = a_ref[0, 0]  # (1, P)
    count = count_ref[0, 0, 0, 0]

    grad_ref[0, 0] = jnp.zeros((k_chunk, 16), jnp.float32)
    for g in range(k_chunk // 8):  # static unroll: static output slices

        @pl.when(count > g * 8)
        def _(g=g):
            tab8 = tabt_ref[0, 0, g * 8 : (g + 1) * 8, :]  # (8, 16)
            grad_ref[0, 0, g * 8 : (g + 1) * 8, :] = _soft_logterm_grad(
                tab8, px, py, sigma, blur_radius, A
            )


class TPUFragments(NamedTuple):
    mask: jax.Array         # (B, H, W) alpha
    pix_to_face: jax.Array  # (B, H, W) int32
    bary: jax.Array         # (B, H, W, 3)
    zbuf: jax.Array         # (B, H, W)
    # tiled internals for binned atlas sampling (ops.rasterizer_tpu.sample_atlas_binned)
    slot_t: jax.Array       # (B, T, th, tw) int32 per-tile slot ids
    b0_t: jax.Array         # (B, T, th, tw)
    b1_t: jax.Array         # (B, T, th, tw)
    idx: jax.Array          # (B, T, K) slot -> global face id
    tile: tuple             # Layout of the tiled internals


def _pick_tiles(image_size: int) -> tuple[int, int]:
    """Pixel-tile shape: lane-width 128 when it divides the image, else the
    largest divisor <= 128 that keeps the (8, 128) VPU tiling happy."""
    tile_w = min(128, image_size)
    while image_size % tile_w:
        tile_w //= 2
    tile_h = max(8, min(16, image_size // 2))
    while image_size % tile_h:
        tile_h //= 2
    return tile_h, tile_w


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def auto_K(num_faces: int, image_size: int, requested: int) -> int:
    """Top-K bin capacity that cannot silently drop faces at small sizes.

    At image sizes below 256 a frame-filling 1280-face mesh overlaps far
    more faces per pixel tile than the 256^2-validated K=192 (602 at 64^2,
    352 at 128^2 — measured, see tests): the top-K binning then silently
    drops faces and the rendered mask grows block holes. Below 256^2 this
    returns the EXACT capacity (num_faces) — these are demo/test scales
    where the extra table cost is irrelevant and no geometric bound is
    tight across object scales. At >= 256^2 the measured overlap is well
    under the defaults, so `requested` stands unchanged (guarded by
    bin_overflow_counts assertions in tests across sizes x scales).
    """
    if num_faces <= requested:
        return requested
    if image_size >= 256:
        # measured max per-strip overlap for a frame-filling 1280-face
        # icosphere across cam scales 0.5-1.3: 179 at 256^2, 129 at
        # 512^2, 73 at 1024^2 (larger images spread faces over MORE
        # strips, so 256^2 is this branch's worst case) — the 192
        # default covers all of them; tests assert bin_overflow_counts
        # == 0 across sizes x scales.
        return requested
    # below 256^2 a frame-filling mesh can overlap most faces per tile
    # (no geometric bound is tight across object scales); use the exact
    # capacity — these sizes are demo/test scale where the extra table
    # cost is irrelevant
    return num_faces


def _chunk_counts(idx: jax.Array, n_kc: int) -> jax.Array:
    """(B, T, K) face ids -> (B, T*n_kc) int32 valid counts per chunk.

    Valid entries are a prefix of each chunk: the stream compaction packs
    all valid faces before invalid ones across the whole K list.
    """
    B, T, K = idx.shape
    v = (idx >= 0).reshape(B, T, n_kc, K // n_kc).sum(-1)
    # shaped (B, T*n_kc, 1, 1) so the (1, 1, 1, 1) SMEM block spec satisfies
    # the last-two-dims-equal rule
    return v.reshape(B, T * n_kc, 1, 1).astype(jnp.int32)


def _chunk_table(tab: jax.Array, n_kc: int) -> jax.Array:
    """(B, T, 16, K) -> (B, T*n_kc, 16, K_CHUNK): one full block per chunk
    (Pallas TPU block last dims must equal the array's or be 8/128-aligned)."""
    B, T, C, K = tab.shape
    kc = K // n_kc
    tab = tab.reshape(B, T, C, n_kc, kc)
    tab = jnp.moveaxis(tab, 3, 2)  # (B, T, n_kc, C, kc)
    return tab.reshape(B, T * n_kc, C, kc)


def _run_fwd(verts, faces, image_size, K, sigma, blur_radius, soft, interpret):
    B = verts.shape[0]
    K = _round_up(min(K, faces.shape[0]), K_CHUNK)
    layout = _pick_layout(image_size)
    bh, bw, _ = layout
    blk_h, blk_w = layout.block
    n_t = (image_size // bh) * (image_size // bw)
    n_kc = K // K_CHUNK
    # identical margin for soft and hard binning: the hard kernel ignores
    # non-covering candidates, and a shared margin lets XLA CSE the top_k
    # binning between the mask and texture renders of the same vertices.
    margin = math.sqrt(max(blur_radius, BLUR_RADIUS))
    tab, idx = _face_tables(
        verts, faces, image_size, bh, bw, K, margin
    )
    tab = _chunk_table(tab, n_kc)  # (B, T*n_kc, 16, K_CHUNK)
    counts = _chunk_counts(idx, n_kc)  # (B, T*n_kc)
    kern = functools.partial(
        _fwd_kernel, image_size, layout, K_CHUNK, sigma, blur_radius, soft
    )
    out_shapes = [
        jax.ShapeDtypeStruct((B, n_t, blk_h, blk_w), jnp.float32),
        jax.ShapeDtypeStruct((B, n_t, blk_h, blk_w), jnp.int32),
        jax.ShapeDtypeStruct((B, n_t, blk_h, blk_w), jnp.float32),
        jax.ShapeDtypeStruct((B, n_t, blk_h, blk_w), jnp.float32),
        jax.ShapeDtypeStruct((B, n_t, blk_h, blk_w), jnp.float32),
    ]
    tile_spec = pl.BlockSpec(
        (1, 1, blk_h, blk_w), lambda b, t, kc: (b, t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    S, slot, b0, b1, zbuf = pl.pallas_call(
        kern,
        grid=(B, n_t, n_kc),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, 1),
                lambda b, t, kc, n_kc=n_kc: (b, t * n_kc + kc, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, 16, K_CHUNK),
                lambda b, t, kc, n_kc=n_kc: (b, t * n_kc + kc, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=[tile_spec] * 5,
        out_shape=out_shapes,
        interpret=interpret,
    )(counts, tab)
    return (S, slot, b0, b1, zbuf), (tab, counts), idx, (layout, n_t)


def _unpack_block(x, layout: Layout):
    """(..., blk_h, blk_w) -> (..., bh, bw): undo the lane packing."""
    bh, bw, r = layout
    if r == 1:
        return x
    lead = x.shape[:-2]
    blk_h = bh // r
    x = x.reshape(*lead, blk_h, r, bw)          # lane = g*bw + x
    x = jnp.moveaxis(x, -2, -3)                 # (..., r, blk_h, bw)
    return x.reshape(*lead, bh, bw)


def _pack_block(x, layout: Layout):
    """(..., bh, bw) -> (..., blk_h, blk_w): apply the lane packing."""
    bh, bw, r = layout
    if r == 1:
        return x
    lead = x.shape[:-2]
    blk_h = bh // r
    x = x.reshape(*lead, r, blk_h, bw)
    x = jnp.moveaxis(x, -3, -2)                 # (..., blk_h, r, bw)
    return x.reshape(*lead, blk_h, r * bw)


def _untile(x, image_size, layout: Layout):
    """(B, T, blk_h, blk_w) -> (B, H, W)."""
    B = x.shape[0]
    bh, bw, _ = layout
    x = _unpack_block(x, layout)
    n_by = image_size // bh
    n_bx = image_size // bw
    x = x.reshape(B, n_by, n_bx, bh, bw)
    return jnp.swapaxes(x, 2, 3).reshape(B, image_size, image_size)


def _tile(x, image_size, layout: Layout):
    """(B, H, W) -> (B, T, blk_h, blk_w): inverse of _untile."""
    B = x.shape[0]
    bh, bw, _ = layout
    n_by = image_size // bh
    n_bx = image_size // bw
    x = x.reshape(B, n_by, bh, n_bx, bw)
    x = jnp.swapaxes(x, 2, 3).reshape(B, n_by * n_bx, bh, bw)
    return _pack_block(x, layout)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6)
)
def soft_silhouette_tpu(
    verts,
    faces,
    image_size: int,
    K: int = 256,
    sigma: float = SIGMA,
    blur_radius: float = BLUR_RADIUS,
    interpret: bool = False,
):
    """Pallas soft silhouette: (mask (B,H,W), pix_to_face (B,H,W) int32,
    vis_verts (B, V) 0/1).

    Same semantics as ops.rasterizer.soft_silhouette + visible_vertices
    (modulo top-K bin overflow); analytic gradients to `verts` through the
    alpha channel. (`faces` is a real argument — int arrays must not be
    nondiff_argnums — with a zero cotangent.)
    """
    out, _ = _soft_fwd(verts, faces, image_size, K, sigma, blur_radius, interpret)
    return out


def visible_slots(slot: jax.Array, idx: jax.Array, faces, num_verts: int):
    """(B, T, th, tw) slots + (B, T, K) face ids -> (B, V) 0/1 visibility.

    Replaces the per-pixel scatter of ops.rasterizer.visible_vertices with
    a per-(tile, slot) any-reduction + a tiny face scatter + a dense
    face->vertex incidence matmul.
    """
    B, T = slot.shape[:2]
    K = idx.shape[-1]
    P = slot.shape[2] * slot.shape[3]
    slot_flat = slot.reshape(B, T, P)
    hit = (
        slot_flat[..., None] == jnp.arange(K, dtype=jnp.int32)
    ).any(axis=2)  # (B, T, K)
    F = faces.shape[0]
    safe = jnp.where(idx >= 0, idx, F)
    vis_faces = jnp.zeros((B, F + 1), jnp.float32)
    vis_faces = jax.vmap(
        lambda vf, si, h: vf.at[si.reshape(-1)].max(h.reshape(-1).astype(jnp.float32))
    )(vis_faces, safe, hit)
    vis_faces = vis_faces[:, :F]
    inc = jnp.zeros((F, num_verts), jnp.float32).at[
        jnp.arange(F, dtype=jnp.int32)[:, None], faces
    ].set(1.0)
    vv = jnp.einsum(
        "bf,fv->bv", vis_faces.astype(jnp.bfloat16), inc.astype(jnp.bfloat16)
    )
    return (vv.astype(jnp.float32) > 0).astype(jnp.float32)


def _soft_fwd(verts, faces, image_size, K, sigma, blur_radius, interpret):
    (S, slot, b0, b1, zbuf), (tab, counts), idx, (layout, n_t) = _run_fwd(
        verts, faces, image_size, K, sigma, blur_radius, True, interpret
    )
    mask = 1.0 - jnp.exp(_untile(S, image_size, layout))
    # slot -> global face id
    Bn = verts.shape[0]
    slot_flat = slot.reshape(Bn, n_t, -1)
    covered = slot_flat >= 0
    gathered = jnp.take_along_axis(
        idx, jnp.where(covered, slot_flat, 0), axis=-1
    )
    p2f = jnp.where(covered, gathered, -1).reshape(slot.shape)
    p2f = _untile(p2f, image_size, layout).astype(jnp.int32)
    vis_verts = visible_slots(slot, idx, faces, verts.shape[1])
    # the face tables are cheap to keep (few MB) and expensive to rebuild
    # (overlap + compaction binning) — save them for the backward pass
    residual = (verts, faces, S, idx, tab, counts)
    return (mask, p2f, vis_verts), residual


def _soft_bwd(image_size, K, sigma, blur_radius, interpret, residual, cot):
    verts, faces, S, idx2, tab, counts = residual
    cot_mask = cot[0]  # p2f / vis_verts carry no gradient
    B = verts.shape[0]
    K = _round_up(min(K, faces.shape[0]), K_CHUNK)
    layout = _pick_layout(image_size)
    blk_h, blk_w = layout.block
    n_t = (image_size // layout.bh) * (image_size // layout.bw)
    n_kc = K // K_CHUNK

    # A = dL/dS per pixel = cot_mask * (-exp(S)), tiled like the kernel,
    # then flattened to (1, P) lane rows (free: row-major contiguous)
    P = layout.pixels
    A = _tile(cot_mask, image_size, layout) * (-jnp.exp(S))
    A = A.reshape(B, n_t, 1, P)
    # transposed face table: a face group is a static (8, 16) VMEM slice
    tabt = jnp.swapaxes(tab, 2, 3)  # (B, T*n_kc, K_CHUNK, 16)

    kern = functools.partial(
        _bwd_kernel, image_size, layout, K_CHUNK, sigma, blur_radius
    )
    grads = pl.pallas_call(
        kern,
        grid=(B, n_t, n_kc),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, 1),
                lambda b, t, kc, n_kc=n_kc: (b, t * n_kc + kc, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, K_CHUNK, 16),
                lambda b, t, kc, n_kc=n_kc: (b, t * n_kc + kc, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, 1, P), lambda b, t, kc: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, K_CHUNK, 16), lambda b, t, kc: (b, t, kc, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_t, K, 16), jnp.float32),
        interpret=interpret,
    )(counts, tabt, A)

    # scatter per-slot gradients back to faces then vertices
    F = faces.shape[0]
    g = grads.reshape(B, n_t * K, 16)[..., :9]
    flat_idx = idx2.reshape(B, n_t * K)
    safe = jnp.where(flat_idx >= 0, flat_idx, F)  # F = dump row
    face_grad = jnp.zeros((B, F + 1, 9), jnp.float32)
    face_grad = jax.vmap(lambda fg, si, gg: fg.at[si].add(gg))(face_grad, safe, g)
    face_grad = face_grad[:, :F]
    # 9 comps: [ax, ay, bx, by, cx, cy, za, zb, zc] -> verts grad
    gfv = jnp.stack(
        [
            jnp.stack([face_grad[..., 0], face_grad[..., 1], face_grad[..., 6]], -1),
            jnp.stack([face_grad[..., 2], face_grad[..., 3], face_grad[..., 7]], -1),
            jnp.stack([face_grad[..., 4], face_grad[..., 5], face_grad[..., 8]], -1),
        ],
        axis=-2,
    )  # (B, F, 3, 3)
    V = verts.shape[1]
    # faces -> verts reduction as a dense incidence matmul: the batched
    # 3F-row scatter-add lowered to a 1.65 ms/step sort-based fusion; the
    # comparison-built one-hot + MXU matmul is ~30x cheaper (f32 HIGHEST
    # to keep gradient parity with the scatter formulation)
    f3 = faces.reshape(-1)  # (3F,)
    inc = (f3[:, None] == jnp.arange(V, dtype=f3.dtype)).astype(jnp.float32)
    vgrad = jnp.einsum(
        "bfc,fv->bvc", gfv.reshape(B, -1, 3), inc,
        precision=jax.lax.Precision.HIGHEST,
    )
    return (vgrad, None)


soft_silhouette_tpu.defvjp(_soft_fwd, _soft_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def soft_silhouette_frags_tpu(
    verts,
    faces,
    image_size: int,
    K: int = 256,
    sigma: float = SIGMA,
    blur_radius: float = BLUR_RADIUS,
    interpret: bool = False,
):
    """soft_silhouette_tpu + the tiled fragment internals.

    Returns (mask, p2f, vis_verts, slot_t, b0_t, b1_t, idx): the extra
    arrays expose the soft pass's z-buffer so callers can sample texture
    atlases from the SAME rasterization (sample_atlas_binned) instead of
    re-rasterizing. Only `mask` carries a vertex gradient; the fragment
    internals are geometry state (the reference's texture pass detaches
    pred_v anyway, monocular/main.py:238).
    """
    out, _ = _soft_frags_fwd(
        verts, faces, image_size, K, sigma, blur_radius, interpret
    )
    return out


def _soft_frags_fwd(verts, faces, image_size, K, sigma, blur_radius, interpret):
    (S, slot, b0, b1, zbuf), (tab, counts), idx, (layout, n_t) = _run_fwd(
        verts, faces, image_size, K, sigma, blur_radius, True, interpret
    )
    mask = 1.0 - jnp.exp(_untile(S, image_size, layout))
    Bn = verts.shape[0]
    slot_flat = slot.reshape(Bn, n_t, -1)
    covered = slot_flat >= 0
    gathered = jnp.take_along_axis(
        idx, jnp.where(covered, slot_flat, 0), axis=-1
    )
    p2f = jnp.where(covered, gathered, -1).reshape(slot.shape)
    p2f = _untile(p2f, image_size, layout).astype(jnp.int32)
    vis_verts = visible_slots(slot, idx, faces, verts.shape[1])
    residual = (verts, faces, S, idx, tab, counts)
    return (mask, p2f, vis_verts, slot, b0, b1, idx), residual


def _soft_frags_bwd(image_size, K, sigma, blur_radius, interpret, residual, cot):
    # only the mask cotangent reaches the geometry
    return _soft_bwd(
        image_size, K, sigma, blur_radius, interpret, residual, (cot[0],)
    )


soft_silhouette_frags_tpu.defvjp(_soft_frags_fwd, _soft_frags_bwd)


def soft_silhouette_vis_tex_tpu(
    verts,
    faces,
    atlas,
    image_size: int,
    K: int = 256,
    sigma: float = SIGMA,
    blur_radius: float = BLUR_RADIUS,
    interpret: bool = False,
):
    """Fused silhouette + texture: ONE rasterization serves both the soft
    mask (vertex gradients) and the atlas sampling (atlas gradients).

    Returns (mask, p2f, vis_verts, rgb, covered). Saves the separate hard
    rasterization the reference pays for its texture renderer
    (nmr.py:225-252) — its pix_to_face differs from the soft pass's only
    within the blur margin (~0.1 px at 256^2).
    """
    mask, p2f, vis, slot, b0, b1, idx = soft_silhouette_frags_tpu(
        verts, faces, image_size, K, sigma, blur_radius, interpret
    )
    layout = _pick_layout(image_size)
    sg = jax.lax.stop_gradient
    frags = TPUFragments(
        mask=mask, pix_to_face=p2f, bary=None, zbuf=None,
        slot_t=sg(slot), b0_t=sg(b0), b1_t=sg(b1), idx=sg(idx),
        tile=layout,
    )
    rgb, covered = sample_atlas_binned(atlas, frags, image_size)
    return mask, p2f, vis, rgb, covered


def hard_rasterize_tpu(
    verts,
    faces,
    image_size: int,
    K: int = 192,
    interpret: bool = False,
) -> TPUFragments:
    """Hard (coverage-only) rasterization; no gradient to verts."""
    verts = jax.lax.stop_gradient(verts)
    (S, slot, b0, b1, zbuf), _, idx, (layout, n_t) = _run_fwd(
        verts, faces, image_size, K, SIGMA, 0.0, False, interpret
    )
    B = verts.shape[0]
    slot_flat = slot.reshape(B, n_t, -1)
    covered = slot_flat >= 0
    gathered = jnp.take_along_axis(idx, jnp.where(covered, slot_flat, 0), axis=-1)
    p2f = jnp.where(covered, gathered, -1).reshape(slot.shape)
    p2f = _untile(p2f, image_size, layout).astype(jnp.int32)
    mask = _untile((slot >= 0).astype(jnp.float32), image_size, layout)
    b0u = _untile(b0, image_size, layout)
    b1u = _untile(b1, image_size, layout)
    bary = jnp.stack([b0u, b1u, 1.0 - b0u - b1u], axis=-1)
    bary = jnp.where(mask[..., None] > 0, bary, 0.0)
    return TPUFragments(
        mask=mask, pix_to_face=p2f, bary=bary,
        zbuf=_untile(zbuf, image_size, layout),
        slot_t=slot, b0_t=b0, b1_t=b1, idx=idx, tile=layout,
    )


# transient budget for the one-hot atlas matmuls, in (view, tile) pairs
# vectorized per chunk. 512 = the measured B=16 x 32-tile sweet spot: big
# enough that the (pairs, P, K) one-hot einsum keeps the MXU pipelined,
# small enough that the bf16 transient stays a few hundred MB. Above it
# we lax.map over tile-chunks (each chunk still fully vectorized) instead
# of the old fully tile-sequential path, which at B>16 serialized T=32
# small matmuls and cost batch-24 ~5% throughput (bench.py round-4 note).
_ATLAS_PAIR_BUDGET = 512


def _atlas_matmul(slot_flat, atlas_slots, cell, K, ncell, C,
                  pair_budget=_ATLAS_PAIR_BUDGET):
    """One-hot gather-as-matmul over (B views, T tiles), chunk-bounded.

    slot_flat (B, T, P) int, atlas_slots (B, T, K, ncell*C), cell (B, T, P)
    -> (B, T, P, C). Chunks the tile axis so each vectorized einsum sees at
    most `pair_budget` (view, tile) pairs; B*T <= budget is one shot.
    """
    B, T, P = slot_flat.shape

    def per_pairs(args):
        slots_t, atlas_t, cell_t = args  # (n, P), (n, K, m), (n, P)
        hot = (
            (slots_t[..., None] == jnp.arange(K, dtype=jnp.int32))
            & (slots_t >= 0)[..., None]
        ).astype(jnp.bfloat16)
        tmp = jnp.einsum("bpk,bkm->bpm", hot, atlas_t.astype(jnp.bfloat16))
        chot = (
            cell_t[..., None] == jnp.arange(ncell, dtype=jnp.int32)
        ).astype(jnp.bfloat16)
        return jnp.einsum(
            "bpnc,bpn->bpc", tmp.reshape(-1, P, ncell, C), chot
        )

    tc = max(1, min(T, pair_budget // max(B, 1)))
    while T % tc:
        tc -= 1
    if tc == T:
        return per_pairs(
            (slot_flat.reshape(B * T, P),
             atlas_slots.reshape(B * T, K, -1),
             cell.reshape(B * T, P))
        ).reshape(B, T, P, C)

    nchunk = T // tc

    def chunkify(x):
        x = x.reshape((B, nchunk, tc) + x.shape[2:])
        x = jnp.moveaxis(x, 1, 0)
        return x.reshape((nchunk, B * tc) + x.shape[3:])

    rgb = jax.lax.map(
        per_pairs,
        (chunkify(slot_flat), chunkify(atlas_slots), chunkify(cell)),
    )  # (nchunk, B*tc, P, C)
    rgb = rgb.reshape(nchunk, B, tc, P, C)
    return jnp.moveaxis(rgb, 0, 1).reshape(B, T, P, C)


def sample_atlas_binned(atlas: jax.Array, frags: TPUFragments, image_size: int):
    """Per-face atlas sampling as per-tile one-hot matmuls (MXU path).

    Replaces the flat gather (fwd) and its scatter-add transpose (bwd) —
    both slow row-at-a-time ops on TPU — with batched
    (pixels x K) @ (K x ncell*C) matmuls over the rasterizer's existing
    face bins; autodiff gives the transposed matmuls for the atlas
    gradient. Returns (rgb (B, H, W, C), covered (B, H, W) bool).
    """
    slot, b0, b1, idx = frags.slot_t, frags.b0_t, frags.b1_t, frags.idx
    layout = frags.tile
    B, T = slot.shape[:2]
    K = idx.shape[-1]
    F, Ts = atlas.shape[1], atlas.shape[2]
    C = atlas.shape[-1]
    ncell = Ts * Ts
    P = layout.pixels

    atlas_flat = atlas.reshape(B, F, ncell * C)
    safe_idx = jnp.where(idx >= 0, idx, 0)
    atlas_slots = jnp.take_along_axis(
        atlas_flat[:, None], safe_idx[..., None].astype(jnp.int32), axis=2
    )  # (B, T, K, ncell*C) — 73k-row gather, cheap

    slot_flat = slot.reshape(B, T, P)
    covered = slot_flat >= 0
    i0 = jnp.clip((b0.reshape(B, T, P) * Ts).astype(jnp.int32), 0, Ts - 1)
    i1 = jnp.clip((b1.reshape(B, T, P) * Ts).astype(jnp.int32), 0, Ts - 1)
    cell = i0 * Ts + i1  # (B, T, P)

    rgb = _atlas_matmul(slot_flat, atlas_slots, cell, K, ncell, C)
    rgb = rgb.astype(jnp.float32)
    rgb = jnp.where(covered[..., None], rgb, 0.0)

    blk_h, blk_w = layout.block
    bh, bw, _ = layout
    # unpack (B, T, P, C) -> image: move C behind the block dims first
    rgb = rgb.reshape(B, T, blk_h, blk_w, C)
    rgb = jnp.moveaxis(rgb, -1, 2)                       # (B, T, C, blk_h, blk_w)
    rgb = _unpack_block(rgb, layout)                     # (B, T, C, bh, bw)
    n_by = image_size // bh
    n_bx = image_size // bw
    rgb = rgb.reshape(B, n_by, n_bx, C, bh, bw)
    rgb = jnp.transpose(rgb, (0, 1, 4, 2, 5, 3)).reshape(
        B, image_size, image_size, C
    )
    cov = _untile(covered.reshape(B, T, blk_h, blk_w).astype(jnp.float32),
                  image_size, layout)
    return rgb, cov > 0
