"""LBS handles + screened-Poisson deformation solve (the heart of ACFM).

Parity target: reference monocular/main.py:203-218 and
multiframe/main.py:586-608: given the learned template `mean_v` (V, 3), the
softmax skinning matrix A = lbs (K, V) and predicted handle offsets
delta (B, K, 3), solve per sample

    min_v ||L v - L mean_v||^2 + ||A v - (A mean_v + delta)||^2

via the normal equations (L^T L + A^T A) v = L^T L mean_v + A^T (A mean_v + delta).

TPU-first design: the reference builds a (B, V, V) batch of identical
systems and runs batched Cholesky. Here the system matrix depends only on
(mean_v, lbs) — shared across the batch — so we factor ONCE per step
(one 642^3 Cholesky) and solve all B right-hand-sides as a single
(V, V) x (V, B*3) triangular solve that runs on the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def screened_poisson_solve(
    mean_v: jax.Array,
    lbs: jax.Array,
    delta_handles: jax.Array,
    L: jax.Array,
    jitter: float = 0.0,
) -> jax.Array:
    """Solve the screened-Poisson handle-deformation system.

    Args:
      mean_v: (V, 3) template vertices.
      lbs: (K, V) skinning matrix (softmax over verts per handle).
      delta_handles: (B, K, 3) predicted handle offsets.
      L: (V, V) mesh Laplacian of the template (uniform or cot).
      jitter: optional diagonal regularizer for numerical safety.
    Returns:
      pred_v: (B, V, 3) deformed vertices.
    """
    V = mean_v.shape[0]
    B = delta_handles.shape[0]
    A = lbs  # (K, V)

    # The system is conditioning-sensitive (Laplacian near-nullspace pinned
    # only by A^T A): all matmuls here request full f32 MXU precision —
    # JAX's default matmul precision is bf16-grade and perturbs the solution
    # by ~1e-1 on the template scale.
    hi = jax.lax.Precision.HIGHEST
    mm = lambda x, y: jnp.matmul(x, y, precision=hi)  # noqa: E731
    target = mm(A, mean_v)[None] + delta_handles  # (B, K, 3)

    M = mm(L.T, L) + mm(A.T, A)
    if jitter:
        M = M + jitter * jnp.eye(V, dtype=M.dtype)
    rhs_common = mm(L.T, mm(L, mean_v))  # (V, 3)
    rhs = rhs_common[None] + jnp.einsum("kv,bkc->bvc", A, target, precision=hi)

    # One factorization, B*3 simultaneous right-hand sides.
    chol = jsl.cho_factor(M.astype(jnp.float32))
    rhs_flat = jnp.moveaxis(rhs, 0, 1).reshape(V, B * 3).astype(jnp.float32)
    sol = jsl.cho_solve(chol, rhs_flat)
    # Numerical note: forming the normal equations in f32 perturbs the
    # system by ~1e-7 which the weakly-pinned Laplacian nullspace (min eig
    # ~2e-3) amplifies to ~3e-3 absolute vertex error — identical to the
    # reference's f32 torch.cholesky path. The f32 *solve* itself is exact
    # to ~6e-7, so no refinement is applied (an f32 residual is pure noise).
    return jnp.moveaxis(sol.reshape(V, B, 3), 1, 0).astype(mean_v.dtype)


def lbs_from_logits(lbs_logits: jax.Array) -> jax.Array:
    """(V, K) logits -> (K, V) skinning matrix: softmax over the vertex axis
    then transpose (reference mesh_net.get_lbs + .permute(1,0))."""
    return jax.nn.softmax(lbs_logits, axis=0).T
