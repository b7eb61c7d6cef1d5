"""Batched Kendall tau-b with tie correction.

Reference: ``kendallCorrelation`` (include/internal/kendall.h:22-179), which
counts discordant pairs with a merge sort.  Basket sizes are <= K (tiny), so
the TPU-native formulation is direct O(K^2) masked pair counting — one
vectorized comparison cube instead of a serial sort, batched over sources.

Formula parity (kendall.h:165-179):
    num = C - D                       (concordant minus discordant)
    den = sqrt((T - sameX) * (T - sameY))
    den == 0  ->  1.0 if sameX == sameY else 0.0
where T = n(n-1)/2, sameX/sameY count pairs tied in x / in y.  Note
``totalPairs - sameX - sameY + sameXY - 2*discording`` in the reference
equals C - D by inclusion-exclusion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["kendall_tau_b"]


@jax.jit
def kendall_tau_b(
    x: jax.Array, y: jax.Array, valid: jax.Array | None = None
) -> jax.Array:
    """Kendall tau-b over the last axis, batched over leading axes.

    ``valid`` masks live entries (rows may hold fewer than width items).
    Returns float32 with the reference's den==0 convention.
    """
    x = x.astype(jnp.float64) if x.dtype == jnp.float64 else x.astype(jnp.float32)
    y = y.astype(x.dtype)
    if valid is None:
        valid = jnp.ones(x.shape, dtype=bool)
    pair_valid = valid[..., :, None] & valid[..., None, :]
    # Count each unordered pair once.
    w = x.shape[-1]
    iu = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    ju = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    upper = iu < ju
    pair_valid = pair_valid & upper

    # Direct comparisons, not sign(dx*dy): IEEE comparison of two floats is
    # exact for any dtype, whereas a subtract-then-multiply pipeline can
    # underflow tiny score differences to zero and miscount them as ties
    # (the reference does all of this in double, kendall.h:86-146; at
    # north-star score magnitudes ~1e-7 the product of two f32 diffs is
    # where precision actually dies, not the comparisons).
    gt_x = x[..., :, None] > x[..., None, :]
    lt_x = x[..., :, None] < x[..., None, :]
    gt_y = y[..., :, None] > y[..., None, :]
    lt_y = y[..., :, None] < y[..., None, :]
    tie_x = ~gt_x & ~lt_x & pair_valid
    tie_y = ~gt_y & ~lt_y & pair_valid
    concordant = jnp.sum(((gt_x & gt_y) | (lt_x & lt_y)) & pair_valid, axis=(-2, -1))
    discordant = jnp.sum(((gt_x & lt_y) | (lt_x & gt_y)) & pair_valid, axis=(-2, -1))
    same_x = jnp.sum(tie_x, axis=(-2, -1))
    same_y = jnp.sum(tie_y, axis=(-2, -1))
    total = jnp.sum(pair_valid, axis=(-2, -1))

    num = (concordant - discordant).astype(jnp.float32)
    den = jnp.sqrt(
        (total - same_x).astype(jnp.float32) * (total - same_y).astype(jnp.float32)
    )
    tau = jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 0.0)
    degenerate = jnp.where(same_x == same_y, 1.0, 0.0)
    return jnp.where(den == 0, degenerate, tau).astype(jnp.float32)
