"""On-device batched Hungarian matching (Jonker-Volgenant, pure JAX).

TPU-native replacement for the reference's per-image host round-trip to
``scipy.optimize.linear_sum_assignment``
(open_set/assigners/mask_hungarian_assigner.py:126-135, called once per
image per decoder layer — a GPU→CPU serialization hot spot). Here the
shortest-augmenting-path algorithm runs fully on device with static shapes
and is vmapped over (batch × decoder layers), so target assignment stays
inside the jitted train step.

Convention: rows = ground-truth instances (R of them, first ``num_valid``
real), columns = queries (C of them, all valid), R <= C. Every valid row is
matched to a distinct column; the returned per-column row index is -1 for
unmatched columns.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e18)


def _augment_row(i: jnp.ndarray, cost: jnp.ndarray, u, v, p):
    """Insert row ``i`` (1-based) into the matching via an augmenting path.

    Arrays use 1-based indexing with a sentinel at index 0:
        u: (R+1,) row potentials, v: (C+1,) column potentials,
        p: (C+1,) int32, p[j] = 1-based row matched to column j (0 = free).
    """
    num_cols = v.shape[0] - 1
    p = p.at[0].set(i)

    minv = jnp.full((num_cols + 1,), _INF)
    used = jnp.zeros((num_cols + 1,), dtype=bool)
    way = jnp.zeros((num_cols + 1,), dtype=jnp.int32)
    j0 = jnp.int32(0)

    # The Dijkstra-style scan marks one column used per iteration, so it
    # terminates within num_cols steps; the explicit cap makes the trip
    # count statically bounded (defends against fp-degenerate inputs and
    # keeps worst-case latency uniform across devices — collectives never
    # wait on an unbounded data-dependent loop).
    def cond(state):
        it_, _, _, p_, _, _, _, j0_ = state
        return (p_[j0_] != 0) & (it_ <= num_cols)

    def body(state):
        it_, u_, v_, p_, minv_, used_, way_, j0_ = state
        used_ = used_.at[j0_].set(True)
        i0 = p_[j0_]
        # reduced costs of unused columns against row i0
        cur = cost[i0 - 1, :] - u_[i0] - v_[1:]  # (C,)
        better = (cur < minv_[1:]) & (~used_[1:])
        minv_ = minv_.at[1:].set(jnp.where(better, cur, minv_[1:]))
        way_ = way_.at[1:].set(jnp.where(better, j0_, way_[1:]))
        masked = jnp.where(used_[1:], _INF, minv_[1:])
        j1 = jnp.argmin(masked).astype(jnp.int32) + 1
        delta = masked[j1 - 1]
        # dual updates: used columns shift potentials, unused shrink slack
        u_ = u_.at[p_].add(jnp.where(used_, delta, 0.0))
        v_ = v_ - jnp.where(used_, delta, 0.0)
        minv_ = minv_ - jnp.where(used_, 0.0, delta)
        return it_ + 1, u_, v_, p_, minv_, used_, way_, j1

    _, u, v, p, _, _, way, j0 = jax.lax.while_loop(
        cond, body, (jnp.int32(0), u, v, p, minv, used, way, j0)
    )

    # unwind the augmenting path: column j0 is free, walk back via `way`
    # (path length <= num_cols; same static bound rationale as above)
    def unwind_cond(state):
        it_, _, j0_ = state
        return (j0_ != 0) & (it_ <= num_cols)

    def unwind_body(state):
        it_, p_, j0_ = state
        j1 = way[j0_]
        p_ = p_.at[j0_].set(p_[j1])
        return it_ + 1, p_, j1

    _, p, _ = jax.lax.while_loop(unwind_cond, unwind_body, (jnp.int32(0), p, j0))
    return u, v, p


@partial(jax.jit, static_argnames=())
def hungarian_assign(cost: jnp.ndarray, num_valid: jnp.ndarray) -> jnp.ndarray:
    """Solve a (possibly padded) rectangular assignment problem.

    Args:
        cost: (R, C) float cost matrix, R <= C. Rows past ``num_valid``
            are padding and are ignored.
        num_valid: scalar int, number of real rows.

    Returns:
        (C,) int32: for each column, the matched row index in
        [0, num_valid) or -1.
    """
    num_rows, num_cols = cost.shape
    assert num_rows <= num_cols, "rows (gts) must not exceed columns (queries)"
    cost = cost.astype(jnp.float32)
    u = jnp.zeros((num_rows + 1,), jnp.float32)
    v = jnp.zeros((num_cols + 1,), jnp.float32)
    p = jnp.zeros((num_cols + 1,), jnp.int32)

    # while (not fori + cond) over rows: under vmap a cond lowers to
    # select and runs BOTH branches, so a fori over all R=100 padded row
    # slots paid the full augmenting path per slot; the while stops at
    # the batch's max num_valid (typically ~15 of 100 on COCO) — ~6x
    # fewer sequential augmentations (this loop was ~1 s of the round-3
    # train step)
    def cond(state):
        i, _, _, _ = state
        return i <= jnp.minimum(num_valid, num_rows)

    def body(state):
        i, u_, v_, p_ = state
        u_, v_, p_ = _augment_row(i.astype(jnp.int32), cost, u_, v_, p_)
        return i + 1, u_, v_, p_

    _, _, _, p = jax.lax.while_loop(cond, body, (jnp.int32(1), u, v, p))
    return p[1:] - 1  # (C,) row index per column, -1 if unmatched


def batched_hungarian(costs: jnp.ndarray, num_valid: jnp.ndarray) -> jnp.ndarray:
    """vmap of :func:`hungarian_assign` over a leading batch dim.

    Args:
        costs: (B, R, C), num_valid: (B,) ints.

    Returns:
        (B, C) int32 row-per-column assignment (-1 = unmatched).
    """
    return jax.vmap(hungarian_assign)(costs, num_valid)
