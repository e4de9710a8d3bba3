"""On-device negative sampling against ragged user histories.

TPU-native replacement for the reference's rejection loop
(`/root/reference/rankfm/_rankfm.pyx:249-252`): draw ``j = rand() % I`` and
reject while ``j`` is in the user's sorted item array (`lsearch`,
`_rankfm.pyx:20-27`).

Here the per-user histories live in a CSR pair ``(offsets [U+1], flat [nnz])``
with rows sorted ascending, and membership is a fully vectorized binary search
(fixed trip count, no data-dependent control flow). Rejection re-draws run for
a fixed number of rounds; the residual probability that a sampled candidate is
still a member after R rounds is (h_u / I)^(R+1), negligible for real data —
survivors are flagged invalid and masked out of the loss downstream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def csr_member(flat_items, offsets, u, j):
    """Vectorized membership test: is item ``j`` in user ``u``'s sorted row?

    ``u`` and ``j`` are int32 arrays of identical (arbitrary) shape.
    Returns a bool array of the same shape. Binary search with a static trip
    count of ceil(log2(max_row_len)) + 1.
    """
    nnz = flat_items.shape[0]
    if nnz == 0:
        return jnp.zeros(u.shape, dtype=bool)
    lo = offsets[u].astype(jnp.int32)
    hi = offsets[u + 1].astype(jnp.int32)
    # max possible row length bounds the search depth
    iters = max(1, int(nnz).bit_length())

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        mid_val = flat_items[jnp.clip(mid, 0, nnz - 1)]
        go_right = (mid_val < j) & (lo < hi)
        new_lo = jnp.where(go_right, mid + 1, lo)
        new_hi = jnp.where(go_right | (lo >= hi), hi, mid)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    found_val = flat_items[jnp.clip(lo, 0, nnz - 1)]
    return (lo < offsets[u + 1]) & (found_val == j)


def sample_negatives(key, u, offsets, flat_items, num_items, max_samples, rounds=8):
    """Draw ``[B, max_samples]`` candidate negative items for each user in ``u``.

    Rejection sampling with ``rounds`` fixed re-draw rounds against the user's
    history. Returns ``(candidates int32 [B, M], valid bool [B, M])`` where
    ``valid`` is False for the (vanishingly rare) candidates still in-history
    after all rounds.
    """
    B = u.shape[0]
    M = max_samples
    u_bm = jnp.broadcast_to(u[:, None], (B, M))

    def draw(k):
        return jax.random.randint(k, (B, M), 0, num_items, dtype=jnp.int32)

    keys = jax.random.split(key, rounds + 1)
    cand = draw(keys[0])
    member = csr_member(flat_items, offsets, u_bm, cand)

    def body(r, carry):
        cand, member = carry
        fresh = jax.random.randint(
            jax.random.fold_in(keys[1], r), (B, M), 0, num_items, dtype=jnp.int32
        )
        cand = jnp.where(member, fresh, cand)
        member = csr_member(flat_items, offsets, u_bm, cand)
        return cand, member

    cand, member = jax.lax.fori_loop(0, rounds, body, (cand, member))
    return cand, ~member
