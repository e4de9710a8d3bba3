"""Batched pairwise BPR/WARP training step — TPU-native replacement for the
reference's per-sample Cython SGD loop (`/root/reference/rankfm/_rankfm.pyx:122-342`).

Design (vs the reference's sequential semantics):

* **WARP reformulated with zero data-dependent control flow.** The reference
  draws up to ``max_samples`` negatives sequentially, tracks the
  minimum-pairwise-utility ("hardest") negative, and stops at the first draw
  whose pairwise utility violates ``MARGIN = 1.0`` (`_rankfm.pyx:244-270`).
  Because every pre-stop draw has utility >= MARGIN, the first violator *is*
  the running min — so the sequential loop is exactly: take the first
  margin-violating candidate if any (its 1-based position is ``sampled``),
  else the argmin over all ``max_samples``. We draw the full fixed-width
  candidate matrix up front and recover ``(j, sampled)`` with a masked
  argmax/argmin. BPR is WARP with ``max_samples = 1`` (`rankfm.py:294-297`).

* **Rank multiplier** matches the reference including its C integer division:
  ``multiplier = log((I-1) // sampled) / log(I)`` (`_rankfm.pyx:269`,
  compiled with ``cdivision=True``).

* **Gradients are hand-written** (the model is 5 einsums) and accumulated
  across the minibatch with scatter-adds, exactly mirroring the per-weight
  update expressions at `_rankfm.pyx:272-326` — including the detail that
  feature-factor rows are only touched when the corresponding feature value
  (or positive/negative feature *difference*) is nonzero.

* **Per-touch L2 decay with geometric correction.** The reference applies
  ``w -= eta * 2 * reg * w`` once per *touch*, interleaved with gradient
  terms. A row touched k times in a batch follows the recursion
  ``w <- c*w + eta*g_t`` with ``c = 1 - 2*reg*eta``; under exchangeable
  within-batch gradients this telescopes to

      w_new = c^k * w + eta * (1 - c^k) / (k * (1 - c)) * sum_t g_t

  which preserves both the reference's decay rate and its fixed point
  ``w* = E[g] / (2*reg)`` for dense weights touched every sample. Plain
  summed scatter-add with linearized decay would diverge for the dense
  feature weights (``eta * 2*beta * batch_size >> 1``).

Parity target is metric parity (hit-rate/recall@k within run variance), not
bitwise weight parity — per SURVEY.md §2.4 the reference's same-epoch update
visibility cannot (and should not) be reproduced on a batched accelerator.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp

from rankfm_tpu.ops.negatives import sample_negatives, sample_negatives_bitmap

MARGIN = 1.0


def _decay_apply(wt, grad, counts, eta, reg):
    """Apply the geometric-corrected per-touch decay + accumulated gradient.

    ``counts`` is the per-row touch count (float), broadcast over trailing dims.
    """
    c = 1.0 - eta * 2.0 * reg
    c = jnp.maximum(c, 1e-8)
    if wt.ndim > counts.ndim:
        counts = counts[..., None]
    ck = jnp.exp(counts * jnp.log(c))
    denom = counts * (1.0 - c)
    f = jnp.where(denom > 1e-12, (1.0 - ck) / jnp.maximum(denom, 1e-12), 1.0)
    return ck * wt + eta * f * grad


def make_train_step(num_items, max_samples, x_uf_any, x_if_any, sample_rounds=8,
                    sampler="bsearch"):
    """Build the jittable single-batch training step.

    Static configuration: catalog size, WARP width, whether user/item features
    are present (drives the decay-count bookkeeping, mirroring the
    ``x_uf_any``/``x_if_any`` fast paths at `_rankfm.pyx:192-194`), and the
    membership strategy for negative rejection: ``'bitmap'`` (one packed-row
    gather; fastest when U*I/8 bytes fits in HBM) or ``'bsearch'`` (CSR binary
    search; scales to arbitrarily large catalogs).

    The step takes ``hist = {'offsets', 'flat', 'bitmap'}``; only the arrays
    the chosen sampler needs are read (pass 1-element dummies for the rest).
    """
    M = max_samples
    log_I = math.log(num_items) if num_items > 1 else 1.0

    def step(w, x_uf, x_if, hist, u, i, sw, valid, eta, alpha, beta, key):
        B = u.shape[0]
        F = w["v_u"].shape[1]

        if sampler == "bitmap":
            cands, cand_ok = sample_negatives_bitmap(
                key, u, hist["bitmap"], num_items, M,
                rounds=max(2, min(sample_rounds, 4)),
            )
        else:
            cands, cand_ok = sample_negatives(
                key, u, hist["offsets"], hist["flat"], num_items, M,
                rounds=sample_rounds,
            )  # [B, M]

        # ---- gather user-side rows; score ALL items with ONE MXU matmul ----
        # (avoids every [B, M, F] 3-D gather: trailing dims < 128 lanes force
        # expensive relayouts on TPU; a [B,2F]x[2F,I] matmul + in-row
        # take_along_axis is both faster and feature-exact)
        v_u_b = w["v_u"][u]                                   # [B, F]
        x_uf_b = x_uf[u]                                      # [B, P]
        user_rep_b = v_u_b + jnp.dot(x_uf_b, w["v_uf"], preferred_element_type=jnp.float32)

        item_rep = w["v_i"] + jnp.dot(x_if, w["v_if"], preferred_element_type=jnp.float32)
        item_bias = w["w_i"] + jnp.dot(x_if, w["w_if"], preferred_element_type=jnp.float32)
        u_mat = jnp.concatenate([user_rep_b, v_u_b], axis=-1)            # [B, 2F]
        i_mat = jnp.concatenate([w["v_i"], item_rep - w["v_i"]], axis=-1)  # [I, 2F]
        # bf16 MXU passes for the big matmul (f32 accumulate); SGD is robust
        # to bf16-grade scoring noise and the MXU runs 4x faster
        scores_all = (
            jnp.dot(u_mat.astype(jnp.bfloat16), i_mat.T.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            + item_bias[None, :]
        )                                                     # [B, I]

        ut_ui = jnp.take_along_axis(scores_all, i[:, None], axis=1)[:, 0]  # [B]
        ut_uj = jnp.take_along_axis(scores_all, cands, axis=1)            # [B, M]

        # ---- WARP selection: first margin violator, else hardest negative ----
        pairwise = ut_ui[:, None] - ut_uj                     # [B, M]
        pairwise = jnp.where(cand_ok, pairwise, jnp.inf)
        viol = pairwise < MARGIN
        any_viol = jnp.any(viol, axis=-1)
        first_viol = jnp.argmax(viol, axis=-1)
        sel = jnp.where(any_viol, first_viol, jnp.argmin(pairwise, axis=-1))  # [B]
        sampled = jnp.where(any_viol, first_viol + 1, M).astype(jnp.int32)

        take = lambda a: jnp.take_along_axis(a, sel[:, None], axis=1)[:, 0]
        j = take(cands)                                       # [B]
        pw = take(pairwise)
        row_ok = (valid & take(cand_ok)).astype(jnp.float32)  # [B]

        # multiplier = log((I-1) // sampled) / log(I)   (C int division)
        ratio = jnp.maximum((num_items - 1) // sampled, 1).astype(jnp.float32)
        multiplier = jnp.log(ratio) / log_I

        pw_safe = jnp.where(jnp.isfinite(pw), pw, 0.0)
        d_outer = jax.nn.sigmoid(-pw_safe)                    # 1 / (exp(pw) + 1)
        d = row_ok * sw * multiplier * d_outer                # [B]
        ll = jnp.sum(row_ok * jax.nn.log_sigmoid(pw_safe))

        # ---- selected-pair gathers for gradient terms (all 2-D [B, *]) ----
        v_i_pos = w["v_i"][i]                                 # [B, F]
        x_if_pos = x_if[i]                                    # [B, Q]
        feat_rep_pos = jnp.dot(x_if_pos, w["v_if"], preferred_element_type=jnp.float32)
        v_i_j = w["v_i"][j]                                   # [B, F]
        x_if_j = x_if[j]                                      # [B, Q]
        feat_rep_j = jnp.dot(x_if_j, w["v_if"], preferred_element_type=jnp.float32)

        # ---- accumulate gradients (scatter-add over the batch) ----
        d_col = d[:, None]
        g_w_i = (
            jnp.zeros_like(w["w_i"]).at[i].add(d).at[j].add(-d)
        )
        g_v_i = (
            jnp.zeros_like(w["v_i"])
            .at[i].add(d_col * user_rep_b)
            .at[j].add(-d_col * user_rep_b)
        )
        # d_v_u = (v_i[i] - v_i[j]) + v_ifᵀ(x_if[i] - x_if[j])  (`_rankfm.pyx:292,305`)
        g_v_u = jnp.zeros_like(w["v_u"]).at[u].add(
            d_col * ((v_i_pos - v_i_j) + (feat_rep_pos - feat_rep_j))
        )
        g_w_if = jnp.einsum("b,bq->q", d, x_if_pos - x_if_j, preferred_element_type=jnp.float32)
        g_v_uf = jnp.einsum(
            "b,bp,bf->pf", d, x_uf_b, v_i_pos - v_i_j, preferred_element_type=jnp.float32
        )
        g_v_if = jnp.einsum(
            "b,bq,bf->qf", d, x_if_pos - x_if_j, v_u_b, preferred_element_type=jnp.float32
        )

        # ---- per-row touch counts for the decay ----
        k_i = jnp.zeros_like(w["w_i"]).at[i].add(row_ok).at[j].add(row_ok)
        k_u = jnp.zeros(w["v_u"].shape[0], dtype=jnp.float32).at[u].add(row_ok)
        n_ok = jnp.sum(row_ok)
        if x_if_any:
            k_w_if = jnp.broadcast_to(n_ok, w["w_if"].shape)
            # v_if[q] touched when x_if[i,q] != x_if[j,q]  (`_rankfm.pyx:321-326`)
            k_v_if = jnp.einsum(
                "b,bq->q", row_ok, (x_if_pos != x_if_j).astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
        else:
            k_w_if = jnp.zeros_like(w["w_if"])
            k_v_if = jnp.zeros(w["v_if"].shape[0], dtype=jnp.float32)
        if x_uf_any:
            # v_uf[p] touched when x_uf[u,p] != 0  (`_rankfm.pyx:313-318`)
            k_v_uf = jnp.einsum(
                "b,bp->p", row_ok, (x_uf_b != 0).astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
        else:
            k_v_uf = jnp.zeros(w["v_uf"].shape[0], dtype=jnp.float32)

        new_w = {
            "w_i": _decay_apply(w["w_i"], g_w_i, k_i, eta, alpha),
            "v_i": _decay_apply(w["v_i"], g_v_i, k_i, eta, alpha),
            "v_u": _decay_apply(w["v_u"], g_v_u, k_u, eta, alpha),
            "w_if": _decay_apply(w["w_if"], g_w_if, k_w_if, eta, beta),
            "v_uf": _decay_apply(w["v_uf"], g_v_uf, k_v_uf, eta, beta),
            "v_if": _decay_apply(w["v_if"], g_v_if, k_v_if, eta, beta),
        }
        return new_w, ll

    return step


@lru_cache(maxsize=32)
def make_epoch_fn(num_items, max_samples, x_uf_any, x_if_any, batch_size,
                  sample_rounds=8, donate=True, sampler="bsearch"):
    """Build the jitted whole-epoch function.

    One epoch = device-side shuffle + `lax.scan` over minibatches of the
    padded interaction arrays. Replaces the reference's per-epoch
    ``np.random.shuffle`` + N sequential sample updates (`_rankfm.pyx:218-336`).

    The returned function signature is
    ``epoch_fn(w, x_uf, x_if, hist, u, i, sw, n_real, eta, alpha, beta, key,
    epoch) -> (w, log_likelihood)``
    where ``u/i/sw`` are the *padded* interaction columns (pad rows carry
    ``sw = 0`` and index ``>= n_real``) and ``n_real`` is baked in statically.
    The per-epoch PRNG stream is ``fold_in(key, epoch)`` computed on device so
    callers pass the same base key every epoch.
    """
    step = make_train_step(num_items, max_samples, x_uf_any, x_if_any,
                           sample_rounds, sampler)

    def epoch_fn(w, x_uf, x_if, hist, u, i, sw, n_real, eta, alpha, beta,
                 key, epoch):
        n_pad = u.shape[0]
        nb = n_pad // batch_size
        kperm, ksamp = jax.random.split(jax.random.fold_in(key, epoch))
        perm = jax.random.permutation(kperm, n_pad)
        valid = perm < n_real
        ub = u[perm].reshape(nb, batch_size)
        ib = i[perm].reshape(nb, batch_size)
        swb = sw[perm].reshape(nb, batch_size)
        vb = valid.reshape(nb, batch_size)

        def body(carry, xs):
            wc = carry
            ub_, ib_, swb_, vb_, t = xs
            wc, ll = step(
                wc, x_uf, x_if, hist,
                ub_, ib_, swb_, vb_, eta, alpha, beta,
                jax.random.fold_in(ksamp, t),
            )
            return wc, ll

        w, lls = jax.lax.scan(body, w, (ub, ib, swb, vb, jnp.arange(nb)))
        return w, jnp.sum(lls)

    donate_argnums = (0,) if donate else ()
    return jax.jit(epoch_fn, static_argnums=(7,), donate_argnums=donate_argnums)
