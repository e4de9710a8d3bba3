"""Fused Pallas kernel on the data-parallel mesh.

Runs the flagship fused WARP/BPR kernel (`rankfm_tpu.ops.fused`) PER
DEVICE under ``shard_map``: tables replicate, every device executes the
unmodified single-chip Mosaic program on its share of each global batch's
chunks, and the replicas re-merge with ONE table-sized delta-psum per sync
group over ICI — so multi-chip pods get the measured single-chip step
rather than the XLA window step (the round-1 gap: the sharded path was
correct but ran the slow step family).

This is the DP regime of SURVEY.md §2.6 (tables fit per chip — even a
1M x 64 f32 item table is 256 MB); beyond that the row-sharded GSPMD path
in `rankfm_tpu.parallel.train` takes over.

Layout contract: the fit-time `make_records_grouped` layout is built once
for the GLOBAL batch size; `split_layout_for_mesh` deals each batch's
chunks to the devices device-major, and the replicated record array is
re-shuffled identically on every device each epoch (shared shuffle key,
zero communication). Negative-sampling streams fold in the device index.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rankfm_tpu.ops import fused as fused_mod
from rankfm_tpu.parallel.train import _MeshKey


def _mesh_dims(mesh):
    axes = tuple(mesh.axis_names)
    sizes = tuple(mesh.shape[a] for a in axes)
    n_dev = 1
    for s in sizes:
        n_dev *= s
    return axes, sizes, n_dev


@lru_cache(maxsize=16)
def _cached_fused_dp_epoch(mesh_key, num_users, num_items, factors,
                           max_samples, batch_size, chunk, table_bf16,
                           has_uf, has_if, n_windows, sync_every, ub=None,
                           pre_shuffled=False, sub=1):
    mesh = mesh_key.mesh
    axes, sizes, n_dev = _mesh_dims(mesh)
    bs_dev = batch_size // n_dev
    assert bs_dev % chunk == 0, (bs_dev, chunk)

    batch_fn = fused_mod.make_fused_batch_fn(
        num_users, num_items, factors, max_samples, bs_dev, chunk,
        table_bf16=table_bf16, has_uf=has_uf, has_if=has_if,
        n_windows=n_windows, ub=ub, sub=sub)
    return _build_dp_epoch(mesh, batch_fn, num_users, num_items, bs_dev,
                           chunk, has_uf, has_if, n_windows, sync_every,
                           ub=ub, pre_shuffled=pre_shuffled)


def _build_dp_epoch(mesh, batch_fn, num_users, num_items, bs_dev, chunk,
                    has_uf, has_if, n_windows, sync_every, ub=None,
                    pre_shuffled=False):
    """shard_map + jit plumbing around `_dp_epoch_body`; ``batch_fn`` is
    injectable so the mesh plumbing is testable on a CPU mesh with an XLA
    emulator standing in for the Mosaic kernel."""
    axes, sizes, _ = _mesh_dims(mesh)
    one_epoch = fused_mod._dp_epoch_body(
        batch_fn, num_users, num_items, bs_dev, chunk, axes, sizes,
        n_windows=n_windows, sync_every=sync_every, ub=ub,
        pre_shuffled=pre_shuffled)

    rep = P()
    split = P(axes, None)     # [n_dev*nb, nTd]: leading axis over ALL axes
    rep_sh = NamedSharding(mesh, rep)
    split_sh = NamedSharding(mesh, split)

    if has_uf or has_if:
        def dev_fn(tab_u, tab_i, win_cols, rec, group, cids, ublk, iblk,
                   eta, alpha, key, epoch, x_uf, x_if, tab_uf, tab_if, beta):
            tu, ti, tuf, tif, ll = one_epoch(
                tab_u, tab_i, win_cols, rec, group, cids, ublk, iblk,
                eta, alpha, key, epoch, x_uf=x_uf, x_if=x_if,
                tab_uf=tab_uf, tab_if=tab_if, beta=beta)
            return tu, ti, tuf, tif, ll

        in_specs = (rep, rep, rep, rep, rep, split, split, split,
                    rep, rep, rep, rep, rep, rep, rep, rep, rep)
        out_specs = (rep, rep, rep, rep, rep)
        mapped = jax.shard_map(dev_fn, mesh=mesh, in_specs=in_specs,
                               out_specs=out_specs, check_vma=False)

        def epoch_fn(tab_u, tab_i, win_cols, rec, group, cids, ublk, iblk,
                     eta, alpha, key, epoch, x_uf, x_if, tab_uf, tab_if,
                     beta):
            return mapped(tab_u, tab_i, win_cols, rec, group, cids, ublk,
                          iblk, jnp.float32(eta), jnp.float32(alpha), key,
                          jnp.int32(epoch), x_uf, x_if, tab_uf, tab_if,
                          jnp.float32(beta))

        donate = (0, 1, 14, 15)
        in_sh = (rep_sh, rep_sh, rep_sh, rep_sh, rep_sh,
                 split_sh, split_sh, split_sh,
                 rep_sh, rep_sh, rep_sh, rep_sh,
                 rep_sh, rep_sh, rep_sh, rep_sh, rep_sh)
        out_sh = (rep_sh, rep_sh, rep_sh, rep_sh, rep_sh)
    else:
        def dev_fn(tab_u, tab_i, win_cols, rec, group, cids, ublk, iblk,
                   eta, alpha, key, epoch):
            tu, ti, _, _, ll = one_epoch(
                tab_u, tab_i, win_cols, rec, group, cids, ublk, iblk,
                eta, alpha, key, epoch)
            return tu, ti, ll

        in_specs = (rep, rep, rep, rep, rep, split, split, split,
                    rep, rep, rep, rep)
        out_specs = (rep, rep, rep)
        mapped = jax.shard_map(dev_fn, mesh=mesh, in_specs=in_specs,
                               out_specs=out_specs, check_vma=False)

        def epoch_fn(tab_u, tab_i, win_cols, rec, group, cids, ublk, iblk,
                     eta, alpha, key, epoch):
            return mapped(tab_u, tab_i, win_cols, rec, group, cids, ublk,
                          iblk, jnp.float32(eta), jnp.float32(alpha), key,
                          jnp.int32(epoch))

        donate = (0, 1)
        in_sh = (rep_sh, rep_sh, rep_sh, rep_sh, rep_sh,
                 split_sh, split_sh, split_sh,
                 rep_sh, rep_sh, rep_sh, rep_sh)
        out_sh = (rep_sh, rep_sh, rep_sh)

    return jax.jit(epoch_fn, donate_argnums=donate,
                   in_shardings=in_sh, out_shardings=out_sh)


def make_fused_dp_epoch_fn(mesh, num_users, num_items, factors, max_samples,
                           batch_size, chunk, table_bf16=False, has_uf=False,
                           has_if=False, n_windows=None, sync_every=1,
                           batch_fn=None, ub=None, pre_shuffled=False,
                           sub=1):
    """Whole-epoch fused training compiled over the mesh, data-parallel.

    Same call signature as `rankfm_tpu.ops.fused.make_fused_epoch_fn`'s
    product, except ``cids``/``ublk``/``iblk`` must be the device-major
    splits from `split_layout_for_mesh` and every other operand is
    replicated. ``batch_size`` is the GLOBAL batch (``batch_size / n_dev``
    rows per device per step); ``sync_every=K`` merges replicas every K
    batches (local SGD — the DCN lever, same semantics as the XLA DP
    path's ``dp_sync_every``).

    ``batch_fn`` overrides the Mosaic kernel (CPU-mesh tests inject an XLA
    emulator); overridden fns bypass the program cache.
    """
    if batch_fn is not None:
        axes, sizes, n_dev = _mesh_dims(mesh)
        return _build_dp_epoch(mesh, batch_fn, num_users, num_items,
                               batch_size // n_dev, chunk, has_uf, has_if,
                               n_windows, sync_every, ub=ub,
                               pre_shuffled=pre_shuffled)
    return _cached_fused_dp_epoch(
        _MeshKey(mesh), num_users, num_items, factors, max_samples,
        batch_size, chunk, bool(table_bf16), bool(has_uf), bool(has_if),
        n_windows, int(sync_every), ub=ub, pre_shuffled=bool(pre_shuffled),
        sub=int(sub))
