"""Adversarial membership check: full-history users -> ll must be exactly 0."""
import numpy as np, sys
import jax, jax.numpy as jnp
import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from rankfm_tpu.ops import fused as F

U, I, Fc, M = 1500, 128, 8, 5   # U > 1024 -> NBU=2 (bucketed path)
B = 1024
rng = np.random.default_rng(0)
# EVERY user has ALL items in history
offsets = np.arange(U + 1, dtype=np.int32) * I
flat = np.tile(np.arange(I, dtype=np.int32), U)
packed = F.pack_history_device(offsets, flat, U, I)
tu, ti = F.extend_tables(jnp.zeros(I),
                         jnp.asarray(rng.normal(0, .1, (U, Fc)).astype(np.float32)),
                         jnp.asarray(rng.normal(0, .1, (I, Fc)).astype(np.float32)),
                         F.user_pad(U), F.item_pad(I))
u = rng.integers(0, U, B).astype(np.int32)
i = rng.integers(0, I, B).astype(np.int32)
sw = np.ones(B, np.float32)
layout = tuple(map(jnp.asarray,
                   F.make_records_grouped(u, i, sw, U, I, B, 128)))
ep = F.make_fused_epoch_fn(U, I, Fc, M, B, chunk=128, donate=False)
tu2, ti2, ll = ep(tu, ti, F.pack_win_cols(packed, U, I), *layout,
                  0.1, 0.01, jax.random.PRNGKey(0), 0)
print("ll =", float(ll), "(must be exactly 0.0)")
d_u = float(jnp.abs(tu2[:U, :Fc] - tu[:U, :Fc]).max())
print("max |d v_u| =", d_u)
assert float(ll) == 0.0, "MEMBERSHIP BROKEN (ll)"
# now give user 0 one nonmember: remove item 5 from its history
offsets2 = offsets.copy(); 
sets = [np.delete(np.arange(I), 5) if k == 0 else np.arange(I) for k in range(U)]
offsets2 = np.zeros(U + 1, np.int32); offsets2[1:] = np.cumsum([len(s) for s in sets])
flat2 = np.concatenate(sets).astype(np.int32)
packed2 = F.pack_history_device(offsets2, flat2, U, I)
u3 = np.zeros(B, np.int32)   # all rows user 0
layout3 = tuple(map(jnp.asarray,
                    F.make_records_grouped(u3, i, sw, U, I, B, 128)))
tu3, ti3, ll3 = ep(tu, ti, F.pack_win_cols(packed2, U, I), *layout3,
                   0.1, 0.01, jax.random.PRNGKey(1), 0)
print("single-nonmember ll =", float(ll3), "(must be < 0)")
assert float(ll3) < 0
print("MEMBERSHIP OK")

# same adversarial check at a 16-block catalog (NW=4 windows per chunk)
U2, I2 = 1500, 16000
off2 = np.arange(U2 + 1, dtype=np.int32) * I2
flat2b = np.tile(np.arange(I2, dtype=np.int32), U2)
packed_big = F.pack_history_device(off2, flat2b, U2, I2)
tu_b, ti_b = F.extend_tables(jnp.zeros(I2),
                             jnp.asarray(rng.normal(0, .1, (U2, Fc)).astype(np.float32)),
                             jnp.asarray(rng.normal(0, .1, (I2, Fc)).astype(np.float32)),
                             F.user_pad(U2), F.item_pad(I2))
u_b = rng.integers(0, U2, B).astype(np.int32)
i_b = rng.integers(0, I2, B).astype(np.int32)
lay_b = tuple(map(jnp.asarray, F.make_records_grouped(u_b, i_b, sw, U2, I2, B, 128)))
ep_b = F.make_fused_epoch_fn(U2, I2, Fc, M, B, chunk=128, donate=False)
_, _, ll_b = ep_b(tu_b, ti_b, F.pack_win_cols(packed_big, U2, I2), *lay_b,
                  0.1, 0.01, jax.random.PRNGKey(2), 0)
print("NW=4 full-history ll =", float(ll_b), "(must be exactly 0.0)")
assert float(ll_b) == 0.0, "MEMBERSHIP BROKEN (NW=4)"
print("MEMBERSHIP OK (NW=4)")
