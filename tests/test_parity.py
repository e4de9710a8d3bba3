"""Metric-level learning parity: the batched TPU trainer must reach the same
ranking quality as the reference's sequential per-sample SGD.

Since the Cython reference can't run here, we implement its training loop as
an independent numpy oracle from the documented semantics (SURVEY.md §2.4 /
`_rankfm.pyx:218-336`): per-sample updates, WARP sampling with margin early
stop, per-touch L2 decay, invscaling eta. Both trainers fit the same
synthetic block-structured dataset; hit-rate/recall@10 must match within run
variance (the batched trainer is expected to be at parity or better).
"""

import numpy as np
import pytest

from rankfm_tpu import RankFM


def _make_data(rng, n_users=120, n_items=60, n_groups=3, per_user=12):
    rows = []
    for u in range(n_users):
        g = u % n_groups
        size = n_items // n_groups
        own = rng.choice(np.arange(g * size, (g + 1) * size), per_user, replace=False)
        for it in own:
            rows.append((u, it))
    arr = np.array(rows, dtype=np.int64)
    mask = rng.random(len(arr)) < 0.75
    return arr[mask], arr[~mask]


def _sequential_oracle_fit(train, n_users, n_items, factors, epochs, lr, rng,
                           max_samples=5, alpha=0.01):
    """numpy reimplementation of the reference's per-sample SGD (no features)"""
    v_u = rng.normal(0, 0.1, (n_users, factors)).astype(np.float32)
    v_i = rng.normal(0, 0.1, (n_items, factors)).astype(np.float32)
    w_i = np.zeros(n_items, dtype=np.float32)
    user_items = {u: set(train[train[:, 0] == u][:, 1]) for u in range(n_users)}
    log_I = np.log(n_items)

    for epoch in range(epochs):
        eta = lr / (epoch + 1) ** 0.25
        order = rng.permutation(len(train))
        for r in order:
            u, i = train[r]
            ut_ui = w_i[i] + v_u[u] @ v_i[i]
            min_j, min_pu = -1, 1e6
            sampled = max_samples
            for s in range(1, max_samples + 1):
                while True:
                    j = rng.integers(0, n_items)
                    if j not in user_items[u]:
                        break
                ut_uj = w_i[j] + v_u[u] @ v_i[j]
                pu = ut_ui - ut_uj
                if pu < min_pu:
                    min_j, min_pu = j, pu
                if pu < 1.0:
                    sampled = s
                    break
            j, pu = min_j, min_pu
            mult = np.log(max((n_items - 1) // sampled, 1)) / log_I
            d = mult / (np.exp(pu) + 1.0)
            ra = 2 * alpha
            w_i[i] += eta * (d - ra * w_i[i])
            w_i[j] += eta * (-d - ra * w_i[j])
            gu = d * (v_i[i] - v_i[j])
            gi = d * v_u[u]
            v_u[u] += eta * (gu - ra * v_u[u])
            v_i[i] += eta * (gi - ra * v_i[i])
            v_i[j] += eta * (-gi - ra * v_i[j])
    return w_i, v_u, v_i


def _oracle_hit_rate(w_i, v_u, v_i, train, test, k=10):
    n_users = v_u.shape[0]
    scores = w_i[None, :] + v_u @ v_i.T
    hits = []
    test_sets = {}
    for u, i in test:
        test_sets.setdefault(u, set()).add(i)
    for u, items in test_sets.items():
        top = np.argsort(-scores[u])[:k]
        hits.append(int(len(set(top) & items) > 0))
    return float(np.mean(hits))


@pytest.mark.slow
def test_batched_trainer_matches_sequential_oracle_quality():
    rng = np.random.default_rng(42)
    train, test = _make_data(rng)
    n_users, n_items = 120, 60
    epochs, factors = 15, 8

    # sequential oracle (reference semantics)
    w_i, v_u, v_i = _sequential_oracle_fit(
        train, n_users, n_items, factors, epochs, lr=0.1,
        rng=np.random.default_rng(7))
    hr_oracle = _oracle_hit_rate(w_i, v_u, v_i, train, test)

    # batched TPU-style trainer through the public API
    from rankfm_tpu import evaluation
    model = RankFM(factors=factors, loss='warp', max_samples=5,
                   learning_rate=0.1, learning_schedule='invscaling',
                   batch_size=256)
    model.fit(train, epochs=epochs)
    hr_batched = evaluation.hit_rate(model, test, k=10)

    # both must beat popularity and be within variance of each other
    assert hr_oracle > 0.3, hr_oracle
    assert hr_batched > hr_oracle - 0.1, (hr_batched, hr_oracle)
