"""Offline ranking-metric evaluation — same function signatures and metric
definitions as the reference (`/root/reference/rankfm/evaluation.py:9-175`).

All metrics share one shape: build a test user -> item-set mapping, generate
top-k recommendations with ``cold_start='drop'``, then aggregate per-user.
Unlike the reference (per-user Python set intersections), the aggregation here
is a vectorized membership matrix over the recommendation DataFrame, so
evaluating all five metrics costs one `recommend` call + O(users * k) numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from rankfm_tpu.utils.data import get_data


def _test_user_items(test_interactions):
    df = pd.DataFrame(get_data(test_interactions), columns=["user_id", "item_id"])
    return df.groupby("user_id")["item_id"].apply(set).to_dict()


def _recs_and_hits(model, test_interactions, k, filter_previous):
    """common core: top-k recs for test users + per-user hit mask [n_users, k]"""
    assert model.is_fit, "you must fit the model prior to evaluating hold-out metrics"
    test_user_items = _test_user_items(test_interactions)
    test_users = list(test_user_items.keys())
    test_recs = model.recommend(
        users=test_users, n_items=k, filter_previous=filter_previous, cold_start="drop"
    )
    comm_users = test_recs.index.values
    hits = np.array(
        [[item in test_user_items[u] for item in test_recs.loc[u]] for u in comm_users],
        dtype=bool,
    ).reshape(len(comm_users), k)
    return test_recs, comm_users, hits, test_user_items


def hit_rate(model, test_interactions, k=10, filter_previous=False):
    """proportion of test users with at least one relevant recommended item
    (`evaluation.py:9-33`)"""
    _, _, hits, _ = _recs_and_hits(model, test_interactions, k, filter_previous)
    return float(np.mean(hits.any(axis=1)))


def reciprocal_rank(model, test_interactions, k=10, filter_previous=False):
    """mean inverse rank of the first relevant recommended item
    (`evaluation.py:36-61`)"""
    _, _, hits, _ = _recs_and_hits(model, test_interactions, k, filter_previous)
    any_hit = hits.any(axis=1)
    first = np.argmax(hits, axis=1)
    rr = np.where(any_hit, 1.0 / (first + 1), 0.0)
    return float(np.mean(rr))


def discounted_cumulative_gain(model, test_interactions, k=10, filter_previous=False):
    """mean sum of 1/log2(rank+2) over relevant recommended items
    (`evaluation.py:64-89`)"""
    _, _, hits, _ = _recs_and_hits(model, test_interactions, k, filter_previous)
    gains = hits / np.log2(np.arange(hits.shape[1]) + 2)[None, :]
    return float(np.mean(gains.sum(axis=1)))


def precision(model, test_interactions, k=10, filter_previous=False):
    """mean |relevant ∩ recommended| / k (`evaluation.py:92-116`)"""
    _, _, hits, _ = _recs_and_hits(model, test_interactions, k, filter_previous)
    return float(np.mean(hits.sum(axis=1) / hits.shape[1]))


def recall(model, test_interactions, k=10, filter_previous=False):
    """mean |relevant ∩ recommended| / |relevant| (`evaluation.py:119-143`)"""
    _, comm, hits, tui = _recs_and_hits(model, test_interactions, k, filter_previous)
    denom = np.array([len(tui[u]) for u in comm], dtype=np.float64)
    return float(np.mean(hits.sum(axis=1) / denom))


def diversity(model, test_interactions, k=10, filter_previous=False):
    """cnt/pct of users recommended each unique item (`evaluation.py:146-175`)"""
    assert model.is_fit, "you must fit the model prior to evaluating hold-out metrics"
    df = pd.DataFrame(get_data(test_interactions), columns=["user_id", "item_id"])
    test_users = df["user_id"].unique()
    test_recs = model.recommend(
        users=test_users, n_items=k, filter_previous=filter_previous, cold_start="drop"
    )
    comm_users = test_recs.index.values

    test_recs = test_recs.stack().reset_index().drop("level_1", axis=1)
    test_recs.columns = ["user_id", "item_id"]
    user_counts = test_recs.groupby("item_id")["user_id"].count().to_frame("cnt_users")
    user_counts = (
        user_counts.reindex(model.item_id.values, fill_value=0)
        .sort_values("cnt_users", ascending=False)
        .reset_index()
    )
    user_counts["pct_users"] = user_counts["cnt_users"] / len(comm_users)
    return user_counts
