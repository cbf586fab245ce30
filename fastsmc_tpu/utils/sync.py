"""Trustworthy device-timing helpers.

``jax.block_until_ready`` does NOT reliably block on the remote (axon)
TPU backend: dispatch returns immediately and the queue absorbs dozens of
calls, so timing loops built on it measure dispatch latency (~0.5 ms)
instead of kernel execution (observed ~120 ms for the same call). The
only trustworthy barrier is materializing bytes on the host. Device
execution is in-order, so syncing the last dispatched result also fences
everything dispatched before it.
"""

from __future__ import annotations

import time

import numpy as np


def sync(result) -> None:
    """Force completion of `result` (any pytree) by pulling bytes to host.

    For a sharded result, one element is materialized from EVERY
    addressable shard (each device has its own in-order queue; fencing
    only shard 0's device would not cover the others). Unsharded leaves
    fall back to a 1-element slice, which fences the single device's
    queue."""
    import jax

    leaf = jax.tree_util.tree_leaves(result)[0]
    shards = getattr(leaf, "addressable_shards", None)
    if shards is not None and len(shards) > 1:
        for s in shards:
            d = s.data
            np.asarray(d[(0,) * d.ndim] if d.ndim else d)
        return
    np.asarray(leaf[:1] if getattr(leaf, "ndim", 0) else leaf)


def measure_throughput(run, n_items: int, min_s: float = 5.0,
                       chunk: int = 8, max_reps: int = 200) -> float:
    """Pipelined items/sec of `run()` (returns its result pytree):
    dispatch `chunk` calls back-to-back, host-sync on the last, repeat
    until `min_s` elapsed. The warmup call is synced and not counted."""
    sync(run())
    reps = 0
    t0 = time.time()
    while True:
        last = None
        for _ in range(chunk):
            last = run()
        sync(last)
        reps += chunk
        dt = time.time() - t0
        if (dt > min_s and reps >= 3 * chunk) or reps >= max_reps:
            return reps * n_items / dt
