"""Queue-ordering + fused-jit device-time probe.

The packed-drain change didn't shrink the e2e "segments" phase (still
~700 ms/group), so the wait is either (a) the fused jit's own device time
or (b) in-order queue semantics: the D2H transfer for group k enqueued
AFTER group k+1's execution waits for k+1 to finish. This measures:

  1. device time of one grouped validation flow pass (B per-batch decode
     + extract_packed dispatches + one stack, sync after);
  2. device_get of an old, already-computed array right after dispatching
     a fresh group (queue-ordering wait);
  3. the same with copy_to_host_async requested before the next dispatch.

Run: /opt/venv/bin/python scripts/queue_probe.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.engine.kernels import PallasDecoder
    from fastsmc_tpu.engine.oracle import DecodeContext
    from fastsmc_tpu.io.decoding_quantities import DecodingQuantities
    from fastsmc_tpu.io.haps import load_data
    from fastsmc_tpu.utils.sync import sync

    params = DecodingParams.asmc(
        "/root/reference/FILES/EXAMPLE/exampleFile.n300.array",
        os.path.join(REPO, "artifacts", "n300.array.decodingQuantities.npz"),
        out_file_root="/tmp/queue_probe",
        do_posterior_sums=True, use_known_seed=True)
    data = load_data(params)
    dq = DecodingQuantities.load_npz(params.decoding_quant_file)
    ctx = DecodeContext.build(params, data, dq)
    dec = PallasDecoder(ctx, alpha_dtype=jnp.bfloat16, precision="fast")

    B, P, T = 8, 8192, 1024
    rng = np.random.default_rng(0)
    pa = rng.integers(0, data.n_haps, (B, P)).astype(np.int32)
    pb = (pa + 1) % data.n_haps
    t0s = rng.integers(0, 4000, B).astype(np.int32)
    s0s = np.full(B, 16, np.int32)
    s1s = np.full(B, T - 16, np.int32)
    t_his = np.full(B, T, np.int32)

    from fastsmc_tpu.engine import segments as seg
    from fastsmc_tpu.engine.kernels import BwdOutputs
    outs = BwdOutputs(posterior=False, threshold_sums=True)

    def group():
        packs = []
        for i in range(B):
            r = dec.decode_pairs(pa[i], pb[i], int(t0s[i]), T, outs, 10)
            packed, _ = seg.extract_packed(r["threshold_sums"], int(s0s[i]),
                                           int(s1s[i]), 1e-3, 4096)
            packs.append(packed)
        return {"packed": seg.stack_rows(packs)}

    res = {}
    r0 = group()
    sync(r0["packed"])          # compile + warm

    # 1. device time per group
    t = time.time()
    N = 8
    last = None
    for _ in range(N):
        last = group()
    sync(last["packed"])
    res["group_device_ms"] = round((time.time() - t) / N * 1000, 1)
    print("group_device_ms", res["group_device_ms"], flush=True)

    # 2. queue-ordering: old result fetched after dispatching a new group
    old = group()
    sync(old["packed"])         # old is definitely complete
    t = time.time()
    fresh = group()             # enqueue a new execution
    t_disp = time.time() - t
    t = time.time()
    np.asarray(old["packed"])   # D2H enqueued after `fresh`
    res["get_old_after_dispatch_ms"] = round((time.time() - t) * 1000, 1)
    res["dispatch_ms"] = round(t_disp * 1000, 1)
    sync(fresh["packed"])
    print("get_old_after_dispatch_ms", res["get_old_after_dispatch_ms"],
          flush=True)

    # 3. copy_to_host_async before the next dispatch
    old = group()
    sync(old["packed"])
    try:
        old["packed"].copy_to_host_async()
        has_async = True
    except Exception as e:  # noqa: BLE001
        has_async = False
        res["copy_async_error"] = repr(e)
    fresh = group()
    t = time.time()
    np.asarray(old["packed"])
    res["get_old_with_async_ms"] = round((time.time() - t) * 1000, 1)
    res["has_copy_to_host_async"] = has_async
    sync(fresh["packed"])
    print("get_old_with_async_ms", res["get_old_with_async_ms"], flush=True)

    with open(os.path.join(REPO, "QUEUE_PROBE.json"), "w") as f:
        json.dump(res, f, indent=2)
    print("QUEUE_PROBE_OK")


if __name__ == "__main__":
    main()
