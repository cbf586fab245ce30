"""Per-flush host-cost breakdown for the FastSMC validation path.

The 16k-hap biobank e2e run (BIOBANK_PROBE.json e2e_16384) shows
~370 ms/flush in the decode phase and ~170 ms/flush in segments, while
the device work per flush (8192 pairs x 1024 sites, fast profile) is
~7 ms at the measured kernel rate — the pipeline is bound on host-side
dispatch/RTT overhead of the remote TPU link, not on compute. This probe
isolates each per-flush cost:

  1. upload of the hap-index arrays (jnp.asarray of 2 x 8192 i32),
  2. decode_pairs dispatch (no sync),
  3. the boundary-kernel dispatch + count sync,
  4. run-score dispatch + download,
  5. a full pipelined loop (dispatch N flushes, sync once).

Run: /opt/venv/bin/python scripts/dispatch_probe.py
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
    from fastsmc_tpu.engine import segments as seg
    from fastsmc_tpu.engine.kernels import BwdOutputs, PallasDecoder
    from fastsmc_tpu.engine.oracle import DecodeContext
    from fastsmc_tpu.io.decoding_quantities import DecodingQuantities
    from fastsmc_tpu.io.haps import load_data
    from fastsmc_tpu.utils.sync import sync

    params = DecodingParams.asmc(
        "/root/reference/FILES/EXAMPLE/exampleFile.n300.array",
        os.path.join(REPO, "artifacts", "n300.array.decodingQuantities.npz"),
        out_file_root="/tmp/dispatch_probe",
        do_posterior_sums=True, use_known_seed=True)
    data = load_data(params)
    dq = DecodingQuantities.load_npz(params.decoding_quant_file)
    ctx = DecodeContext.build(params, data, dq)
    dec = PallasDecoder(ctx, alpha_dtype=jnp.bfloat16, precision="fast")
    outs = BwdOutputs(posterior=False, threshold_sums=True)

    P, T = 8192, 1024
    rng = np.random.default_rng(0)
    pa = rng.integers(0, data.n_haps, P).astype(np.int32)
    pb = (pa + 1 + rng.integers(0, data.n_haps - 1, P)).astype(np.int32) \
        % data.n_haps

    res = {}

    def timed(name, fn, n=20):
        fn()  # warm (compile)
        t0 = time.time()
        for _ in range(n):
            fn()
        res[name] = round((time.time() - t0) / n * 1000, 1)
        print(f"{name}: {res[name]} ms", flush=True)

    # 1. upload cost
    timed("upload_2x8192_i32_ms", lambda: sync(
        (jnp.asarray(pa), jnp.asarray(pb))))
    x = np.zeros(1, np.int32)
    timed("upload_scalar_ms", lambda: sync(jnp.asarray(x)))

    # 2. decode dispatch only (no sync) -- queue depth 1 each time, so this
    # measures pure host-side dispatch cost (device finishes in ~7 ms)
    t0s = iter(np.random.default_rng(1).integers(0, 5000, 10000).tolist())
    timed("decode_dispatch_ms",
          lambda: dec.decode_pairs(pa, pb, next(t0s), T, outs, 0))

    # 2b. decode dispatch + sync
    timed("decode_sync_ms",
          lambda: sync(dec.decode_pairs(pa, pb, next(t0s), T, outs, 0)
                       ["threshold_sums"]))

    # 3+4. extraction (boundaries sync + scores download) on a real result
    th = dec.decode_pairs(pa, pb, 0, T, outs, 10)["threshold_sums"]
    sync(th)
    pth = seg.probability_threshold(dq.initial_state_prob, 10)

    def extract():
        segs, _ = seg.extract_segments_device(th, None, pth, 0, T, 0, 0,
                                              cap=16384)
        return segs

    timed("extract_ms", extract)

    # 5. pipelined loop: N dispatches then one sync (what an async
    # pipeline could achieve)
    N = 20
    dec.decode_pairs(pa, pb, 0, T, outs, 0)
    t0 = time.time()
    last = None
    for _ in range(N):
        last = dec.decode_pairs(pa, pb, next(t0s), T, outs, 0)
    sync(last["threshold_sums"])
    res["pipelined_decode_ms_per_flush"] = round(
        (time.time() - t0) / N * 1000, 1)
    print(f"pipelined_decode_ms_per_flush: "
          f"{res['pipelined_decode_ms_per_flush']} ms", flush=True)

    res["note"] = (f"P={P} T={T} fast profile; device work/flush ~7 ms; "
                   "e2e run measured ~370 ms/flush decode + ~170 ms "
                   "segments")
    with open(os.path.join(REPO, "DISPATCH_PROBE.json"), "w") as f:
        json.dump(res, f, indent=2)
    print("DISPATCH_PROBE_OK")


if __name__ == "__main__":
    main()
