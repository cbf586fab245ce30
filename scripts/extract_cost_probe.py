"""Isolate the device cost of the in-jit extraction (QUEUE_PROBE.json
showed ~537 ms per fused group = ~60 ms/batch extraction at cap=16384
vs ~8 ms decode). Sweeps cap and measures decode-only vs decode+extract.

Run: /opt/venv/bin/python scripts/extract_cost_probe.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax.numpy as jnp

    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.engine.kernels import BwdOutputs, PallasDecoder
    from fastsmc_tpu.engine.oracle import DecodeContext
    from fastsmc_tpu.io.decoding_quantities import DecodingQuantities
    from fastsmc_tpu.io.haps import load_data
    from fastsmc_tpu.utils.sync import sync

    params = DecodingParams.asmc(
        "/root/reference/FILES/EXAMPLE/exampleFile.n300.array",
        os.path.join(REPO, "artifacts", "n300.array.decodingQuantities.npz"),
        out_file_root="/tmp/extract_cost",
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

    res = {}

    def timed(name, fn, n=6):
        out = fn()
        sync(out)
        t = time.time()
        last = None
        for _ in range(n):
            last = fn()
        sync(last)
        res[name] = round((time.time() - t) / n * 1000, 1)
        print(name, res[name], "ms", flush=True)

    from fastsmc_tpu.engine import segments as seg
    outs = BwdOutputs(posterior=False, threshold_sums=True)

    def decode_loop():
        last = None
        for i in range(B):
            last = dec.decode_pairs(pa[i], pb[i], int(t0s[i]), T, outs, 10)
        return last["threshold_sums"]

    timed("decode_loop_only", decode_loop)

    def group(cap):
        packs = []
        for i in range(B):
            r = dec.decode_pairs(pa[i], pb[i], int(t0s[i]), T, outs, 10)
            packed, _ = seg.extract_packed(r["threshold_sums"], int(s0s[i]),
                                           int(s1s[i]), 1e-3, cap)
            packs.append(packed)
        return seg.stack_rows(packs)

    for cap in (1024, 4096, 16384):
        timed(f"decode_extract_cap{cap}", lambda c=cap: group(c))

    with open(os.path.join(REPO, "EXTRACT_COST_PROBE.json"), "w") as f:
        json.dump(res, f, indent=2)
    print("EXTRACT_COST_PROBE_OK")


if __name__ == "__main__":
    main()
