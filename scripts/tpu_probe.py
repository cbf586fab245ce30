"""TPU perf/numerics probe for the Pallas decode kernels.

Runs several kernel configurations on the real chip and prints one JSON line
per measurement. Single-process (the chip must not be shared).

Usage: /opt/venv/bin/python scripts/tpu_probe.py
"""

import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastsmc_tpu.utils.sync import measure_throughput, sync  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    import fastsmc_tpu  # noqa: F401  (enables the compilation cache)
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.engine.hmm import bucket_len
    from fastsmc_tpu.engine.kernels import BwdOutputs, PallasDecoder
    from fastsmc_tpu.engine.oracle import DecodeContext
    from fastsmc_tpu.io.decoding_quantities import DecodingQuantities
    from fastsmc_tpu.io.haps import load_data

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params = DecodingParams.asmc(
        "/root/reference/FILES/EXAMPLE/exampleFile.n300.array",
        os.path.join(root, "artifacts", "n300.array.decodingQuantities.npz"),
        out_file_root="/tmp/probe_out",
        do_posterior_sums=True, use_known_seed=True)
    data = load_data(params)
    dq = DecodingQuantities.load_npz(params.decoding_quant_file)
    ctx = DecodeContext.build(params, data, dq)
    T = bucket_len(data.sites)
    print(json.dumps({"event": "setup", "backend": jax.default_backend(),
                      "sites": data.sites, "T": T}), flush=True)

    outs = BwdOutputs(posterior=False, posterior_sums=True)

    def pairs(P):
        rng = np.random.default_rng(0)
        pa = rng.integers(0, data.n_haps, P).astype(np.int32)
        pb = ((pa + 1 + rng.integers(0, data.n_haps - 1, P))
              % data.n_haps).astype(np.int32)
        return pa, pb

    def bench(name, P, **kw):
        try:
            dec = PallasDecoder(ctx, **kw)
            S = dec._pick_steps(T, P, outs)
            pa, pb = pairs(P)
            t0 = time.time()
            sync(dec.decode_pairs(pa, pb, 0, T, outs, 0))
            compile_s = time.time() - t0
            rate = measure_throughput(
                lambda: dec.decode_pairs(pa, pb, 0, T, outs, 0), P,
                min_s=4.0)
            print(json.dumps({
                "cfg": name, "P": P, "S": S,
                "pairs_per_sec": round(rate, 1),
                "ms_per_batch": round(1e3 * P / rate, 2),
                "compile_s": round(compile_s, 1)}), flush=True)
            return dec
        except Exception:
            print(json.dumps({"cfg": name, "P": P, "error":
                              traceback.format_exc()[-2000:]}), flush=True)
            return None

    # numerics: full posterior on a small window, deltas vs f32/highest
    def numcheck():
        try:
            P = 128
            pa, pb = pairs(P)
            po = BwdOutputs(posterior=True)
            ref = PallasDecoder(ctx).decode_pairs(pa, pb, 0, 512, po, 0)
            ref = np.asarray(ref["posterior"])
            for name, kw in [
                    ("bf16_alpha", dict(alpha_dtype=jnp.bfloat16)),
                    ("prec_fast", dict(precision="fast")),
                    ("bf16+fast", dict(alpha_dtype=jnp.bfloat16,
                                       precision="fast"))]:
                r = PallasDecoder(ctx, **kw).decode_pairs(
                    pa, pb, 0, 512, po, 0)
                d = float(np.max(np.abs(np.asarray(r["posterior"]) - ref)))
                print(json.dumps({"numcheck": name,
                                  "max_abs_posterior_delta": d}), flush=True)
        except Exception:
            print(json.dumps({"numcheck": "error", "error":
                              traceback.format_exc()[-2000:]}), flush=True)

    import os as _os
    cfgs = _os.environ.get("PROBE_CFGS", "").split(",")

    def want(n):
        return not cfgs or not cfgs[0] or n in cfgs

    if want("bf16_fast_auto"):
        bench("bf16_fast_auto", 4096, alpha_dtype=jnp.bfloat16,
              precision="fast")
    if want("f32_fast_auto"):
        bench("f32_fast_auto", 4096, precision="fast")
    if want("bf16_highest_P8192"):
        bench("bf16_highest_P8192", 8192, alpha_dtype=jnp.bfloat16)
    if want("bf16_fast_P8192"):
        bench("bf16_fast_P8192", 8192, alpha_dtype=jnp.bfloat16,
              precision="fast")
    if want("bf16_highest_auto"):
        bench("bf16_highest_auto", 4096, alpha_dtype=jnp.bfloat16)
    if want("numcheck"):
        numcheck()
    print(json.dumps({"event": "done"}), flush=True)


if __name__ == "__main__":
    main()
