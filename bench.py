"""Benchmark: full-sequence haplotype-pair decodes/sec on one TPU chip.

Workload: the ASMC all-pairs decoding kernel on the reference example panel
(exampleFile.n300.array: 6,760 sites x 69 TMRCA states), with the fused
posterior-sum reduction — the same computation the reference's
[HMM_regression] benchmark measures (time_regression.py: 179,700 pair
decodes in ~51.97 s => ~3,457 pairs/s on a CI-class CPU with AVX).

Prints one JSON line:
  {"metric": "pair_decodes_per_sec_per_chip", "value": N,
   "unit": "haplotype-pair full-sequence decodes/s", "vs_baseline": R}
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 179700 / 51.97   # reference CPU [HMM_regression]


def main():
    import jax

    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.engine.hmm import bucket_len
    from fastsmc_tpu.engine.oracle import DecodeContext
    from fastsmc_tpu.io.decoding_quantities import DecodingQuantities
    from fastsmc_tpu.io.haps import load_data

    root = os.path.dirname(os.path.abspath(__file__))
    params = DecodingParams.asmc(
        "/root/reference/FILES/EXAMPLE/exampleFile.n300.array",
        os.path.join(root, "artifacts", "n300.array.decodingQuantities.npz"),
        out_file_root="/tmp/bench_out",
        do_posterior_sums=True, use_known_seed=True)
    data = load_data(params)
    dq = DecodingQuantities.load_npz(params.decoding_quant_file)
    ctx = DecodeContext.build(params, data, dq)

    on_tpu = jax.default_backend() not in ("cpu",)
    P = int(os.environ.get("FASTSMC_BENCH_P", "8192" if on_tpu else "64"))
    T = bucket_len(data.sites)

    if on_tpu:
        import jax.numpy as jnp

        from fastsmc_tpu.engine.kernels import BwdOutputs, PallasDecoder
        # production-throughput profile: bf16 forward-message store +
        # bf16x3 matmuls (~6e-3 posterior error; segment outputs validated
        # against the exact profile in tests). FASTSMC_BENCH_EXACT=1
        # benches the bit-faithful f32/HIGHEST profile instead.
        if os.environ.get("FASTSMC_BENCH_EXACT", "") == "1":
            dec = PallasDecoder(ctx)
        else:
            dec = PallasDecoder(ctx, alpha_dtype=jnp.bfloat16,
                                precision="fast")
        outs = BwdOutputs(posterior=False, posterior_sums=True)

        def run(pa, pb):
            r = dec.decode_pairs(pa, pb, 0, T, outs, 0)
            jax.block_until_ready(r)
            return r
    else:
        from fastsmc_tpu.engine.hmm import BatchedDecoder
        dec = BatchedDecoder(ctx)

        def run(pa, pb):
            r = dec.decode_pairs(pa, pb, 0, T)
            jax.block_until_ready(r)
            return r

    rng = np.random.default_rng(0)
    pa = rng.integers(0, data.n_haps, P).astype(np.int32)
    pb = (pa + 1 + rng.integers(0, data.n_haps - 1, P)).astype(np.int32) \
        % data.n_haps

    # warmup / compile
    run(pa, pb)

    # measure: enough reps for >= ~5s of steady state
    reps = 0
    t0 = time.time()
    while True:
        run(pa, pb)
        reps += 1
        dt = time.time() - t0
        if dt > 5.0 and reps >= 3:
            break
        if reps >= 200:
            break
    pairs_per_sec = reps * P / dt

    print(json.dumps({
        "metric": "pair_decodes_per_sec_per_chip",
        "value": round(pairs_per_sec, 1),
        "unit": "haplotype-pair full-sequence decodes/s (6760 sites, "
                "69 states, fused posterior sums)",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
