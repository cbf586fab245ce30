"""Why is lax.map(decode_body) ~6x slower per batch than standalone
dispatches (EXTRACT_COST_PROBE.json: 386 ms/8 batches vs 7.7 ms each)?

Variants measured (all one dispatch, synced):
  map      : jax.lax.map (the current decode_pairs_multi)
  scan_u8  : lax.scan with unroll=B (bodies inlined, no loop machinery)
  unrolled : python-loop inside the jit (full inlining, stacked outputs)
  loopdisp : B separate decode_pairs dispatches, one sync (baseline)

Extraction breakdown (jitted separately on a resident th [T, P]):
  lvl_n    : level classify + boundary flags + count
  nonzero  : + size-capped nonzero compaction
  scores   : + run bounds + chunked indicator einsum

Run: /opt/venv/bin/python scripts/multi_variant_probe.py
"""

import functools
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
        out_file_root="/tmp/mv_probe",
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
    outs = BwdOutputs(posterior=False, threshold_sums=True)
    tables = dec._tables()

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

    def body(a, b, t0):
        return dec._decode_body(tables, dec.hap_bits, a, b, t0, T, outs, 10
                                )["threshold_sums"]

    @jax.jit
    def v_map(pa, pb, t0s):
        return jax.lax.map(lambda x: body(*x), (pa, pb, t0s))

    @jax.jit
    def v_scan_u8(pa, pb, t0s):
        def f(c, x):
            return c, body(*x)
        return jax.lax.scan(f, None, (pa, pb, t0s), unroll=B)[1]

    @jax.jit
    def v_unrolled(pa, pb, t0s):
        return jnp.stack([body(pa[i], pb[i], t0s[i]) for i in range(B)])

    timed("map", lambda: v_map(pa, pb, t0s))
    timed("scan_u8", lambda: v_scan_u8(pa, pb, t0s))
    timed("unrolled", lambda: v_unrolled(pa, pb, t0s))

    def loopdisp():
        last = None
        for i in range(B):
            last = dec.decode_pairs(pa[i], pb[i], int(t0s[i]), T, outs, 10)
        return last["threshold_sums"]

    timed("loopdisp", loopdisp)

    # ---- extraction breakdown on a resident th ----
    th = dec.decode_pairs(pa[0], pb[0], 0, T, outs, 10)["threshold_sums"]
    th = jnp.asarray(np.asarray(th))     # detach
    cap = 4096

    @jax.jit
    def x_lvl_n(th):
        p = jnp.float32(1e-3)
        lvl = (4 - (th >= p).astype(jnp.int32)
               - (th >= 10.0 * p).astype(jnp.int32)
               - (th >= 100.0 * p).astype(jnp.int32)
               - (th >= 1000.0 * p).astype(jnp.int32))
        lvl_t = lvl.T
        prev = jnp.concatenate(
            [jnp.full((P, 1), 4, lvl_t.dtype), lvl_t[:, :-1]], axis=1)
        chg = lvl_t != prev
        return chg.sum()

    @jax.jit
    def x_nonzero(th):
        p = jnp.float32(1e-3)
        lvl = (4 - (th >= p).astype(jnp.int32)
               - (th >= 10.0 * p).astype(jnp.int32)
               - (th >= 100.0 * p).astype(jnp.int32)
               - (th >= 1000.0 * p).astype(jnp.int32))
        lvl_t = lvl.T
        prev = jnp.concatenate(
            [jnp.full((P, 1), 4, lvl_t.dtype), lvl_t[:, :-1]], axis=1)
        chg = lvl_t != prev
        (idx,) = jnp.nonzero(chg.ravel(), size=cap, fill_value=T * P)
        return idx

    x_scores = jax.jit(functools.partial(
        seg.extract_runs_jax, cap=cap))

    timed("x_lvl_n", lambda: x_lvl_n(th))
    timed("x_nonzero", lambda: x_nonzero(th))
    timed("x_scores_full", lambda: x_scores(th, 16, T - 16, 1e-3))

    with open(os.path.join(REPO, "MULTI_VARIANT_PROBE.json"), "w") as f:
        json.dump(res, f, indent=2)
    print("MULTI_VARIANT_PROBE_OK")


if __name__ == "__main__":
    main()
