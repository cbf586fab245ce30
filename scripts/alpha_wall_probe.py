"""Isolate the fast-profile decode wall: alpha HBM stream vs MXU matvecs.

Four Pallas variants at the production shape (S=8 unroll, KC=128, bf16
compute, P=8192, T=8192), timed separately:

  fwd_store    production forward: matvec + emission + normalize, alpha
               [S, KA, P] bf16 written to HBM per site
  fwd_nostore  same compute, alpha written once per BLOCK (1/8 traffic)
  bwd_read     backward-shaped pass: reads alpha per site, matvec +
               combine + per-pair reduction out [S, 1, P]
  bwd_noread   same compute but alpha block read once per block

If (store - nostore) and (read - noread) are large fractions of the pass
time, the alpha round-trip is the wall -> checkpoint/recompute pays.
If ~0, the MXU matvec chain is the wall and the kernel is at
speed-of-light (ROOFLINE.json).

Run:  cd /root/repo && /opt/venv/bin/python scripts/alpha_wall_probe.py
"""

import functools
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fastsmc_tpu.utils.sync import measure_throughput  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert jax.default_backend() not in ("cpu",)

    KC, KA, S, P, T = 128, 72, 8, 8192, 4096
    nblk = T // S
    G = 64  # distinct operators
    rng = np.random.default_rng(0)
    cdt = jnp.bfloat16
    adt = jnp.bfloat16

    M = jnp.asarray(rng.random((G, KC, KC)) * 0.02, cdt)
    em = jnp.asarray(rng.random((T, 3, KC)), jnp.float32)
    obs = jnp.asarray(rng.integers(0, 2, (T, 2, P), dtype=np.int8),
                      jnp.float32)
    isp = jnp.asarray(rng.random((1, KC)), jnp.float32)
    ops_idx = jnp.asarray(rng.integers(0, G, T), jnp.int32)
    # build the [T, KA, P] alpha on DEVICE from a small host tile (a host
    # f64 array of this shape is ~19 GB and thrashes the 2-CPU box)
    tile = jnp.asarray(rng.random((64, KA, P), dtype=np.float32), adt)
    alpha_in = jax.jit(lambda v: jnp.tile(v, (T // 64, 1, 1)))(tile)
    alpha_small = alpha_in[:T // 8]

    cparams = pltpu.CompilerParams(vmem_limit_bytes=34 * 1024 * 1024)

    def emission(em_ref, obs_ref, i):
        e = em_ref[i]
        o = obs_ref[i]
        return (e[0][:, None] + e[1][:, None] * o[0][None, :]
                + e[2][:, None] * o[1][None, :])

    def dot(m, v):
        return jnp.dot(m, v.astype(cdt), preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)

    # ---------------- forward variants --------------------------------
    def make_fwd(store_every, norm_block=False):
        """norm_block: normalize the carry once per S-block instead of per
        site. Unnormalized alpha is EXACT for every decoder output (the
        posterior combine renormalizes per site, invariant to alpha
        scale); within-block drift stays comfortably inside f32/bf16
        exponent range."""
        def kernel(ops_ref, *rest):
            m = rest[:S]
            em_ref, obs_ref, isp_ref, alpha_ref, carry = rest[S:]
            t = pl.program_id(0)

            def norm(c, i):
                if norm_block and i != S - 1:
                    return c
                return c / jnp.sum(c, axis=0, keepdims=True)

            for i in range(S):
                if i == 0:
                    @pl.when(t == 0)
                    def _():
                        c = isp_ref[0][:, None] * emission(em_ref, obs_ref, 0)
                        carry[:] = norm(c, 0)

                    @pl.when(t > 0)
                    def _():
                        c = dot(m[0][0], carry[:]) \
                            * emission(em_ref, obs_ref, 0)
                        carry[:] = norm(c, 0)
                else:
                    c = dot(m[i][0], carry[:]) * emission(em_ref, obs_ref, i)
                    carry[:] = norm(c, i)
                if store_every or i == S - 1:
                    alpha_ref[i if store_every else 0] = \
                        carry[:KA].astype(adt)
        return kernel

    def blk(t, *a):
        return (t, 0, 0)

    def run_fwd(store_every, norm_block=False):
        op_specs = [pl.BlockSpec((1, KC, KC),
                                 lambda t, ops, i=i: (ops[S * t + i], 0, 0))
                    for i in range(S)]
        rows = S if store_every else 1
        grid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nblk,),
            in_specs=op_specs + [
                pl.BlockSpec((S, 3, KC), blk),
                pl.BlockSpec((S, 2, P), blk),
                pl.BlockSpec((1, KC), lambda t, *a: (0, 0))],
            out_specs=pl.BlockSpec((rows, KA, P),
                                   (blk if store_every
                                    else (lambda t, *a: (t, 0, 0)))),
            scratch_shapes=[pltpu.VMEM((KC, P), jnp.float32)])
        shape = (T, KA, P) if store_every else (nblk, KA, P)
        f = pl.pallas_call(make_fwd(store_every, norm_block),
                           grid_spec=grid,
                           out_shape=jax.ShapeDtypeStruct(shape, adt),
                           compiler_params=cparams)
        g = jax.jit(lambda oi, m, e, o, s: f(oi, *([m] * S), e, o, s))
        return lambda: g(ops_idx, M, em, obs, isp)

    # ---------------- backward-shaped variants ------------------------
    def make_bwd(read_every, norm_block=False):
        def kernel(ops_ref, *rest):
            m = rest[:S]
            em_ref, obs_ref, alpha_ref, out_ref, carry = rest[S:]
            t = pl.program_id(0)
            for i in range(S):
                r = S - 1 - i
                c = dot(m[i][0], carry[:] * emission(em_ref, obs_ref, r))
                if norm_block and i != S - 1:
                    carry[:] = c
                else:
                    carry[:] = c / jnp.sum(c, axis=0, keepdims=True)
                a = alpha_ref[r if read_every else 0].astype(jnp.float32)
                post = a * (c[:KA] if norm_block else carry[:KA])
                post = post / jnp.sum(post, axis=0, keepdims=True)
                out_ref[r, 0] = jnp.sum(
                    jnp.where(jax.lax.broadcasted_iota(
                        jnp.int32, post.shape, 0) < 10, post, 0.0), axis=0)
        return kernel

    def run_bwd(read_every, norm_block=False):
        def rev(t, *a):
            return (nblk - 1 - t, 0, 0)
        op_specs = [pl.BlockSpec(
            (1, KC, KC), lambda t, ops, i=i: (ops[T - 1 - (S * t + i)], 0, 0))
            for i in range(S)]
        rows = S if read_every else 1
        grid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nblk,),
            in_specs=op_specs + [
                pl.BlockSpec((S, 3, KC), rev),
                pl.BlockSpec((S, 2, P), rev),
                pl.BlockSpec((rows, KA, P),
                             rev if read_every else (lambda t, *a:
                                                     (nblk - 1 - t, 0, 0)))],
            out_specs=pl.BlockSpec((S, 1, P), rev),
            scratch_shapes=[pltpu.VMEM((KC, P), jnp.float32)])
        src = alpha_in if read_every else alpha_small
        f = pl.pallas_call(make_bwd(read_every, norm_block),
                           grid_spec=grid,
                           out_shape=jax.ShapeDtypeStruct(
                               (T, 1, P), jnp.float32),
                           compiler_params=cparams)
        g = jax.jit(lambda oi, m, e, o, a: f(oi, *([m] * S), e, o, a))
        return lambda: g(ops_idx, M, em, obs, src)

    only = os.environ.get("ALPHA_WALL_ONLY", "").split(",")
    variants = [("fwd_store", lambda: run_fwd(True)),
                ("fwd_nostore", lambda: run_fwd(False)),
                ("bwd_read", lambda: run_bwd(True)),
                ("bwd_noread", lambda: run_bwd(False)),
                ("fwd_norm_block", lambda: run_fwd(True, norm_block=True)),
                ("bwd_norm_block", lambda: run_bwd(True, norm_block=True))]
    if only != [""]:
        variants = [(n, f) for n, f in variants if n in only]
    out = {}
    if os.path.exists(os.path.join(REPO, "ALPHA_WALL.json")):
        out = json.load(open(os.path.join(REPO, "ALPHA_WALL.json")))
    for name, mk in variants:
        fn = mk()
        fn()  # compile
        r = measure_throughput(lambda: fn(), 1, min_s=6.0, chunk=8)
        ms = 1e3 / r
        out[name] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms per [T={T}, P={P}] pass", flush=True)

    alpha_gb = T * KA * P * 2 / 1e9
    out["alpha_GB_per_pass"] = round(alpha_gb, 2)
    d_store = out["fwd_store"] - out["fwd_nostore"]
    d_read = out["bwd_read"] - out["bwd_noread"]
    if d_store > 0.05 * out["fwd_store"]:
        bw = alpha_gb * (1 - 1 / S) / (d_store / 1e3)
        print(f"alpha WRITE costs {d_store:.2f} ms "
              f"({100 * d_store / out['fwd_store']:.0f}% of fwd) "
              f"-> effective {bw:.0f} GB/s")
    else:
        print("alpha write ~free: fwd pass is MXU-bound")
    if d_read > 0.05 * out["bwd_read"]:
        bw = alpha_gb * (1 - 1 / S) / (d_read / 1e3)
        print(f"alpha READ costs {d_read:.2f} ms "
              f"({100 * d_read / out['bwd_read']:.0f}% of bwd) "
              f"-> effective {bw:.0f} GB/s")
    else:
        print("alpha read ~free: bwd pass is MXU-bound")

    with open(os.path.join(REPO, "ALPHA_WALL.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("ALPHA_WALL_PROBE_OK")


if __name__ == "__main__":
    main()
