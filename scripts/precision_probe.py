"""What does each jax.lax.Precision actually do on this TPU?

Numerically distinguishes single-pass bf16, bf16x3, and bf16x6 (f32
emulation) for DEFAULT/HIGHEST matmuls, and times their throughput.
Informs the decode-kernel roofline: if DEFAULT is single-pass bf16, the
"fast" and "turbo" profiles are the same numeric path and the headline
profile split should be re-labeled.

Run:  cd /root/repo && /opt/venv/bin/python scripts/precision_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastsmc_tpu.utils.sync import measure_throughput  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() not in ("cpu",)
    rng = np.random.default_rng(0)
    n = 1024
    a = rng.standard_normal((n, n)).astype(np.float32)
    b = rng.standard_normal((n, n)).astype(np.float32)
    ref = a.astype(np.float64) @ b.astype(np.float64)

    # host emulations of the candidate algorithms
    def split_bf16(x, k):
        """x (f32) as a sum of k bf16 terms."""
        parts = []
        r = x.astype(np.float64)
        for _ in range(k):
            p = r.astype(np.float32).astype(jnp.bfloat16).astype(np.float64)
            parts.append(p)
            r = r - p
        return parts

    def emu_passes(a, b, ka, kb, keep):
        """sum over the `keep` highest-order cross products of the
        bf16 decompositions (bf16x3 keeps 3: a0b0, a0b1, a1b0;
        bf16x6 keeps 6: +a1b1, a0b2, a2b0)."""
        pa, pb = split_bf16(a, ka), split_bf16(b, kb)
        terms = []
        for i in range(ka):
            for j in range(kb):
                terms.append((i + j, i, j))
        terms.sort()
        acc = np.zeros(ref.shape, np.float64)
        for _, i, j in terms[:keep]:
            acc += pa[i] @ pb[j]
        return acc

    cands = {
        "bf16x1": emu_passes(a, b, 1, 1, 1),
        "bf16x3": emu_passes(a, b, 2, 2, 3),
        "bf16x6": emu_passes(a, b, 3, 3, 6),
        "f32": (a.astype(np.float64) @ b.astype(np.float64)),
    }

    for prec in ("DEFAULT", "HIGHEST"):
        f = jax.jit(lambda x, y, p=getattr(jax.lax.Precision, prec):
                    jnp.dot(x, y, precision=p))
        got = np.asarray(f(a, b), np.float64)
        errs = {k: float(np.max(np.abs(got - v)) / np.max(np.abs(ref)))
                for k, v in cands.items()}
        best = min(errs, key=errs.get)
        print(f"{prec}: best-matching algorithm = {best}   "
              + "  ".join(f"{k}:{v:.2e}" for k, v in errs.items()))

    # explicit bf16-operand matmul vs DEFAULT f32: bitwise comparison
    fd = jax.jit(lambda x, y: jnp.dot(x, y,
                                      precision=jax.lax.Precision.DEFAULT))
    fb = jax.jit(lambda x, y: jnp.dot(x.astype(jnp.bfloat16),
                                      y.astype(jnp.bfloat16),
                                      preferred_element_type=jnp.float32,
                                      precision=jax.lax.Precision.DEFAULT))
    d1 = np.asarray(fd(a, b))
    d2 = np.asarray(fb(a, b))
    print(f"f32-DEFAULT vs explicit-bf16 operands: bitwise equal = "
          f"{np.array_equal(d1, d2)}  maxdiff = "
          f"{np.max(np.abs(d1 - d2)):.3e}")

    # throughput ratios
    m = 4096
    aa = jnp.asarray(rng.standard_normal((m, m)), jnp.float32)
    bb = jnp.asarray(rng.standard_normal((m, m)), jnp.float32)
    ab = aa.astype(jnp.bfloat16)
    bbb = bb.astype(jnp.bfloat16)
    flops = 2 * m * m * m

    def bench(fn, *args):
        g = jax.jit(fn)
        g(*args)  # compile
        reps = measure_throughput(lambda: g(*args), 1, min_s=3.0)
        return reps * flops / 1e12

    t_def = bench(lambda x, y: jnp.dot(x, y,
                  precision=jax.lax.Precision.DEFAULT), aa, bb)
    t_hi = bench(lambda x, y: jnp.dot(x, y,
                 precision=jax.lax.Precision.HIGHEST), aa, bb)
    t_bf = bench(lambda x, y: jnp.dot(x, y,
                 preferred_element_type=jnp.float32), ab, bbb)
    print(f"matmul TFLOP/s @ {m}: DEFAULT(f32-in)={t_def:.1f} "
          f"HIGHEST={t_hi:.1f} bf16-operands={t_bf:.1f}")
    print("PRECISION_PROBE_OK")


if __name__ == "__main__":
    main()
