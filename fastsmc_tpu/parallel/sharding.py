"""Multi-chip scaling: pair-stream data parallelism over a device mesh.

The reference scales out by launching independent OS processes over a
triangular tiling of the pair matrix and merging output files
(SURVEY.md §2.3; Data.cpp:62-80, cpp_example/FastSMC_example_multiple_jobs.sh).
The TPU-native replacement keeps that *embarrassing* outer tiling for
multi-host jobs (the ``jobs``/``job_ind`` window math is preserved in
``io.haps.JobWindows``), and adds intra-job scaling over the chips of a mesh:

  * the candidate-pair batch axis is sharded over the mesh ("pairs" axis)
    with ``shard_map`` — each chip decodes its slice of pairs with the same
    replicated model tables, running the production Pallas kernels per chip
    on TPU (``BatchedDecoder`` on CPU meshes);
  * over-pairs accumulators (posterior sums, major/minor sums) are combined
    with ``psum`` over ICI and come back replicated;
  * per-pair outputs (posterior, threshold sums, means, MAPs) keep the pair
    axis sharded and are gathered on host only at write time.

:class:`ShardedDecoder` is interface-compatible with
:class:`fastsmc_tpu.engine.kernels.PallasDecoder` (``decode_pairs`` with
``BwdOutputs``), so ``FastSMC(..., mesh=...)`` / ``ASMC(..., mesh=...)``
drop it into the production pipelines unchanged.

On a single host this also validates on the 8-device virtual CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.6 exposes shard_map at top level
    shard_map = jax.shard_map  # type: ignore[attr-defined]
except AttributeError:
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..engine.hmm import BatchedDecoder, bucket_len
from ..engine.kernels import BwdOutputs, PallasDecoder
from ..engine.oracle import DecodeContext


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "pairs",
              devices=None) -> Mesh:
    """1-D pair-parallel mesh. ``devices`` overrides the pool (e.g.
    ``jax.local_devices()`` for the per-host mesh in a multi-process run,
    where each host decodes its own job tiles — parallel/multihost.py)."""
    devs = jax.devices() if devices is None else list(devices)
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


# out_specs builders per BwdOutputs field: which outputs keep the pair axis
# sharded vs come back replicated after a psum over the mesh
_SUM_OUTPUTS = frozenset({"posterior_sums", "major_minor_sums"})


class ShardedDecoder:
    """Pair-parallel decoding over a mesh (production engine).

    Wraps the per-chip engine — :class:`PallasDecoder` on TPU backends,
    :class:`BatchedDecoder` elsewhere — with ``shard_map`` over the pair
    axis.  The global pair batch size must be a multiple of the mesh size.

    ``decode_pairs(hap_a, hap_b, t0, t_len, outputs, state_threshold)``
    matches :class:`PallasDecoder` exactly: it returns a dict of the
    requested :class:`BwdOutputs` with over-pairs sums ``psum``-combined
    (replicated) and per-pair outputs left sharded over the mesh.
    """

    def __init__(self, ctx: DecodeContext, mesh: Mesh,
                 axis_name: str = "pairs",
                 use_pallas: Optional[bool] = None,
                 decode_profile: str = "exact"):
        self.ctx = ctx
        self.mesh = mesh
        self.axis = axis_name
        self.n_devices = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        self._use_pallas = use_pallas
        if use_pallas:
            from ..pipelines.asmc import _profile_kwargs
            self.dec = PallasDecoder(ctx, **_profile_kwargs(decode_profile))
        else:
            self.dec = BatchedDecoder(ctx)
        self.L = ctx.data.sites
        self.K = ctx.dq.states

    # expected-times override forwards to the inner engine (the fused
    # per_pair_mean reduction and the CPU emulation both read it)
    @property
    def exp_times(self):
        return self.dec.exp_times

    @exp_times.setter
    def exp_times(self, value):
        self.dec.exp_times = value

    @property
    def alpha_dtype(self):
        """Forward the inner engine's alpha storage dtype (the pipeline's
        HBM decode-memory guard reads it)."""
        import numpy as _np
        return getattr(self.dec, "alpha_dtype", _np.dtype(_np.float32))

    # the pipeline's production grouped flow (decode+extract+ages fused
    # per batch) runs per shard under shard_map; packed rows come back
    # [n_devices, 3*cap+2] and are merged on host at drain time
    supports_fused_extract = True

    @property
    def n_extract_shards(self) -> int:
        return self.n_devices

    # ------------------------------------------------------------------
    def _emulated_outputs(self, post, hap_bits, ha, hb, t0: int, t_len: int,
                          outs: BwdOutputs, state_threshold: int) -> dict:
        """Build the BwdOutputs dict from a full posterior [T, K, p]
        (BatchedDecoder path — mirrors the fused Pallas reductions)."""
        r = {}
        if outs.posterior:
            r["posterior"] = post
        if outs.posterior_sums:
            r["posterior_sums"] = jnp.sum(post, axis=2)
        if outs.per_pair_mean:
            expt = self.dec.exp_times
            expt = expt.reshape(-1)[:self.K]
            r["per_pair_mean"] = jnp.einsum("tkp,k->tp", post, expt)
        if outs.per_pair_map:
            r["per_pair_map"] = jnp.argmax(post, axis=1).astype(jnp.float32)
        if outs.threshold_sums:
            r["threshold_sums"] = jnp.sum(post[:, :state_threshold, :],
                                          axis=1)
        if outs.major_minor_sums:
            L = self.L
            real = min(t_len, L - t0)
            a = hap_bits[ha][:, t0:t0 + real]
            b = hap_bits[hb][:, t0:t0 + real]
            xor = (a ^ b).astype(jnp.float32)
            hom = (a & b).astype(jnp.float32)
            pad = t_len - real
            if pad:
                xor = jnp.pad(xor, ((0, 0), (0, pad)), constant_values=1.0)
                hom = jnp.pad(hom, ((0, 0), (0, pad)), constant_values=0.0)
            oz = (1.0 - xor).T                      # [T, p]
            oh = hom.T
            w00 = oz * (1.0 - oh)
            w01 = 1.0 - oz
            w11 = oh
            r["major_minor_sums"] = jnp.stack(
                [jnp.einsum("tkp,tp->tk", post, w)
                 for w in (w00, w01, w11)], axis=1)   # [T, 3, K]
        return r

    @functools.partial(jax.jit, static_argnums=(0, 5, 6, 7, 8))
    def _decode_sharded(self, tables, hap_bits, hap_a, hap_b, t0: int,
                        t_len: int, outs: BwdOutputs, state_threshold: int):
        axis = self.axis

        def local(tabs, bits, ha, hb):
            if self._use_pallas:
                r = self.dec._decode_jit(tabs, bits, ha, hb,
                                         jnp.asarray(t0, jnp.int32),
                                         t_len, outs, state_threshold)
            else:
                post = self.dec._decode_jit(bits, ha, hb, t0, t_len)
                r = self._emulated_outputs(post, bits, ha, hb, t0, t_len,
                                           outs, state_threshold)
            return {k: (jax.lax.psum(v, axis) if k in _SUM_OUTPUTS else v)
                    for k, v in r.items()}

        out_specs = {}
        for name in outs._fields:
            if not getattr(outs, name):
                continue
            if name in _SUM_OUTPUTS:
                out_specs[name] = P()
            elif name == "posterior":
                out_specs[name] = P(None, None, axis)
            else:  # [T, P] per-pair reductions
                out_specs[name] = P(None, axis)

        # pallas_call inside shard_map cannot express varying-mesh-axes
        # metadata on its output avals; disable the vma/replication check
        # (the out_specs above state the sharding explicitly)
        try:
            f = shard_map(local, mesh=self.mesh,
                          in_specs=(P(), P(), P(axis), P(axis)),
                          out_specs=out_specs, check_vma=False)
        except TypeError:  # older jax spells it check_rep
            f = shard_map(local, mesh=self.mesh,
                          in_specs=(P(), P(), P(axis), P(axis)),
                          out_specs=out_specs, check_rep=False)
        return f(tables, hap_bits, hap_a, hap_b)

    def decode_pairs(self, hap_a, hap_b, t0: int = 0,
                     t_len: Optional[int] = None,
                     outputs: BwdOutputs = BwdOutputs(),
                     state_threshold: int = 0) -> dict:
        """Decode a global batch of hap pairs over [t0, t0+t_len), sharded
        over the mesh. Same contract as ``PallasDecoder.decode_pairs``."""
        t_len = self.L - t0 if t_len is None else t_len
        P_global = int(np.shape(hap_a)[0])
        if P_global % self.n_devices != 0:
            raise ValueError(
                f"global pair batch {P_global} is not divisible by mesh "
                f"size {self.n_devices}")
        tables = self.dec._tables() if self._use_pallas else {}
        return self._decode_sharded(tables, self.dec.hap_bits,
                                    jnp.asarray(hap_a), jnp.asarray(hap_b),
                                    int(t0), int(t_len), outputs,
                                    int(state_threshold))

    # ------------------------------------------------------------------
    # fused decode + in-jit extraction (+ device age estimates): the
    # production validation flow, per shard under shard_map. Matches
    # PallasDecoder.decode_extract_packed except the packed row and age
    # rows come back with a leading shard axis ([S, 3*cap+2] /
    # [S, 2, capp]); segments.merge_packed_shards reassembles the global
    # pair-major boundary stream (shards partition the pair axis in
    # order, so concatenation preserves the reference emission order).
    # ------------------------------------------------------------------
    @functools.partial(jax.jit,
                       static_argnums=(0, 5, 6, 7, 8, 9, 10, 11, 12))
    def _dep_jit(self, tables, hap_bits, hap_a, hap_b, t_len: int,
                 state_threshold: int, cap: int, pps_cap: int, kcap: int,
                 age_threshold: int, need_ages: bool, t0_static: int,
                 scalars=None, w0=None, w1=None):
        from ..engine import segments as seg
        axis = self.axis
        outs = BwdOutputs(posterior=need_ages, posterior_sums=False,
                          threshold_sums=True)
        windowed = w0 is not None

        def local(tabs, bits, ha, hb, sc, lw0, lw1):
            t0, s0, s1, pthr, isp = sc
            if self._use_pallas:
                r = self.dec._decode_body(tabs, bits, ha, hb, t0, t_len,
                                          outs, state_threshold)
                exp = tabs["exp"].reshape(-1)[:self.K]
            else:
                post = self.dec._decode_jit(bits, ha, hb, t0_static, t_len)
                r = self._emulated_outputs(post, bits, ha, hb, t0_static,
                                           t_len, outs, state_threshold)
                exp = self.dec.exp_times.reshape(-1)[:self.K]
            th = r["threshold_sums"]
            if windowed:
                # per-candidate scan windows (see PallasDecoder
                # _decode_extract_jit) — local pair slice of w0/w1
                pos = jnp.arange(th.shape[0], dtype=jnp.int32)
                in_win = ((pos[:, None] >= lw0[None, :])
                          & (pos[:, None] < lw1[None, :]))
                th = jnp.where(in_win, th, jnp.float32(-1.0))
            packed, pps = seg._extract_packed_impl(
                th, s0, s1, pthr, cap,
                r["posterior"] if need_ages else None, pps_cap, kcap)
            if not need_ages:
                return packed[None], r["threshold_sums"]
            ages = seg.run_ages_jax(pps, exp, isp, age_threshold)
            return packed[None], ages[None], r["threshold_sums"]

        out_specs = (P(axis, None), P(axis, None, None), P(None, axis)) \
            if need_ages else (P(axis, None), P(None, axis))
        wspec = P(axis) if windowed else P()
        in_specs = (P(), P(), P(axis), P(axis), P(), wspec, wspec)
        try:
            f = shard_map(local, mesh=self.mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
        except TypeError:  # older jax spells it check_rep
            f = shard_map(local, mesh=self.mesh, in_specs=in_specs,
                          out_specs=out_specs, check_rep=False)
        if not windowed:
            w0 = w1 = jnp.zeros((), jnp.int32)
        return f(tables, hap_bits, hap_a, hap_b, scalars, w0, w1)

    def decode_extract_packed(self, hap_a, hap_b, t0: int, t_len: int,
                              state_threshold: int, s0, s1, prob_threshold,
                              cap: int, pps_cap: int, age_threshold: int,
                              initial_state_prob, need_ages: bool = True,
                              w0=None, w1=None, kcap: int = 0):
        """Sharded mirror of ``PallasDecoder.decode_extract_packed``:
        returns (packed [S, 3*kcap+2] i32, ages [S, 2, min(kcap,
        pps_cap)] f32 or None, threshold_sums [T, P] pair-sharded). Each
        shard extracts its own pairs with the full ``cap``/``kcap`` (run
        counts are not balanced across shards), so host-side cap-overflow
        checks apply per shard."""
        P_global = int(np.shape(hap_a)[0])
        if P_global % self.n_devices != 0:
            raise ValueError(
                f"global pair batch {P_global} is not divisible by mesh "
                f"size {self.n_devices}")
        T, P_local = int(t_len), P_global // self.n_devices
        if T * P_local >= 1 << 28:
            raise ValueError(f"T*P_local = {T * P_local} >= 2**28 "
                             "overflows the packed boundary encoding")
        kcap = kcap or cap
        if cap <= 0 or cap % 256 or pps_cap <= 0 or pps_cap % 256 \
                or kcap % 256 or kcap > cap:
            raise ValueError(f"cap={cap}/kcap={kcap}/pps_cap={pps_cap} "
                             "must be positive multiples of 256 with "
                             "kcap <= cap")
        pps_cap = min(pps_cap, kcap)
        tables = self.dec._tables() if self._use_pallas else {}
        import jax.numpy as jnp
        scalars = (jnp.asarray(t0, jnp.int32), jnp.asarray(s0, jnp.int32),
                   jnp.asarray(s1, jnp.int32),
                   jnp.asarray(prob_threshold, jnp.float32),
                   jnp.asarray(initial_state_prob, jnp.float32))
        if w0 is not None:
            w0 = jnp.asarray(w0, jnp.int32)
            w1 = jnp.asarray(w1, jnp.int32)
        res = self._dep_jit(tables, self.dec.hap_bits,
                            jnp.asarray(hap_a), jnp.asarray(hap_b),
                            int(t_len), int(state_threshold), int(cap),
                            int(pps_cap), int(kcap), int(age_threshold),
                            bool(need_ages),
                            0 if self._use_pallas else int(t0),
                            scalars=scalars, w0=w0, w1=w1)
        if need_ages:
            return res
        packed, th = res
        return packed, None, th

    # ------------------------------------------------------------------
    # convenience wrappers kept for the library surface / tests
    # ------------------------------------------------------------------
    def posterior_sums(self, hap_a, hap_b, t0: int, t_len: int):
        """Sum-over-pairs [T, K] across the whole mesh (psum over ICI)."""
        r = self.decode_pairs(hap_a, hap_b, t0, t_len,
                              BwdOutputs(posterior=False,
                                         posterior_sums=True), 0)
        return r["posterior_sums"][:, :self.K]

    def per_pair_outputs(self, hap_a, hap_b, t0: int, t_len: int,
                         state_threshold: int):
        """Sharded per-pair reductions: (threshold_sums [T, Pglobal],
        posterior_mean [T, Pglobal]) with the pair axis left sharded."""
        r = self.decode_pairs(hap_a, hap_b, t0, t_len,
                              BwdOutputs(posterior=False, per_pair_mean=True,
                                         threshold_sums=True),
                              state_threshold)
        return r["threshold_sums"], r["per_pair_mean"]


def training_step(ctx: DecodeContext, mesh: Mesh):
    """Build the canonical multi-chip step: jitted, shard_map'ed full
    decode + reduction over the mesh. Returns (fn, example_args)."""
    sd = ShardedDecoder(ctx, mesh)
    P_global = 2 * sd.n_devices
    rng = np.random.default_rng(0)
    ha = rng.integers(0, ctx.data.n_haps, P_global).astype(np.int32)
    hb = (ha + 1) % ctx.data.n_haps
    t_len = 64

    def step(hap_a, hap_b):
        return sd.posterior_sums(hap_a, hap_b, 0, t_len)

    return step, (jnp.asarray(ha), jnp.asarray(hb))
