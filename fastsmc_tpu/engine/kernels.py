"""Pallas TPU kernels for the batched forward-backward decoder.

This is the speed-of-light compute path.  The XLA ``lax.scan`` engine
(engine/hmm.py) pays a fixed ~15us per scan iteration on TPU; these kernels
run the genome loop as a Pallas grid with the recursion carry resident in
VMEM, cutting the per-step cost to the DMA/matmul floor.

Design (per SURVEY.md §7 and the dense-operator reformulation in
engine/dense.py):

  * grid = (T // S,) over genome positions, S sites unrolled per grid step —
    the Pallas grid costs ~4us/step on this chip, so unrolling S=4..8 sites
    into one step amortizes it to <1us/site; the carry [Kc, P] lives in a
    VMEM scratch that persists across sequential grid steps;
  * per-step dense transition operators (128x128 padded, float32) are
    gathered from HBM by ``PrefetchScalarGridSpec`` index maps (one BlockSpec
    per unrolled sub-step) — the Pallas pipeline double-buffers the DMA
    behind the matmul automatically;
  * emissions are reconstructed in-kernel from the 3 per-site component rows
    and the per-pair observation bits:
        em = em1 + em0minus1 * obsIsZero + em2minus0 * obsIsHomMinor
    (mirrors HMM.cpp:827-828);
  * the backward kernel needs emissions/observations at ``pos+1``, which
    crosses the S-block boundary; instead of materializing shifted copies in
    HBM, the same array is passed twice with the second BlockSpec pointing at
    the adjacent block (row 0 of block+1 supplies the boundary element);
  * the backward kernel fuses beta recursion, posterior combine, and the
    reduction outputs (posterior sums over pairs, per-pair posterior means,
    MAP states, IBD threshold sums), so the full [T, K, P] posterior never
    has to be materialised unless explicitly requested;
  * ``alpha_dtype=bfloat16`` stores the forward messages in bf16, halving
    the dominant HBM stream (the posterior is renormalized per site, so the
    ~3 decimal digits of bf16 introduce only ~1e-3 relative posterior error
    while doubling the max pair batch per chip).

K (number of TMRCA states) must be <= 128; compute is padded to Kc = 128
lanes. All math float32 (reference NO_SSE semantics) at matmul precision
HIGHEST by default; ``precision="fast"`` trades ~1e-3 posterior error for
higher matmul throughput (single-pass bf16 instead of the bf16x6
f32-emulation; see _PRECISIONS).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dense import build_dense_operators
from .oracle import DecodeContext

KC = 128  # padded state (compute) dimension

_PRECISIONS = {
    # reference NO_SSE semantics: f32-faithful matmul (bf16x6 MXU passes)
    "highest": jax.lax.Precision.HIGHEST,
    # measured on the v5e chip (scripts/precision_probe.py): DEFAULT is a
    # SINGLE-PASS bf16 matmul — bitwise equal to explicitly casting the
    # operands to bf16 (there is no bf16x3 tier; Mosaic cannot lower
    # Precision.HIGH). The per-step normalization keeps the recursion
    # stable; posterior error ~6e-3, segment-level output quality pinned
    # by PROFILE_ACCURACY.json (bp-F1 0.998 vs exact).
    "fast": jax.lax.Precision.DEFAULT,
    # "turbo" additionally stores the operator blocks in bf16 (half the
    # operator DMA); its matmul results are bitwise identical to "fast"
    # because DEFAULT already rounds operands to bf16.
    "turbo": jax.lax.Precision.DEFAULT,
}

# VMEM working-set budget for picking the unroll factor, and the Mosaic
# scoped-vmem limit we request (v5e default scoped limit is 16 MB; the
# physical VMEM is larger, so we raise it and keep our own budget under it)
_VMEM_BUDGET = 24 * 1024 * 1024
_VMEM_LIMIT = 34 * 1024 * 1024


def _compiler_params(interpret: bool):
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _round8(n: int) -> int:
    return (n + 7) // 8 * 8


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _make_fwd_kernel(S: int, ka: int, seq: bool, alpha_dtype, precision,
                     compute_dtype=jnp.float32, norm_block: bool = False):
    def kernel(*refs):
        if seq:
            sops_ref, rops_ref, mask_ref = refs[:3]
            rest = list(refs[3:])
            m1 = rest[:S]
            m2 = rest[S:2 * S]
            (em_ref, hem_ref, obs_ref, isp_ref, alpha_ref, carry) = rest[2 * S:]
        else:
            ops_ref, mask_ref = refs[:2]
            rest = list(refs[2:])
            m1 = rest[:S]
            (em_ref, obs_ref, isp_ref, alpha_ref, carry) = rest[S:]
        t = pl.program_id(0)

        def emission(i):
            e = em_ref[i]                     # [3, KC]
            o = obs_ref[i]                    # [2, P]
            return (e[0][:, None] + e[1][:, None] * o[0][None, :]
                    + e[2][:, None] * o[1][None, :])

        def dot(m, v):
            # operator blocks are stored in compute_dtype; casting the
            # vector operand to match selects the single-pass MXU path for
            # the "turbo" (bf16) profile
            return jnp.dot(m, v.astype(compute_dtype),
                           preferred_element_type=jnp.float32,
                           precision=precision)

        def step(i):
            em = emission(i)
            c = dot(m1[i][0], carry[:])
            if seq:
                # sequence mode: homozygous-emission half-step between
                # markers, then the marker step (HMM.cpp:760-770)
                mid = c * hem_ref[i, 0][:, None]
                c = dot(m2[i][0], mid)
            c = c * em
            if norm_block and i != S - 1:
                # block normalization (fast/turbo): unnormalized alpha is
                # EXACT for every output — the posterior combine
                # renormalizes per site, invariant to alpha scale; the
                # per-site sum+divide is ~5% of the forward pass
                # (ALPHA_WALL.json fwd_norm_block)
                carry[:] = c
                return
            s = jnp.sum(c, axis=0, keepdims=True)
            if norm_block:
                carry[:] = c * (1.0 / s)
            else:
                inv = jnp.where(mask_ref[S * t + i] != 0, 1.0 / s, 1.0)
                carry[:] = c * inv

        for i in range(S):
            if i == 0:
                @pl.when(t == 0)
                def _():
                    # initial alpha = initialStateProb * em, normalized
                    c = isp_ref[0][:, None] * emission(0)
                    carry[:] = c / jnp.sum(c, axis=0, keepdims=True)

                @pl.when(t > 0)
                def _():
                    step(0)
            else:
                step(i)
            # store only the KA real (rounded-to-8) state rows to HBM
            alpha_ref[i] = carry[:ka].astype(alpha_dtype)
    return kernel


# ---------------------------------------------------------------------------
# backward + combine kernel (factory: reduction outputs are compile-time)
# ---------------------------------------------------------------------------

class BwdOutputs(NamedTuple):
    posterior: bool = True
    posterior_sums: bool = False
    per_pair_mean: bool = False
    per_pair_map: bool = False           # argmax_k posterior (state index)
    threshold_sums: bool = False         # sum_{k < state_threshold} posterior
    major_minor_sums: bool = False       # 00/01/11-partitioned pair sums


_OUT_NAMES = ("posterior", "posterior_sums", "per_pair_mean",
              "per_pair_map", "threshold_sums", "major_minor_sums")


def _make_bwd_kernel(outs: BwdOutputs, S: int, K: int, ka: int,
                     state_threshold: int, seq: bool, precision,
                     compute_dtype=jnp.float32, norm_block: bool = False):
    def kernel(*all_refs):
        if seq:
            sops_ref, rops_ref, mask_ref = all_refs[:3]
            rest = list(all_refs[3:])
            m1 = rest[:S]
            m2 = rest[S:2 * S]
            (em_lo_ref, em_hi_ref, hem_ref, obs_lo_ref, obs_hi_ref,
             alpha_ref, exp_ref, *out_and_scratch) = rest[2 * S:]
        else:
            ops_ref, mask_ref = all_refs[:2]
            rest = list(all_refs[2:])
            m1 = rest[:S]
            (em_lo_ref, em_hi_ref, obs_lo_ref, obs_hi_ref,
             alpha_ref, exp_ref, *out_and_scratch) = rest[S:]
        refs = list(out_and_scratch)
        out_refs = {}
        for name in _OUT_NAMES:
            if getattr(outs, name):
                out_refs[name] = refs.pop(0)
        carry, = refs

        t = pl.program_id(0)

        def nxt(lo, hi, r):
            # row at pos+1: row r+1 of this (reversed) block, or row 0 of the
            # adjacent block when pos+1 crosses the boundary
            return lo[r + 1] if r + 1 < S else hi[0]

        def dot(m, v):
            return jnp.dot(m, v.astype(compute_dtype),
                           preferred_element_type=jnp.float32,
                           precision=precision)

        def step(i):
            r = S - 1 - i
            e = nxt(em_lo_ref, em_hi_ref, r)    # [3, KC] at pos+1
            o = nxt(obs_lo_ref, obs_hi_ref, r)  # [2, P] at pos+1
            em = (e[0][:, None] + e[1][:, None] * o[0][None, :]
                  + e[2][:, None] * o[1][None, :])
            if seq:
                # HMM.cpp:915-925: homozygous half-step, then marker step
                mid = dot(m1[i][0], carry[:] * hem_ref[r, 0][:, None])
                c = dot(m2[i][0], mid * em)
            else:
                c = dot(m1[i][0], carry[:] * em)
            if norm_block and i != S - 1:
                # see _make_fwd_kernel: the combine renormalizes per site,
                # so beta scale drift within a block is exact-in-math
                carry[:] = c
                return
            s = jnp.sum(c, axis=0, keepdims=True)
            if norm_block:
                carry[:] = c * (1.0 / s)
            else:
                inv = jnp.where(mask_ref[S * t + i] != 0, 1.0 / s, 1.0)
                carry[:] = c * inv

        for i in range(S):
            r = S - 1 - i
            if i == 0:
                @pl.when(t == 0)
                def _():
                    # lastBeta = 1/K on real states (HMM.cpp:886-897)
                    k_idx = jax.lax.broadcasted_iota(jnp.int32, (KC, 1), 0)
                    init = jnp.where(k_idx < K, 1.0 / K, 0.0
                                     ).astype(jnp.float32)
                    carry[:] = jnp.broadcast_to(init, carry.shape)

                @pl.when(t > 0)
                def _():
                    step(0)
            else:
                step(i)

            post = alpha_ref[r].astype(jnp.float32) * carry[:ka]  # [KA, P]
            post = post / jnp.sum(post, axis=0, keepdims=True)

            if outs.posterior:
                out_refs["posterior"][r] = post
            if outs.posterior_sums:
                out_refs["posterior_sums"][r, 0] = jnp.sum(post, axis=1)
            if outs.per_pair_mean:
                out_refs["per_pair_mean"][r, 0] = jnp.sum(
                    post * exp_ref[0][:ka][:, None], axis=0)
            if outs.per_pair_map:
                out_refs["per_pair_map"][r, 0] = jnp.argmax(
                    post, axis=0).astype(jnp.float32)
            if outs.threshold_sums:
                k_idx = jax.lax.broadcasted_iota(jnp.int32, post.shape, 0)
                masked = jnp.where(k_idx < state_threshold, post, 0.0)
                out_refs["threshold_sums"][r, 0] = jnp.sum(masked, axis=0)
            if outs.major_minor_sums:
                # classification per pair at this site (augmentSumOverPairs,
                # HMM.cpp:1063-1069): homMinor -> 11; obsBits == 0 -> 00;
                # else 01
                oz = obs_lo_ref[r, 0][None, :]
                oh = obs_lo_ref[r, 1][None, :]
                w11 = oh
                w00 = oz * (1.0 - oh)
                w01 = 1.0 - oz
                rr = out_refs["major_minor_sums"]
                rr[r, 0] = jnp.sum(post * w00, axis=1)
                rr[r, 1] = jnp.sum(post * w01, axis=1)
                rr[r, 2] = jnp.sum(post * w11, axis=1)

    return kernel


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class PallasDecoder:
    """Device-resident model tables + Pallas decode kernels.

    The TPU production engine; interface-compatible with
    :class:`fastsmc_tpu.engine.hmm.BatchedDecoder` but with fused reduction
    outputs and a far lower per-step cost.

    Options:
      steps_per_block: genome sites unrolled per Pallas grid step (None =
        auto from the VMEM budget; reduced to a divisor of the window).
      precision: "highest" (default; reference NO_SSE semantics, ~5e-7
        posterior error), "fast" (single-pass bf16 matmuls + bf16 alpha
        store, ~6e-3 error, ~3x decode throughput).
      alpha_dtype: jnp.float32 (default) or jnp.bfloat16 for the stored
        forward messages (~1e-3 posterior error, half the HBM traffic).
    """

    def __init__(self, ctx: DecodeContext, interpret: bool = False,
                 steps_per_block: Optional[int] = None,
                 precision: str = "highest",
                 alpha_dtype=jnp.float32,
                 norm: str = "auto"):
        self.ctx = ctx
        dq = ctx.dq
        K = dq.states
        if K > KC:
            raise ValueError(f"states={K} > {KC} not supported by the "
                             f"Pallas kernel yet")
        self.K = K
        self.L = ctx.data.sites
        self.interpret = interpret
        self.sequence = ctx.params.decoding_sequence
        self.steps_per_block = steps_per_block
        self.precision = _PRECISIONS[precision]
        # "turbo": bf16 operator storage + bf16 vector operand -> one MXU
        # pass per matmul (and half the operator DMA traffic)
        self.compute_dtype = (jnp.bfloat16 if precision == "turbo"
                              else jnp.float32)
        if precision == "turbo":
            alpha_dtype = jnp.bfloat16
        self.alpha_dtype = jnp.dtype(alpha_dtype)

        # dense operators, padded to [G, KC, KC]
        used_lists = [np.asarray(ctx.gap_idx),
                      np.asarray([int(dq.gen_dist_index(np.float32(0.0)))])]
        if self.sequence:
            used_lists += [np.asarray(ctx.seq_gap_idx),
                           np.asarray(ctx.seq_gap_idx_bwd),
                           np.asarray(ctx.rate_idx)]
        used = np.unique(np.concatenate(used_lists))
        remap = np.full(len(dq.gen_dists), -1, np.int32)
        remap[used] = np.arange(len(used), dtype=np.int32)
        Tf, Tb = build_dense_operators(dq.D[used], dq.B[used], dq.U[used],
                                       dq.RR[used], dq.column_ratios)
        G = len(used)
        Mf = np.zeros((G, KC, KC), np.float32)
        Mb = np.zeros((G, KC, KC), np.float32)
        Mf[:, :K, :K] = Tf
        Mb[:, :K, :K] = Tb
        self.Mf = jnp.asarray(Mf, dtype=self.compute_dtype)
        self.Mb = jnp.asarray(Mb, dtype=self.compute_dtype)
        self._identity_op = int(remap[int(dq.gen_dist_index(np.float32(0.0)))])
        self.gap_op = remap[np.asarray(ctx.gap_idx)]   # [L-1]
        if self.sequence:
            self.seq_op = remap[np.asarray(ctx.seq_gap_idx)]       # [L-1]
            self.seq_op_bwd = remap[np.asarray(ctx.seq_gap_idx_bwd)]
            self.rate_op = remap[np.asarray(ctx.rate_idx)]         # [L]
            hz = np.ones((self.L - 1, 1, KC), np.float32)
            hz[:, 0, :K] = dq.homozygous_emissions[ctx.homoz_idx]
            self.homoz = jnp.asarray(hz)               # [L-1, 1, KC]

        # emission component tables [L, 3, KC]
        e = ctx.emissions
        em = np.zeros((self.L, 3, KC), np.float32)
        em[:, 0, :K] = e.em1
        em[:, 1, :K] = e.em0minus1
        em[:, 2, :K] = e.em2minus0
        self.em = jnp.asarray(em)

        isp = np.zeros(KC, np.float32)
        isp[:K] = dq.initial_state_prob
        self.isp = jnp.asarray(isp)
        expt = np.zeros((1, KC), np.float32)
        expt[0, :K] = dq.expected_times
        self.exp_times = jnp.asarray(expt)
        self.hap_bits = jnp.asarray(ctx.data.hap_bits)  # uint8 [H, L]
        self._scaling_skip = ctx.scaling_skip
        # block normalization (normalize the recursion carry once per
        # S-block instead of per site): mathematically exact for every
        # output because the posterior combine renormalizes per site;
        # measured ~5%/16% off the fwd/bwd pass (ALPHA_WALL.json
        # *_norm_block). "auto" enables it for the approximate profiles
        # and keeps the reference per-site scaling for "highest"
        # (NO_SSE parity) and for sequence mode (two half-steps per site).
        if norm not in ("auto", "site", "block"):
            raise ValueError(f"unknown norm mode {norm!r}")
        self._norm_block = (norm == "block"
                            or (norm == "auto" and precision != "highest"
                                and not self.sequence))

    # ------------------------------------------------------------------
    def _pick_steps(self, T: int, P: int, outs: BwdOutputs) -> int:
        """Largest unroll factor that divides T and fits the VMEM budget."""
        ka = _round8(self.K)
        n_mats = 2 if self.sequence else 1
        abytes = self.alpha_dtype.itemsize
        for s in (8, 4, 2, 1):
            if self.steps_per_block is not None:
                if s > self.steps_per_block:
                    continue
            if T % s != 0:
                continue
            # the forward pass streams operators + em + obs in and alpha
            # out; the backward pass additionally streams em/obs twice
            # (block + adjacent block) and the requested reduction outputs.
            # every block is double-buffered by the Pallas pipeline; the
            # carry scratch is resident.
            ops_b = n_mats * s * KC * KC * \
                jnp.dtype(self.compute_dtype).itemsize
            em_b = s * 3 * KC * 4
            obs_b = s * 2 * P * 4
            alpha_b = s * ka * P * abytes
            fwd = 2 * (ops_b + em_b + obs_b + alpha_b)
            out_b = 0
            if outs.posterior:
                out_b += s * ka * P * 4
            for flag in (outs.per_pair_mean, outs.per_pair_map,
                         outs.threshold_sums):
                if flag:
                    out_b += s * P * 4
            bwd = 2 * (ops_b + 2 * em_b + 2 * obs_b + alpha_b + out_b)
            resident = KC * P * 4
            if max(fwd, bwd) + resident <= _VMEM_BUDGET:
                return s
        return 1

    # ------------------------------------------------------------------
    def _tables(self) -> dict:
        """Large device tables passed as runtime jit arguments (never
        closed-over constants: a 97k-site sequence panel's emission +
        operator tables are hundreds of MB and would otherwise be baked
        into every compile payload). Built per call so attribute overrides
        (e.g. the expectedCoalTimesFile exp_times swap) take effect."""
        t = dict(Mf=self.Mf, Mb=self.Mb, em=self.em, isp=self.isp,
                 exp=self.exp_times)
        if self.sequence:
            t["homoz"] = self.homoz
        return t

    @functools.partial(jax.jit, static_argnums=(0, 6, 7, 8))
    def _decode_jit(self, tables, hap_bits, hap_a, hap_b, t0,
                    t_len: int, outs: BwdOutputs, state_threshold: int):
        """t0 is a traced scalar so arbitrary decode windows share one
        compilation per (P, t_len) bucket. hap_bits and the model tables
        are runtime arguments (not closed-over constants) so the compiled
        program stays panel-size independent — biobank panels are ~GB and
        would otherwise be serialized into every compile payload."""
        return self._decode_body(tables, hap_bits, hap_a, hap_b, t0, t_len,
                                 outs, state_threshold)

    def _decode_body(self, tables, hap_bits, hap_a, hap_b, t0, t_len: int,
                     outs: BwdOutputs, state_threshold: int):
        """Traced single-window decode (the body of ``_decode_jit``); also
        kept separate from the jit wrapper so alternative dispatch
        structures can reuse it (grouping many batches into one program
        was tried and measured SLOWER than separate dispatches —
        MULTI_VARIANT_PROBE.json)."""
        K, L, P = self.K, self.L, hap_a.shape[0]
        T = t_len
        t0 = jnp.asarray(t0, jnp.int32)
        real = jnp.minimum(T, L - t0)           # traced
        S = self._pick_steps(T, P, outs)
        nblk = T // S

        site_idx = t0 + jnp.arange(T, dtype=jnp.int32)
        steps0 = jnp.arange(T, dtype=jnp.int32)
        valid = (site_idx < L) & (steps0 < real)
        site_idx_c = jnp.minimum(site_idx, L - 1)

        # --- observations [T, 2, P]; padded tail -> oz=1, oh=0 -------------
        a = jnp.take(hap_bits[hap_a], site_idx_c, axis=1)  # [P, T]
        b = jnp.take(hap_bits[hap_b], site_idx_c, axis=1)
        xor = jnp.where(valid[None, :], (a ^ b).astype(jnp.float32), 0.0)
        hom = jnp.where(valid[None, :], (a & b).astype(jnp.float32), 0.0)
        obs = jnp.stack([1.0 - xor.T, hom.T], axis=1)   # [T, 2, P]

        # --- emission tables [T, 3, KC]; padded positions -> identity ------
        em = jnp.take(tables["em"], site_idx_c, axis=0)
        ident_em = jnp.zeros((3, KC), jnp.float32).at[0, :].set(1.0)
        em = jnp.where(valid[:, None, None], em, ident_em[None])

        # --- per-step operator indices -------------------------------------
        # ops_f[t]: gap (t0+t-1, t0+t) for 1 <= t < real, else identity
        ident = jnp.int32(self._identity_op)
        gap_op = jnp.asarray(self.gap_op)
        steps = jnp.arange(T, dtype=jnp.int32)
        gap_idx_f = jnp.clip(t0 + steps - 1, 0, L - 2)
        ops_f = jnp.where((steps >= 1) & (steps < real),
                          gap_op[gap_idx_f], ident).astype(jnp.int32)
        # ops_b[u]: gap (t0+u, t0+u+1) for u < real-1, else identity
        gap_idx_b = jnp.clip(t0 + steps, 0, L - 2)
        ops_b = jnp.where(steps < real - 1,
                          gap_op[gap_idx_b], ident).astype(jnp.int32)

        fwd_mask = ((site_idx % self._scaling_skip) == 0).astype(jnp.int32)

        seq = self.sequence
        if seq:
            seq_op = jnp.asarray(self.seq_op)
            seq_op_b = jnp.asarray(self.seq_op_bwd)
            rate_op = jnp.asarray(self.rate_op)
            # forward: seq-gap op at gap t-1, rate op at site t0+t
            sops_f = jnp.where((steps >= 1) & (steps < real),
                               seq_op[gap_idx_f], ident).astype(jnp.int32)
            rops_f = jnp.where((steps >= 1) & (steps < real),
                               rate_op[jnp.minimum(site_idx, L - 1)],
                               ident).astype(jnp.int32)
            # backward (indexed by u = T-1-t): seq-gap bwd op at gap u,
            # rate op at site t0+u
            sops_b = jnp.where(steps < real - 1,
                               seq_op_b[gap_idx_b], ident).astype(jnp.int32)
            rops_b = jnp.where(steps < real - 1,
                               rate_op[jnp.minimum(site_idx, L - 1)],
                               ident).astype(jnp.int32)
            # homozygous emissions per gap, [T, 1, KC]
            hz = jnp.take(tables["homoz"],
                          jnp.clip(t0 + steps - 1, 0, L - 2), axis=0)
            hem_f = jnp.where(((steps >= 1) & (steps < real)
                               )[:, None, None], hz, 1.0)
            hzb = jnp.take(tables["homoz"], jnp.clip(t0 + steps, 0, L - 2),
                           axis=0)
            hem_b = jnp.where((steps < real - 1)[:, None, None], hzb, 1.0)

        interp = self.interpret
        KA = _round8(K)
        prec = self.precision
        cdt = self.compute_dtype
        adt = self.alpha_dtype

        # --- forward -------------------------------------------------------
        def blk(t, *a):
            return (t, 0, 0)

        if seq:
            op_specs = [pl.BlockSpec(
                (1, KC, KC), lambda t, so, ro, mask, i=i: (so[S * t + i],
                                                           0, 0))
                for i in range(S)]
            rop_specs = [pl.BlockSpec(
                (1, KC, KC), lambda t, so, ro, mask, i=i: (ro[S * t + i],
                                                           0, 0))
                for i in range(S)]
            fwd_grid = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,   # sops, rops, mask
                grid=(nblk,),
                in_specs=op_specs + rop_specs + [
                    pl.BlockSpec((S, 3, KC), blk),
                    pl.BlockSpec((S, 1, KC), blk),
                    pl.BlockSpec((S, 2, P), blk),
                    pl.BlockSpec((1, KC), lambda t, *a: (0, 0)),
                ],
                out_specs=pl.BlockSpec((S, KA, P), blk),
                scratch_shapes=[pltpu.VMEM((KC, P), jnp.float32)],
            )
            alpha = pl.pallas_call(
                _make_fwd_kernel(S, KA, True, adt, prec, cdt,
                                 self._norm_block), grid_spec=fwd_grid,
                out_shape=jax.ShapeDtypeStruct((T, KA, P), adt),
                compiler_params=_compiler_params(interp),
                interpret=interp,
            )(sops_f, rops_f, fwd_mask,
              *([tables["Mf"]] * (2 * S)), em, hem_f, obs,
              tables["isp"][None])
        else:
            op_specs = [pl.BlockSpec(
                (1, KC, KC), lambda t, ops, mask, i=i: (ops[S * t + i], 0, 0))
                for i in range(S)]
            fwd_grid = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,   # ops, mask
                grid=(nblk,),
                in_specs=op_specs + [
                    pl.BlockSpec((S, 3, KC), blk),
                    pl.BlockSpec((S, 2, P), blk),
                    pl.BlockSpec((1, KC), lambda t, *a: (0, 0)),
                ],
                out_specs=pl.BlockSpec((S, KA, P), blk),
                scratch_shapes=[pltpu.VMEM((KC, P), jnp.float32)],
            )
            alpha = pl.pallas_call(
                _make_fwd_kernel(S, KA, False, adt, prec, cdt,
                                 self._norm_block), grid_spec=fwd_grid,
                out_shape=jax.ShapeDtypeStruct((T, KA, P), adt),
                compiler_params=_compiler_params(interp),
                interpret=interp,
            )(ops_f, fwd_mask, *([tables["Mf"]] * S), em, obs,
              tables["isp"][None])

        # --- backward + combine -------------------------------------------
        # grid step t, sub-step i: global g = S*t+i, pos = T-1-g; beta
        # transition uses gap (pos, pos+1) = ops_b[pos] and emission/obs at
        # pos+1; g=0 only combines at T-1. reference scales when
        # pos % skip == 0 (HMM.cpp:931)
        bwd_mask = (((t0 + T - 1 - steps) % self._scaling_skip) == 0
                    ).astype(jnp.int32)

        kernel = _make_bwd_kernel(outs, S, K, KA, state_threshold, seq,
                                 prec, cdt, self._norm_block)

        def rev(t, *a):
            return (nblk - 1 - t, 0, 0)

        def rev_hi(t, *a):
            # adjacent block holding row pos+1 for the block boundary
            return (jnp.minimum(nblk - t, nblk - 1), 0, 0)

        out_shapes = []
        out_specs = []
        if outs.posterior:
            out_shapes.append(jax.ShapeDtypeStruct((T, KA, P), jnp.float32))
            out_specs.append(pl.BlockSpec((S, KA, P), rev))
        if outs.posterior_sums:
            out_shapes.append(jax.ShapeDtypeStruct((T, 1, KA), jnp.float32))
            out_specs.append(pl.BlockSpec((S, 1, KA), rev))
        if outs.per_pair_mean:
            out_shapes.append(jax.ShapeDtypeStruct((T, 1, P), jnp.float32))
            out_specs.append(pl.BlockSpec((S, 1, P), rev))
        if outs.per_pair_map:
            out_shapes.append(jax.ShapeDtypeStruct((T, 1, P), jnp.float32))
            out_specs.append(pl.BlockSpec((S, 1, P), rev))
        if outs.threshold_sums:
            out_shapes.append(jax.ShapeDtypeStruct((T, 1, P), jnp.float32))
            out_specs.append(pl.BlockSpec((S, 1, P), rev))
        if outs.major_minor_sums:
            out_shapes.append(jax.ShapeDtypeStruct((T, 3, KA), jnp.float32))
            out_specs.append(pl.BlockSpec((S, 3, KA), rev))

        if seq:
            bop_specs = [pl.BlockSpec(
                (1, KC, KC),
                lambda t, so, ro, mask, i=i: (so[T - 1 - (S * t + i)], 0, 0))
                for i in range(S)]
            brop_specs = [pl.BlockSpec(
                (1, KC, KC),
                lambda t, so, ro, mask, i=i: (ro[T - 1 - (S * t + i)], 0, 0))
                for i in range(S)]
            in_specs = bop_specs + brop_specs + [
                pl.BlockSpec((S, 3, KC), rev),       # em (this block)
                pl.BlockSpec((S, 3, KC), rev_hi),    # em (adjacent block)
                pl.BlockSpec((S, 1, KC), rev),       # homoz at gap pos
                pl.BlockSpec((S, 2, P), rev),        # obs (this block)
                pl.BlockSpec((S, 2, P), rev_hi),     # obs (adjacent block)
                pl.BlockSpec((S, KA, P), rev),       # alpha
                pl.BlockSpec((1, KC), lambda t, *a: (0, 0)),
            ]
            args = (sops_b, rops_b, bwd_mask, *([tables["Mb"]] * (2 * S)),
                    em, em, hem_b, obs, obs, alpha, tables["exp"])
            n_prefetch = 3
        else:
            bop_specs = [pl.BlockSpec(
                (1, KC, KC),
                lambda t, ops, mask, i=i: (ops[T - 1 - (S * t + i)], 0, 0))
                for i in range(S)]
            in_specs = bop_specs + [
                pl.BlockSpec((S, 3, KC), rev),       # em (this block)
                pl.BlockSpec((S, 3, KC), rev_hi),    # em (adjacent block)
                pl.BlockSpec((S, 2, P), rev),        # obs (this block)
                pl.BlockSpec((S, 2, P), rev_hi),     # obs (adjacent block)
                pl.BlockSpec((S, KA, P), rev),       # alpha
                pl.BlockSpec((1, KC), lambda t, *a: (0, 0)),
            ]
            args = (ops_b, bwd_mask, *([tables["Mb"]] * S),
                    em, em, obs, obs, alpha, tables["exp"])
            n_prefetch = 2

        bwd_grid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(nblk,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=[pltpu.VMEM((KC, P), jnp.float32)],
        )
        results = pl.pallas_call(
            kernel, grid_spec=bwd_grid,
            out_shape=tuple(out_shapes),
            compiler_params=_compiler_params(interp),
            interpret=interp,
        )(*args)
        if not isinstance(results, (tuple, list)):
            results = (results,)

        named = {}
        i = 0
        for name in _OUT_NAMES:
            if getattr(outs, name):
                r = results[i]
                i += 1
                if name == "posterior":
                    r = r[:, :K, :]
                elif name == "posterior_sums":
                    r = r[:, 0, :K]
                elif name == "major_minor_sums":
                    r = r[:, :, :K]       # [T, 3, K]
                else:
                    r = r[:, 0, :]
                named[name] = r
        return named

    # ------------------------------------------------------------------
    # PallasDecoder supports the pipeline's grouped decode+extract flow
    # (per-batch decode_pairs + in-jit extraction on its device outputs)
    supports_fused_extract = True

    def decode_pairs(self, hap_a, hap_b, t0: int = 0,
                     t_len: Optional[int] = None,
                     outputs: BwdOutputs = BwdOutputs(),
                     state_threshold: int = 0) -> dict:
        """Decode a batch of hap pairs over [t0, t0+t_len).

        Returns a dict with the requested outputs:
          posterior       [T, K, P]
          posterior_sums  [T, K]     (sum over pairs)
          per_pair_mean   [T, P]     (sum_k posterior * expectedTimes)
          per_pair_map    [T, P]     (argmax_k posterior, as float32)
          threshold_sums  [T, P]     (sum_{k < state_threshold} posterior)
        """
        t_len = self.L - t0 if t_len is None else t_len
        return self._decode_jit(self._tables(), self.hap_bits,
                                jnp.asarray(hap_a), jnp.asarray(hap_b),
                                jnp.asarray(t0, jnp.int32), int(t_len),
                                outputs, int(state_threshold))

    @functools.partial(jax.jit,
                       static_argnums=(0, 5, 6, 10, 11, 12, 13, 14))
    def _decode_extract_jit(self, tables, hap_bits, hap_a, hap_b,
                            t_len: int, state_threshold: int, t0, s0, s1,
                            cap: int, pps_cap: int, kcap: int,
                            age_threshold: int,
                            need_ages: bool, prob_threshold, isp_raw,
                            w0=None, w1=None):
        from . import segments as seg
        outs = BwdOutputs(posterior=need_ages, posterior_sums=False,
                          per_pair_mean=False, per_pair_map=False,
                          threshold_sums=True)
        r = self._decode_body(tables, hap_bits, hap_a, hap_b, t0, t_len,
                              outs, state_threshold)
        th = r["threshold_sums"]
        if w0 is not None:
            # per-candidate scan windows (config.permissive_window=False):
            # sites outside a column's own padded window are forced below
            # every level threshold, so runs clip to the candidate's
            # window regardless of the batch-union decode bounds — the
            # run/boundary machinery needs no other change
            pos = jnp.arange(th.shape[0], dtype=jnp.int32)
            in_win = ((pos[:, None] >= w0[None, :])
                      & (pos[:, None] < w1[None, :]))
            th = jnp.where(in_win, th, jnp.float32(-1.0))
        packed, pps = seg._extract_packed_impl(
            th, s0, s1, prob_threshold, cap,
            r["posterior"] if need_ages else None, pps_cap, kcap)
        if not need_ages:
            return packed, None, r["threshold_sums"]
        exp = tables["exp"].reshape(-1)[:self.K]
        ages = seg.run_ages_jax(pps, exp, isp_raw, age_threshold)
        return packed, ages, r["threshold_sums"]

    def decode_extract_packed(self, hap_a, hap_b, t0: int, t_len: int,
                              state_threshold: int, s0, s1, prob_threshold,
                              cap: int, pps_cap: int, age_threshold: int,
                              initial_state_prob, need_ages: bool = True,
                              w0=None, w1=None, kcap: int = 0):
        """One program: decode + in-jit run extraction (+ per-run posterior
        sums + per-run age estimates when ``need_ages``). Fusing keeps the
        [T, K, P] posterior a program-INTERNAL temp — as
        a separate dispatch it is a client buffer that must be allocated
        at dispatch time, and a flush group's worth of them (e.g. 8 x
        [2048, 69, 8192] f32 = 38 GB) cannot coexist in the 15.75 GB
        HBM. Temps are per-execution and executions are in-order, so
        peak memory is ONE program's. The age estimates reduce on device
        too: the host link is bandwidth-limited (~23 MB/s measured), so
        downloading 2 scalars/run instead of K posterior sums is the
        difference between ~0.5 and ~5 MB per batch.

        Returns (packed row [3*kcap+2] i32 — device-compacted KEPT runs:
        start, end, score, n_kept, n_raw —, ages [2, min(kcap, pps_cap)]
        f32 (posterior-mean row, MAP row) or None when not need_ages,
        threshold_sums [T, P]). ``cap`` bounds the raw boundary pass,
        ``kcap`` (default ``cap``) the kept output rows."""
        T, P = int(t_len), len(hap_a)
        if T * P >= 1 << 28:
            raise ValueError(f"T*P = {T * P} >= 2**28 overflows the packed "
                             "boundary encoding")
        kcap = kcap or cap
        if cap <= 0 or cap % 256 or pps_cap <= 0 or pps_cap % 256 \
                or kcap % 256 or kcap > cap:
            raise ValueError(f"cap={cap}/kcap={kcap}/pps_cap={pps_cap} "
                             "must be positive multiples of 256 with "
                             "kcap <= cap")
        pps_cap = min(pps_cap, kcap)
        if w0 is not None:
            w0 = jnp.asarray(w0, jnp.int32)
            w1 = jnp.asarray(w1, jnp.int32)
        return self._decode_extract_jit(
            self._tables(), self.hap_bits, jnp.asarray(hap_a),
            jnp.asarray(hap_b), int(t_len), int(state_threshold),
            jnp.asarray(t0, jnp.int32), jnp.asarray(s0, jnp.int32),
            jnp.asarray(s1, jnp.int32), int(cap), int(pps_cap),
            int(kcap), int(age_threshold), bool(need_ages),
            jnp.asarray(prob_threshold, jnp.float32),
            jnp.asarray(initial_state_prob, jnp.float32),
            w0=w0, w1=w1)
