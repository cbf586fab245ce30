"""Batched forward-backward decoder in JAX (the TPU compute path).

TPU-native redesign of the reference SIMD batch engine (HMM.cpp:639-1041).
Key mapping decisions (see SURVEY.md §7):

  * the pair axis P is the vectorised dimension — the analog of the
    reference's VECX lanes (4/8/16 wide) but thousands wide;
  * the genome axis runs under ``lax.scan`` with carry = scaled alpha/beta;
  * the O(K) per-step recurrences of the reference (alphaC suffix sums,
    AU/BU affine chains — HMM.cpp:787-879, 943-1041) are *sequential in k*
    and map poorly to a vector unit, so each step instead applies the exact
    dense [K, K] transition operator on the MXU (see engine/dense.py for the
    reconstruction from D/B/U/RR/CR — bitwise-equivalent coefficients, only
    the dot-product summation order differs);
  * the float-keyed D/B/U/RR hash maps become integer operator indices per
    genome gap; operators are gathered from a [G, K, K] stack inside the
    scan body;
  * variable decode windows [from, to) are padded to bucketed lengths with
    identity operators and all-ones emissions — exact no-ops.

Everything is float32 (reference NO_SSE semantics: exact reciprocals).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dense import build_dense_operators
from .oracle import DecodeContext


class BatchedDecoder:
    """Device-resident model tables + jitted batched decode.

    Produces, per decode window, the posterior [T, K, P] plus reduced
    outputs, replacing the reference's ``decodeBatch`` + ``augmentSumOverPairs``
    + per-pair output passes (HMM.cpp:639-722, 1044-1085, 1360-1458).
    """

    def __init__(self, ctx: DecodeContext):
        self.ctx = ctx
        dq = ctx.dq
        self.K = dq.states
        self.L = ctx.data.sites
        self.sequence = ctx.params.decoding_sequence

        e = ctx.emissions
        self.em1 = jnp.asarray(e.em1)         # [L, K]
        self.em0m1 = jnp.asarray(e.em0minus1)
        self.em2m0 = jnp.asarray(e.em2minus0)

        # ---- dense operators for every dq row used by this panel ----------
        used = [np.asarray(ctx.gap_idx)]
        if self.sequence:
            used += [np.asarray(ctx.seq_gap_idx), np.asarray(ctx.seq_gap_idx_bwd),
                     np.asarray(ctx.rate_idx)]
        zero_row = int(dq.gen_dist_index(np.float32(0.0)))
        uniq = np.unique(np.concatenate(used + [np.array([zero_row])]))
        remap = np.full(len(dq.gen_dists), -1, np.int32)
        remap[uniq] = np.arange(len(uniq), dtype=np.int32)
        Tf, Tb = build_dense_operators(dq.D[uniq], dq.B[uniq], dq.U[uniq],
                                       dq.RR[uniq], dq.column_ratios)
        self.Tf = jnp.asarray(Tf)             # [G, K, K]
        self.Tb = jnp.asarray(Tb)
        self._identity_op = int(remap[zero_row])

        self.gap_op = remap[np.asarray(ctx.gap_idx)]          # [L-1]
        if self.sequence:
            self.seq_op = remap[np.asarray(ctx.seq_gap_idx)]
            self.seq_op_bwd = remap[np.asarray(ctx.seq_gap_idx_bwd)]
            self.rate_op = remap[np.asarray(ctx.rate_idx)]
            self.homoz = jnp.asarray(
                dq.homozygous_emissions[ctx.homoz_idx])       # [L-1, K]

        self.isp = jnp.asarray(dq.initial_state_prob)    # [K]
        self.exp_times = jnp.asarray(dq.expected_times)  # [K]
        self.hap_bits = jnp.asarray(ctx.data.hap_bits)   # uint8 [H, L]
        self._scaling_skip = ctx.scaling_skip

    # ------------------------------------------------------------------
    def _window_meta(self, t0: int, t_len: int):
        """Host-side per-window step metadata (numpy, cheap)."""
        L, K = self.L, self.K
        real = min(t_len, L - t0)
        pad = t_len - real

        def pad_ops(x):
            sl = x[t0:t0 + real - 1]
            if pad:
                sl = np.concatenate(
                    [sl, np.full(pad, self._identity_op, sl.dtype)])
            return jnp.asarray(sl)

        pos = np.arange(t0, t0 + t_len)
        scale_mask = jnp.asarray((pos % self._scaling_skip) == 0)
        return real, pad, pad_ops, scale_mask

    def _emission(self, em1, em0m1, em2m0, obs_zero, obs_hom):
        # [K] tables x [P] obs -> [K, P]
        return (em1[:, None] + em0m1[:, None] * obs_zero[None, :]
                + em2m0[:, None] * obs_hom[None, :])

    @staticmethod
    def _normalize(x, mask):
        s = jnp.sum(x, axis=0, keepdims=True)
        inv = jnp.where(mask, 1.0 / s, 1.0)
        return x * inv

    # ------------------------------------------------------------------
    def _decode_window(self, ops, seq_meta, em_tabs, scale_mask,
                       obs_zero, obs_hom):
        """Forward-backward + combine for one padded window.

        ops: gap operator indices [T-1]; em_tabs: (em1, em0m1, em2m0) [T, K];
        obs_zero/obs_hom: [T, P]. Returns posterior [T, K, P].
        """
        em1, em0m1, em2m0 = em_tabs
        seq = self.sequence
        Tf, Tb = self.Tf, self.Tb

        em_first = self._emission(em1[0], em0m1[0], em2m0[0],
                                  obs_zero[0], obs_hom[0])
        alpha0 = self._normalize(self.isp[:, None] * em_first, True)

        def fwd_body(carry, xs):
            if seq:
                (op, e1, e01, e20, oz, oh, mask, sop, rop, hem) = xs
                mid = hem[:, None] * jnp.dot(Tf[sop], carry,
                                             preferred_element_type=jnp.float32,
                                             precision=jax.lax.Precision.HIGHEST)
                em = self._emission(e1, e01, e20, oz, oh)
                nxt = em * jnp.dot(Tf[rop], mid,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
            else:
                (op, e1, e01, e20, oz, oh, mask) = xs
                em = self._emission(e1, e01, e20, oz, oh)
                nxt = em * jnp.dot(Tf[op], carry,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
            nxt = self._normalize(nxt, mask)
            return nxt, nxt

        if seq:
            sop, sop_b, rop, hem = seq_meta
            xs = (ops, em1[1:], em0m1[1:], em2m0[1:], obs_zero[1:],
                  obs_hom[1:], scale_mask[1:], sop, rop[1:], hem)
        else:
            xs = (ops, em1[1:], em0m1[1:], em2m0[1:], obs_zero[1:],
                  obs_hom[1:], scale_mask[1:])
        _, alpha_rest = jax.lax.scan(fwd_body, alpha0, xs)
        alpha = jnp.concatenate([alpha0[None], alpha_rest], axis=0)

        # derive from alpha0 so the value is "varying" over the pair axis
        # under shard_map (a plain constant fails the carry vma check)
        beta_last = jnp.zeros_like(alpha0) + jnp.float32(1.0 / self.K)
        T = obs_zero.shape[0]

        def bwd_body(carry, xs):
            if seq:
                (op, e1, e01, e20, oz, oh, mask, sop_b, rop, hem) = xs
                mid = jnp.dot(Tb[sop_b], carry * hem[:, None],
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
                em_next = self._emission(e1, e01, e20, oz, oh)
                prev = jnp.dot(Tb[rop], mid * em_next,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
            else:
                (op, e1, e01, e20, oz, oh, mask) = xs
                em_next = self._emission(e1, e01, e20, oz, oh)
                prev = jnp.dot(Tb[op], carry * em_next,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
            prev = self._normalize(prev, mask)
            return prev, prev

        if seq:
            xs_b = (ops[::-1], em1[1:][::-1], em0m1[1:][::-1],
                    em2m0[1:][::-1], obs_zero[1:][::-1], obs_hom[1:][::-1],
                    scale_mask[:T - 1][::-1], sop_b[::-1],
                    rop[:T - 1][::-1], hem[::-1])
        else:
            xs_b = (ops[::-1], em1[1:][::-1], em0m1[1:][::-1],
                    em2m0[1:][::-1], obs_zero[1:][::-1], obs_hom[1:][::-1],
                    scale_mask[:T - 1][::-1])
        _, beta_rest = jax.lax.scan(bwd_body, beta_last, xs_b)
        beta = jnp.concatenate([beta_last[None], beta_rest], axis=0)[::-1]

        post = alpha * beta
        post = post / jnp.sum(post, axis=1, keepdims=True)
        return post

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0, 4, 5))
    def _decode_jit(self, hap_bits, hap_a, hap_b, t0: int, t_len: int):
        # hap_bits is a runtime argument so the compiled program stays
        # panel-size independent (see PallasDecoder._decode_jit)
        real, pad, pad_ops, scale_mask = self._window_meta(t0, t_len)
        ops = pad_ops(self.gap_op)

        def pad_site_tab(x, fill):
            sl = x[t0:t0 + real]
            if pad:
                filler = jnp.full((pad, self.K), fill, jnp.float32)
                sl = jnp.concatenate([sl, filler], axis=0)
            return sl

        em_tabs = (pad_site_tab(self.em1, 1.0),
                   pad_site_tab(self.em0m1, 0.0),
                   pad_site_tab(self.em2m0, 0.0))

        seq_meta = None
        if self.sequence:
            sop = pad_ops(self.seq_op)
            sop_b = pad_ops(self.seq_op_bwd)
            rop_np = self.rate_op[t0:t0 + real]
            if pad:
                rop_np = np.concatenate(
                    [rop_np, np.full(pad, self._identity_op, rop_np.dtype)])
            rop = jnp.asarray(rop_np)
            hem_sl = self.homoz[t0:t0 + real - 1]
            if pad:
                hem_sl = jnp.concatenate(
                    [hem_sl, jnp.ones((pad, self.K), jnp.float32)], axis=0)
            seq_meta = (sop, sop_b, rop, hem_sl)

        a = hap_bits[hap_a][:, t0:t0 + real]   # [P, real]
        b = hap_bits[hap_b][:, t0:t0 + real]
        xor = (a ^ b).astype(jnp.float32)
        hom = (a & b).astype(jnp.float32)
        if pad:
            xor = jnp.pad(xor, ((0, 0), (0, pad)), constant_values=1.0)
            hom = jnp.pad(hom, ((0, 0), (0, pad)), constant_values=0.0)
        obs_zero = (1.0 - xor).T                     # [T, P]
        obs_hom = hom.T
        return self._decode_window(ops, seq_meta, em_tabs, scale_mask,
                                   obs_zero, obs_hom)

    def decode_pairs(self, hap_a: np.ndarray, hap_b: np.ndarray,
                     t0: int = 0, t_len: Optional[int] = None) -> jnp.ndarray:
        """Posterior [T, K, P] for hap index pairs over window [t0, t0+t_len).

        ``t_len`` should come from :func:`bucket_len` to bound recompiles.
        """
        t_len = self.L - t0 if t_len is None else t_len
        return self._decode_jit(self.hap_bits,
                                jnp.asarray(hap_a), jnp.asarray(hap_b),
                                int(t0), int(t_len))


def bucket_len(n: int, min_bucket: int = 64) -> int:
    """Round window length up to a limited set of sizes (power-of-two steps)
    to bound jit recompilation."""
    b = min_bucket
    while b < n:
        b *= 2
    return b
