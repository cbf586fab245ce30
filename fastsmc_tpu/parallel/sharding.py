"""Multi-chip scaling: pair-stream data parallelism over a device mesh.

The reference scales out by launching independent OS processes over a
triangular tiling of the pair matrix and merging output files
(SURVEY.md §2.3; Data.cpp:62-80, cpp_example/FastSMC_example_multiple_jobs.sh).
The TPU-native replacement keeps that *embarrassing* outer tiling for
multi-host jobs (the ``jobs``/``job_ind`` window math is preserved in
``io.haps.JobWindows``), and adds intra-job scaling over the chips of a mesh:

  * the candidate-pair batch axis is sharded over the mesh ("pairs" axis)
    with ``shard_map`` — each chip decodes its slice of pairs with the same
    replicated model tables;
  * sum-over-pairs accumulators are combined with ``psum`` over ICI;
  * per-pair outputs (segment levels, means, MAPs) stay sharded and are
    gathered on host at write time.

On a single host this also validates on the 8-device virtual CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.6 exposes shard_map at top level
    shard_map = jax.shard_map  # type: ignore[attr-defined]
except AttributeError:
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..engine.hmm import BatchedDecoder, bucket_len
from ..engine.oracle import DecodeContext


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "pairs") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


class ShardedDecoder:
    """Pair-parallel decoding over a mesh.

    Wraps :class:`BatchedDecoder` (portable across backends; the Pallas
    kernels slot in per-chip on TPU meshes) with shard_map over the pair
    axis.  The global pair batch size must be a multiple of the mesh size.
    """

    def __init__(self, ctx: DecodeContext, mesh: Mesh,
                 axis_name: str = "pairs"):
        self.ctx = ctx
        self.mesh = mesh
        self.axis = axis_name
        self.dec = BatchedDecoder(ctx)
        self.L = ctx.data.sites
        self.K = ctx.dq.states

    # ------------------------------------------------------------------
    def _local_decode(self, ha, hb, t0: int, t_len: int):
        """Per-device decode of the local pair shard -> posterior [T, K, p]."""
        return self.dec._decode_jit(ha, hb, t0, t_len)

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def posterior_sums(self, hap_a, hap_b, t0: int, t_len: int):
        """Sum-over-pairs [T, K] across the whole mesh (psum over ICI)."""
        axis = self.axis

        def local(ha, hb):
            post = self._local_decode(ha, hb, t0, t_len)
            return jax.lax.psum(jnp.sum(post, axis=2), axis)

        f = shard_map(local, mesh=self.mesh,
                      in_specs=(P(axis), P(axis)),
                      out_specs=P())
        return f(hap_a, hap_b)

    @functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
    def per_pair_outputs(self, hap_a, hap_b, t0: int, t_len: int,
                         state_threshold: int):
        """Sharded per-pair reductions: (threshold_sums [T, Pglobal],
        posterior_mean [T, Pglobal]) with the pair axis left sharded."""
        axis = self.axis
        expt = jnp.asarray(self.ctx.dq.expected_times)

        def local(ha, hb):
            post = self._local_decode(ha, hb, t0, t_len)
            th = jnp.sum(post[:, :state_threshold, :], axis=1)
            mean = jnp.einsum("tkp,k->tp", post, expt)
            return th, mean

        f = shard_map(local, mesh=self.mesh,
                      in_specs=(P(axis), P(axis)),
                      out_specs=(P(None, axis), P(None, axis)))
        return f(hap_a, hap_b)


def training_step(ctx: DecodeContext, mesh: Mesh):
    """Build the canonical multi-chip step: jitted, shard_map'ed full
    decode + reduction over the mesh. Returns (fn, example_args)."""
    sd = ShardedDecoder(ctx, mesh)
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    P_global = 2 * n
    rng = np.random.default_rng(0)
    ha = rng.integers(0, ctx.data.n_haps, P_global).astype(np.int32)
    hb = (ha + 1) % ctx.data.n_haps
    t_len = 64

    def step(hap_a, hap_b):
        return sd.posterior_sums(hap_a, hap_b, 0, t_len)

    return step, (jnp.asarray(ha), jnp.asarray(hb))
