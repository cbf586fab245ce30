"""ASMC pipeline: all-pairs posterior decoding and the targeted-pair API.

Mirror of the reference façade ``ASMC::ASMC`` (ASMC.cpp:51-128), the
``ASMC_exe`` main (main.cpp:33-168), and the python ``decodePairs`` surface
(pybind.cpp:54-252 / DecodePairsReturnStruct.hpp), rebuilt on the batched
TPU decoder:

  * ``decode_all_in_job`` enumerates the job's pair range
    (HMM.cpp:310-364), streams batches through the fused kernel, and
    accumulates the sum-over-pairs matrices on device;
  * ``decode_pairs`` decodes explicit hap-index or string-id pairs and
    returns per-pair posteriors / posterior means / MAPs with the
    min/argmin summaries of ``finaliseCalculations``
    (DecodePairsReturnStruct.hpp:105-118).
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from ..config import DecodingParams
from ..engine.hmm import BatchedDecoder, bucket_len
from ..engine.oracle import DecodeContext
from ..io.decoding_quantities import DecodingQuantities
from ..io.haps import Data, load_data
from ..io import writers


def _profile_kwargs(profile: str) -> dict:
    """Kernel options for a named decode profile."""
    if profile == "exact":
        return {}
    if profile == "fast":
        import jax.numpy as jnp
        return dict(alpha_dtype=jnp.bfloat16, precision="fast")
    if profile == "turbo":
        return dict(precision="turbo")
    raise ValueError(f"unknown decode profile {profile!r}")


def hap_to_dip_id(hap: int) -> Tuple[int, int]:
    """HmmUtils.cpp:179-182."""
    return hap // 2, 1 + hap % 2


def dip_to_hap_id(ind: int, hap: int) -> int:
    """HmmUtils.cpp:184-188."""
    assert hap in (1, 2)
    return 2 * ind + hap - 1


def combined_id_to_ind_plus_hap(combined: str) -> Tuple[str, int]:
    """HmmUtils.cpp:200-208 (``<id>#1`` / ``<id>#2``)."""
    if len(combined) < 3 or combined[-2:] not in ("#1", "#2"):
        raise ValueError(
            f"Expected combined ID in form <id>#1 OR <id>#2, got {combined}")
    return combined[:-2], int(combined[-1])


@dataclasses.dataclass
class DecodingReturnValues:
    sum_over_pairs: np.ndarray                 # [L, K]
    sum_over_pairs00: Optional[np.ndarray] = None
    sum_over_pairs01: Optional[np.ndarray] = None
    sum_over_pairs11: Optional[np.ndarray] = None
    sites: int = 0
    states: int = 0
    site_was_flipped: Optional[np.ndarray] = None


@dataclasses.dataclass
class DecodePairsReturnStruct:
    """Python-API result container (DecodePairsReturnStruct.hpp:22-127)."""
    per_pair_indices: List[Tuple[int, str, int, str]]
    per_pair_posteriors: Optional[np.ndarray] = None   # [n, K, L]
    sum_of_posteriors: Optional[np.ndarray] = None     # [K, L]
    per_pair_posterior_means: Optional[np.ndarray] = None  # [n, L]
    min_posterior_means: Optional[np.ndarray] = None   # [L]
    argmin_posterior_means: Optional[np.ndarray] = None
    per_pair_maps: Optional[np.ndarray] = None         # [n, L] int
    min_maps: Optional[np.ndarray] = None
    argmin_maps: Optional[np.ndarray] = None


class ASMC:
    """All-pairs / targeted-pair decoding façade."""

    def __init__(self, params: DecodingParams,
                 data: Optional[Data] = None,
                 dq: Optional[DecodingQuantities] = None,
                 use_pallas: Optional[bool] = None,
                 batch_size: Optional[int] = None,
                 decode_profile: str = "exact",
                 mesh=None):
        """decode_profile: "exact" (f32/HIGHEST matmuls, reference NO_SSE
        numerics) or "fast" (bf16 forward-message store + bf16 matmuls,
        ~6e-3 posterior error, ~2.5x decode throughput).
        mesh: a ``jax.sharding.Mesh`` to shard each pair batch over
        (pair-parallel over chips, psum'd sums; per-chip Pallas kernels
        on TPU). The batch size must be a multiple of the mesh size."""
        self.params = params
        self.data = data if data is not None else load_data(params)
        self.dq = dq if dq is not None else DecodingQuantities.load(
            params.decoding_quant_file)
        self.ctx = DecodeContext.build(params, self.data, self.dq)
        self.batch_size = batch_size or max(params.batch_size, 64)
        if params.no_batches:
            use_pallas = False
            mesh = None
        if use_pallas is None:
            import jax
            use_pallas = jax.default_backend() not in ("cpu",)
        # "fused" decoders return the BwdOutputs dict (reductions computed
        # on device); the plain paths return the full posterior
        self._fused = bool(use_pallas or mesh is not None)
        if mesh is not None:
            from ..engine.kernels import BwdOutputs
            from ..parallel.sharding import ShardedDecoder
            self.decoder = ShardedDecoder(self.ctx, mesh,
                                          use_pallas=use_pallas,
                                          decode_profile=decode_profile)
            if self.batch_size % self.decoder.n_devices != 0:
                raise ValueError(
                    f"batch_size {self.batch_size} must be a multiple of "
                    f"the mesh size {self.decoder.n_devices}")
            self._outs_cls = BwdOutputs
        elif use_pallas:
            from ..engine.kernels import PallasDecoder, BwdOutputs
            self.decoder = PallasDecoder(self.ctx,
                                         **_profile_kwargs(decode_profile))
            self._outs_cls = BwdOutputs
        elif params.no_batches:
            # reference noBatches debug path: scalar oracle per pair
            from ..engine.oracle import OracleDecoder
            self.decoder = OracleDecoder(self.ctx)
            self._outs_cls = None
        else:
            self.decoder = BatchedDecoder(self.ctx)
            self._outs_cls = None

        # expected coalescent times for per-pair posterior means: from
        # --expectedCoalTimesFile when given (HMM.cpp:1741-1748, non-FastSMC
        # only), else the decoding quantities' expectedTimes
        self.expected_coal_times = self.dq.expected_times
        ect_file = params.expected_coal_times_file
        if ect_file and not params.fastsmc:
            import os
            if os.path.isfile(ect_file):
                self.expected_coal_times = \
                    writers.read_expected_times_from_intervals_file(ect_file)
                if len(self.expected_coal_times) != self.dq.states:
                    raise ValueError(
                        f"{ect_file} has {len(self.expected_coal_times)} "
                        f"times, expected {self.dq.states}")
                if self._fused:
                    # the fused per_pair_mean reduction reads the decoder's
                    # expected-times row ([K] on the XLA engine, [1, KC]
                    # padded on Pallas); swap in the file's values
                    import jax.numpy as jnp
                    cur = np.asarray(self.decoder.exp_times)
                    e = np.zeros_like(cur)
                    e.reshape(-1)[:self.dq.states] = self.expected_coal_times
                    self.decoder.exp_times = jnp.asarray(e)

    # ------------------------------------------------------------------
    @staticmethod
    def pairs_from_flat_indices(idx: np.ndarray, within_only: bool = False
                                ) -> Tuple[np.ndarray, np.ndarray]:
        """Closed-form mapping of the reference's flat pair enumeration
        (HMM.cpp:325-357) so biobank-scale ranges never materialise lists.

        Ordering per individual i: for j < i, (iHap, jHap) in row-major
        {1,2}x{1,2} emitting hap rows (2j+jHap, 2i+iHap); then the
        within-individual pair (2i, 2i+1).  Cumulative count before i is
        C(i) = 2*i^2 - i.
        """
        idx = np.asarray(idx, dtype=np.int64)
        if within_only:
            return 2 * idx, 2 * idx + 1
        # invert C(i) = 2 i^2 - i <= p  =>  i = floor((1 + sqrt(1+8p)) / 4)
        i = ((1.0 + np.sqrt(1.0 + 8.0 * idx.astype(np.float64))) / 4.0
             ).astype(np.int64)
        # float guard around the boundary
        i = np.where(2 * i * i - i > idx, i - 1, i)
        i = np.where(2 * (i + 1) * (i + 1) - (i + 1) <= idx, i + 1, i)
        r = idx - (2 * i * i - i)
        cross = r < 4 * i
        j = r // 4
        ihap = (r % 4) // 2
        jhap = r % 2
        h1 = np.where(cross, 2 * j + jhap, 2 * i)
        h2 = np.where(cross, 2 * i + ihap, 2 * i + 1)
        return h1, h2

    def _job_pair_range(self) -> Tuple[int, int]:
        p = self.params
        N = self.data.n_ind
        tot = N if p.within_only else 2 * N * N - N
        return (tot * (p.job_ind - 1) // p.jobs, tot * p.job_ind // p.jobs)

    def _job_pairs(self) -> List[Tuple[int, int]]:
        start, end = self._job_pair_range()
        h1, h2 = self.pairs_from_flat_indices(
            np.arange(start, end, dtype=np.int64), self.params.within_only)
        return list(zip(h1.tolist(), h2.tolist()))

    # ------------------------------------------------------------------
    def decode_all_in_job(self, verbose: bool = True,
                          chunk_sites: Optional[int] = None,
                          halo_cm: float = 2.0) -> DecodingReturnValues:
        """All-pairs posterior sums for this job.

        ``chunk_sites`` enables genome-chunked decoding for biobank-length
        chromosomes (SURVEY.md §5.7): each chunk decodes with a ``halo_cm``
        centimorgan halo on both sides and only interior positions
        contribute, bounding device memory at O(chunk x states x batch)
        instead of O(sites x ...). The reference keeps whole chromosomes in
        RAM and tells users to split files manually.
        """
        if chunk_sites is not None:
            return self._decode_all_chunked(chunk_sites, halo_cm, verbose)
        p = self.params
        L, K = self.data.sites, self.dq.states
        t_len = bucket_len(L)
        bs = self.batch_size
        start, end = self._job_pair_range()
        n_pairs = end - start
        t0 = time.time()

        sums = np.zeros((L, K), np.float64)
        mm = np.zeros((3, L, K), np.float64) \
            if p.do_major_minor_posterior_sums else None

        # per-pair streaming outputs (HMM.cpp:258-271, 1360-1419): one row
        # per decoded pair, written batch by batch as decoding proceeds.
        # The reference only streams these outside FastSMC mode.
        need_mean = p.do_per_pair_posterior_mean and not p.fastsmc
        need_map = p.do_per_pair_map and not p.fastsmc
        mean_writer = map_writer = None
        if need_mean:
            mean_writer = writers.PerPairStreamWriter(
                p.out_file_root + ".perPairPosteriorMeans.gz")
        if need_map:
            map_writer = writers.PerPairStreamWriter(
                p.out_file_root + ".perPairMAP.gz", integers=True)

        for ofs in range(0, n_pairs, bs):
            n = min(bs, n_pairs - ofs)
            h1_64, h2_64 = self.pairs_from_flat_indices(
                np.arange(start + ofs, start + ofs + n), p.within_only)
            h1 = h1_64.astype(np.int32)
            h2 = h2_64.astype(np.int32)
            if n < bs:
                h1 = np.concatenate([h1, np.full(bs - n, h1[-1], np.int32)])
                h2 = np.concatenate([h2, np.full(bs - n, h2[-1], np.int32)])
            if self._fused:
                outs = self._outs_cls(
                    posterior=False,
                    posterior_sums=p.do_posterior_sums,
                    major_minor_sums=p.do_major_minor_posterior_sums,
                    per_pair_mean=need_mean, per_pair_map=need_map,
                    threshold_sums=False)
                r = self.decoder.decode_pairs(h1, h2, 0, t_len, outs, 0)
                if n < bs and (p.do_posterior_sums or mm is not None):
                    # the padding slots repeat the last real pair, so the
                    # fused over-pairs sums overcount it by (bs - n); a
                    # second fused decode of that pair alone supplies the
                    # correction without ever materializing the [T, K, P]
                    # posterior on host
                    pad1 = np.full(bs, h1[n - 1], np.int32)
                    pad2 = np.full(bs, h2[n - 1], np.int32)
                    outs_pad = self._outs_cls(
                        posterior=False,
                        posterior_sums=p.do_posterior_sums,
                        major_minor_sums=mm is not None,
                        threshold_sums=False)
                    r_pad = self.decoder.decode_pairs(pad1, pad2, 0, t_len,
                                                      outs_pad, 0)
                    frac = (bs - n) / bs
                else:
                    r_pad, frac = None, 0.0
                if p.do_posterior_sums:
                    s = np.asarray(r["posterior_sums"], np.float64)[:L]
                    if r_pad is not None:
                        s -= frac * np.asarray(r_pad["posterior_sums"],
                                               np.float64)[:L]
                    sums += s
                if mm is not None:
                    s = np.asarray(r["major_minor_sums"],
                                   np.float64)[:L].transpose(1, 0, 2)
                    if r_pad is not None:
                        s -= frac * np.asarray(
                            r_pad["major_minor_sums"],
                            np.float64)[:L].transpose(1, 0, 2)
                    mm += s
                if need_mean:
                    mean_writer.write_rows(
                        np.asarray(r["per_pair_mean"])[:L, :n].T)
                if need_map:
                    map_writer.write_rows(
                        np.asarray(r["per_pair_map"])[:L, :n].T)
            else:
                # portable XLA path: full posterior on host (padding pairs
                # are sliced away before any reduction)
                post = self._full_posterior(h1, h2, t_len)[:L, :, :n]
                if p.do_posterior_sums:
                    sums += post.sum(axis=2)
                if mm is not None:
                    a = self.data.hap_bits[h1[:n], :L]
                    b = self.data.hap_bits[h2[:n], :L]
                    xor = (a ^ b).T.astype(bool)       # [L, n]
                    hom = (a & b).T.astype(bool)
                    w11 = hom
                    w00 = (~xor) & (~hom)
                    w01 = xor
                    for wi, w in enumerate((w00, w01, w11)):
                        mm[wi] += np.einsum("tkp,tp->tk", post,
                                            w.astype(np.float32))
                if need_mean:
                    ect = self.expected_coal_times
                    mean_writer.write_rows(
                        np.einsum("tkp,k->pt", post, ect))
                if need_map:
                    map_writer.write_rows(post.argmax(axis=1).T)
            if verbose:
                done = min(ofs + bs, n_pairs)
                print(f"\rDecoding progress: {100 * done // n_pairs}% "
                      f"({done}/{n_pairs})", end="", flush=True)
        if mean_writer is not None:
            mean_writer.close()
        if map_writer is not None:
            map_writer.close()
        if verbose:
            print(f"\nDecoded {n_pairs} pairs in "
                  f"{time.time() - t0:.3f} seconds.")

        out = DecodingReturnValues(
            sum_over_pairs=sums.astype(np.float32),
            sites=L, states=K,
            site_was_flipped=self.data.site_was_flipped)
        if mm is not None:
            out.sum_over_pairs00 = mm[0].astype(np.float32)
            out.sum_over_pairs01 = mm[1].astype(np.float32)
            out.sum_over_pairs11 = mm[2].astype(np.float32)
        return out

    def _decode_all_chunked(self, chunk_sites: int, halo_cm: float,
                            verbose: bool) -> DecodingReturnValues:
        from .fastsmc import get_from_position, get_to_position
        p = self.params
        L, K = self.data.sites, self.dq.states
        g = self.data.genetic_positions
        bs = self.batch_size
        start, end = self._job_pair_range()
        n_pairs = end - start
        sums = np.zeros((L, K), np.float64)
        t0 = time.time()

        chunks = []
        for c0 in range(0, L, chunk_sites):
            c1 = min(c0 + chunk_sites, L)
            w0 = get_from_position(g, c0, halo_cm)
            w1 = get_to_position(g, c1 - 1, halo_cm)
            chunks.append((c0, c1, w0, w1))

        for ofs in range(0, n_pairs, bs):
            n = min(bs, n_pairs - ofs)
            h1_64, h2_64 = self.pairs_from_flat_indices(
                np.arange(start + ofs, start + ofs + n), p.within_only)
            h1 = h1_64.astype(np.int32)
            h2 = h2_64.astype(np.int32)
            if n < bs:
                h1 = np.concatenate([h1, np.full(bs - n, h1[-1], np.int32)])
                h2 = np.concatenate([h2, np.full(bs - n, h2[-1], np.int32)])
            for (c0, c1, w0, w1) in chunks:
                t_len = bucket_len(w1 - w0)
                if self._fused:
                    # device-fused over-pairs sums ([T, K]) instead of the
                    # [T, K, P] posterior: a sequence-mode chunk at
                    # t_len 16384 x P 1024 is a ~5 GB client buffer and a
                    # multi-minute download on the ~23 MB/s link (it
                    # RESOURCE_EXHAUSTED the chip in the round-5 probe);
                    # the padded duplicate pairs are corrected by the same
                    # second fused decode as the unchunked path above
                    outs = self._outs_cls(posterior=False,
                                          posterior_sums=True,
                                          threshold_sums=False)
                    r = self.decoder.decode_pairs(h1, h2, w0, t_len,
                                                  outs, 0)
                    s = np.asarray(r["posterior_sums"], np.float64)
                    if n < bs:
                        pad1 = np.full(bs, h1[n - 1], np.int32)
                        pad2 = np.full(bs, h2[n - 1], np.int32)
                        r_pad = self.decoder.decode_pairs(
                            pad1, pad2, w0, t_len, outs, 0)
                        s -= ((bs - n) / bs) * np.asarray(
                            r_pad["posterior_sums"], np.float64)
                    sums[c0:c1] += s[c0 - w0:c1 - w0]
                else:
                    post = self._full_posterior(h1, h2, t_len, t0_pos=w0)
                    sums[c0:c1] += post[c0 - w0:c1 - w0, :, :n].sum(axis=2)
            if verbose:
                done = min(ofs + bs, n_pairs)
                print(f"\rDecoding progress: {100 * done // n_pairs}%",
                      end="", flush=True)
        if verbose:
            print(f"\nDecoded {n_pairs} pairs (chunked x{len(chunks)}) in "
                  f"{time.time() - t0:.3f} seconds.")
        return DecodingReturnValues(
            sum_over_pairs=sums.astype(np.float32), sites=L, states=K,
            site_was_flipped=self.data.site_was_flipped)

    def _full_posterior(self, h1, h2, t_len, t0_pos: int = 0) -> np.ndarray:
        n = len(h1)
        # a sharded decoder needs the pair axis divisible by the mesh
        nd = getattr(self.decoder, "n_devices", 1)
        if n % nd != 0:
            fill = nd - n % nd
            h1 = np.concatenate([h1, np.full(fill, h1[-1], h1.dtype)])
            h2 = np.concatenate([h2, np.full(fill, h2[-1], h2.dtype)])
        if self._fused:
            outs = self._outs_cls(posterior=True)
            r = self.decoder.decode_pairs(h1, h2, t0_pos, t_len, outs, 0)
            return np.asarray(r["posterior"])[:, :, :n]
        return np.asarray(
            self.decoder.decode_pairs(h1, h2, t0_pos, t_len))[:, :, :n]

    # ------------------------------------------------------------------
    def write_outputs(self, result: DecodingReturnValues) -> None:
        """main.cpp:119-167."""
        p = self.params
        if p.do_posterior_sums:
            writers.write_sum_over_pairs(
                p.out_file_root + ".sumOverPairs.gz", result.sum_over_pairs)
        if p.do_major_minor_posterior_sums:
            writers.write_major_minor_sums(
                p.out_file_root, result.sum_over_pairs00,
                result.sum_over_pairs01, result.sum_over_pairs11,
                result.site_was_flipped)

    # ------------------------------------------------------------------
    def decode_pairs(self,
                     haps_a: Sequence[Union[int, str]],
                     haps_b: Sequence[Union[int, str]],
                     per_pair_posteriors: bool = False,
                     sum_of_posteriors: bool = False,
                     per_pair_posterior_means: bool = True,
                     per_pair_maps: bool = True) -> DecodePairsReturnStruct:
        """ASMC.cpp:80-128 + DecodePairsReturnStruct summaries."""
        if len(haps_a) != len(haps_b) or not haps_a:
            raise ValueError("A and B hap vectors must be equal-length, "
                             "non-empty")
        iid = self.data.iid_list

        def to_hap(x) -> int:
            if isinstance(x, str):
                sid, hap = combined_id_to_ind_plus_hap(x)
                idx = iid.index(sid)
                return dip_to_hap_id(idx, hap)
            return int(x)

        ha = np.asarray([to_hap(x) for x in haps_a], np.int32)
        hb = np.asarray([to_hap(x) for x in haps_b], np.int32)
        n = len(ha)
        L, K = self.data.sites, self.dq.states
        t_len = bucket_len(L)

        post = self._full_posterior(ha, hb, t_len)[:L]   # [L, K, n]
        expt = self.expected_coal_times

        indices = []
        for a, b in zip(ha, hb):
            ia, hap_a = hap_to_dip_id(int(a))
            ib, hap_b = hap_to_dip_id(int(b))
            indices.append((int(a), f"{iid[ia]}#{hap_a}",
                            int(b), f"{iid[ib]}#{hap_b}"))

        res = DecodePairsReturnStruct(per_pair_indices=indices)
        scaled = post * expt[None, :, None]               # [L, K, n]
        if per_pair_posteriors:
            res.per_pair_posteriors = scaled.transpose(2, 1, 0)
        if sum_of_posteriors:
            res.sum_of_posteriors = scaled.sum(axis=2).T  # [K, L]
        if per_pair_posterior_means or per_pair_posteriors:
            means = scaled.sum(axis=1).T                  # [n, L]
            res.per_pair_posterior_means = means
            res.min_posterior_means = means.min(axis=0)
            res.argmin_posterior_means = means.argmin(axis=0)
        if per_pair_maps:
            maps = post.argmax(axis=1).T                  # [n, L]
            res.per_pair_maps = maps.astype(np.int32)
            res.min_maps = maps.min(axis=0).astype(np.int32)
            res.argmin_maps = maps.argmin(axis=0).astype(np.int32)
        return res
