"""FastSMC pipeline: identification (hashing) + validation (HMM) + IBD output.

Mirror of ``ASMC::FastSMC::run`` (reference FastSMC.cpp:41-238) and the
batching/validation glue in ``HMM::decodeFromHashing`` / ``addToBatch`` /
``runLastBatch`` / ``writePerPairOutputFastSMC`` (HMM.cpp:470-502, 555-636,
1179-1357), re-architected so validation runs as large batched TPU decodes:

  * candidate matches stream into batch slots with their padded decode
    window; a full batch decodes [min from, max to) once on device;
  * the per-pair segment state machine runs on the device-reduced
    ``threshold_sums`` (and the posterior for age estimates), host-side;
  * hashing-mode segments scan the *batch union* window exactly like the
    reference's "permissive" override (HMM.cpp:1199-1204).
"""

from __future__ import annotations


import time
from typing import List, Optional, Tuple

import numpy as np

from ..config import DecodingParams
from ..engine import segments as seg
from ..engine.hmm import BatchedDecoder, bucket_len
from ..engine.oracle import DecodeContext
from ..io.decoding_quantities import DecodingQuantities
from ..io.haps import Data, load_data
from ..io import writers
from ..hashing.germline import HashingScan
from ..utils.timer import PhaseTimer


def get_from_position(genetic_positions: np.ndarray, from_pos: int,
                      cm_dist: float = 0.5) -> int:
    """HmmUtils.cpp:153-164 (0.5 cM pre-padding)."""
    cum = 0.0
    g = genetic_positions
    while cum < cm_dist and from_pos > 0:
        from_pos -= 1
        cum += (g[from_pos + 1] - g[from_pos]) * 100.0
    return from_pos


def get_to_position(genetic_positions: np.ndarray, to_pos: int,
                    cm_dist: float = 0.5) -> int:
    """HmmUtils.cpp:166-177 (0.5 cM post-padding)."""
    cum = 0.0
    g = genetic_positions
    n = len(g)
    while cum < cm_dist and to_pos + 1 < n:
        to_pos += 1
        cum += (g[to_pos] - g[to_pos - 1]) * 100.0
    return min(to_pos + 1, n)


def pad_from_positions(genetic_positions: np.ndarray, from_pos: np.ndarray,
                       cm_dist: float = 0.5) -> np.ndarray:
    """Vectorized :func:`get_from_position` over a candidate array: the
    largest j with (g[from] - g[j]) * 100 >= cm_dist, else 0. Equal to
    the reference's stepwise walk up to f64 prefix-vs-incremental
    rounding (< 1e-12 relative — boundary-identical unless a gap sum
    lands exactly on cm_dist at that precision)."""
    g = genetic_positions
    target = g[from_pos] - cm_dist / 100.0
    j = np.searchsorted(g, target, side="right") - 1
    return np.maximum(np.minimum(j, from_pos), 0).astype(np.int64)


def pad_to_positions(genetic_positions: np.ndarray, to_pos: np.ndarray,
                     cm_dist: float = 0.5) -> np.ndarray:
    """Vectorized :func:`get_to_position`: min(j + 1, n) for the smallest
    j >= to with (g[j] - g[to]) * 100 >= cm_dist, else n - 1."""
    g = genetic_positions
    n = len(g)
    tp = np.minimum(to_pos, n - 1)
    target = g[tp] + cm_dist / 100.0
    j = np.searchsorted(g, target, side="left")
    j = np.minimum(np.maximum(j, tp), n - 1)
    return np.minimum(j + 1, n).astype(np.int64)


class FastSMC:
    """End-to-end FastSMC run for one job."""

    def __init__(self, params: DecodingParams,
                 data: Optional[Data] = None,
                 dq: Optional[DecodingQuantities] = None,
                 use_pallas: Optional[bool] = None,
                 hashing_backend: str = "host",
                 decode_profile: str = "exact",
                 mesh=None,
                 sort_batches: int = 0,
                 flush_group: int = 0,
                 bucket_sites: Optional[int] = None):
        """hashing_backend: "host" (streaming scan; native C++ when built,
        Python otherwise) or "device" (sort-based XLA scan,
        hashing/vectorized.py).
        decode_profile: "exact" (reference NO_SSE numerics) or "fast"
        (bf16 alpha + single-pass bf16 matmuls, ~6e-3 posterior error, ~3x
        decode throughput).
        mesh: a ``jax.sharding.Mesh`` to shard each validation batch over
        (pair-parallel over chips; per-chip Pallas kernels on TPU). The
        batch size must be a multiple of the mesh size.
        sort_batches: buffer this many batches of candidates and sort them
        by window start before flushing (0 = reference arrival order).
        The reference decodes each batch over the union of its members'
        windows (HMM.cpp:560-565, a "permissive" compromise at batch 32);
        at batch >= 512 one straggler widens everyone, so sorting shrinks
        the unions and the wasted decoded sites. Output stays within the
        same permissive-window contract; the candidate stream and batch
        count remain deterministic (resume-safe).
        bucket_sites: canonical-window bucketing (the production
        default): each candidate decodes over the smallest ALIGNED
        power-of-two block containing its padded window, and batches are
        formed per block (eager flush — no sort barrier). Validation
        output becomes a deterministic function of the candidate set,
        invariant to batch size / candidate order / grouping (measured:
        identical record sets at batch 32/512/2048), and decode waste is
        bounded by construction instead of growing with batch size (11x
        at arrival-order batch 8192). The value floors the block size in
        sites. None = auto (64, or 0 when sort_batches>1 is explicitly
        requested); 0 disables (legacy arrival-order union batches).
        flush_group: drain interval for the grouped validation flow
        (per-batch async decode + in-jit extraction dispatches; one
        stacked download per group) — the
        remote TPU link costs ~40 ms per host round-trip, so per-batch
        dispatch/sync dominates the wall time (DISPATCH_PROBE.json);
        grouping B batches into one dispatch and draining the packed run
        arrays asynchronously amortizes it. 0 = auto (8 when the decoder
        supports it, else 1); 1 with a non-fused decoder keeps the
        per-batch path."""
        params.fastsmc = True
        if hashing_backend not in ("host", "device"):
            raise ValueError(f"unknown hashing backend {hashing_backend!r}")
        self.hashing_backend = hashing_backend
        self.params = params
        self.data = data if data is not None else load_data(params)
        self.dq = dq if dq is not None else DecodingQuantities.load(
            params.decoding_quant_file)
        self.ctx = DecodeContext.build(params, self.data, self.dq)
        if use_pallas is None:
            import jax
            use_pallas = jax.default_backend() not in ("cpu",)
        if mesh is not None:
            from ..engine.kernels import BwdOutputs
            from ..parallel.sharding import ShardedDecoder
            self.decoder = ShardedDecoder(self.ctx, mesh,
                                          use_pallas=use_pallas,
                                          decode_profile=decode_profile)
            if params.batch_size % self.decoder.n_devices != 0:
                raise ValueError(
                    f"batch_size {params.batch_size} must be a multiple of "
                    f"the mesh size {self.decoder.n_devices}")
            self._bwd_outputs_cls = BwdOutputs
        elif use_pallas:
            from ..engine.kernels import PallasDecoder, BwdOutputs

            from .asmc import _profile_kwargs
            # use_pallas="interpret" runs the same kernels in Pallas
            # interpret mode (CPU test coverage for the fused path)
            self.decoder = PallasDecoder(self.ctx,
                                         interpret=(use_pallas == "interpret"),
                                         **_profile_kwargs(decode_profile))
            self._bwd_outputs_cls = BwdOutputs
        else:
            self.decoder = BatchedDecoder(self.ctx)
            self._bwd_outputs_cls = None

        K = self.dq.states
        self.state_threshold = seg.state_threshold(
            self.dq.discretization, params.time, K)
        self.prob_threshold = seg.probability_threshold(
            self.dq.initial_state_prob, self.state_threshold)
        self.age_threshold = K if params.no_conditional_age_estimates \
            else self.state_threshold

        self._writer = None
        self.timer = PhaseTimer()
        bs = params.batch_size
        self._bh1 = np.zeros(bs, dtype=np.int32)
        self._bh2 = np.zeros(bs, dtype=np.int32)
        self._from = np.zeros(bs, dtype=np.int64)
        self._to = np.full(bs, self.data.sites, dtype=np.int64)
        self._bn = 0
        self._cpt = 0
        self.n_segments = 0
        # checkpoint/resume (an improvement over the reference, which can
        # only restart a killed job from scratch — SURVEY.md §5.4): batches
        # are deterministic, so a partial run can be resumed by replaying the
        # candidate stream and skipping already-flushed batches.
        self._batch_idx = 0
        self._resume_skip = 0
        # device-extraction boundary capacity; grows sticky so batch-heavy
        # runs compile the boundary kernel for at most a few cap buckets.
        # 4096 is the measured sweet spot for ages-off runs: extraction
        # cost scales with cap (a flat 8192 cap cost the 16k e2e ~45%
        # wall), while an ages-off overflow redo only re-extracts from
        # the saved threshold sums (bounded: the in-flight groups when
        # sticky growth lands, 13-17 redos per 98k run). With age
        # estimates the redo must RE-DECODE the batch with posterior
        # (the fused program keeps it as an internal temp), so dense
        # panels start at the batch width instead.
        _ages = (params.do_per_pair_posterior_mean
                 or params.do_per_pair_map)
        # caps must be positive multiples of 256 (the fused extraction's
        # score-chunk reshape), and batch_size is only validated to % 8
        self._seg_cap = bucket_len(max(4096, bs), 256) if _ages else 4096
        # kept-run output capacity (downloaded rows + score/pps work):
        # kept runs are typically ~20-40% of the raw boundaries, so the
        # kept cap grows on its own (smaller) worst case; invariant
        # _kept_cap <= _seg_cap (the raw pass bounds what can be kept)
        self._kept_cap = 4096
        # deferred host finish: while batch N's decode runs on device, the
        # host processes batch N-1's extraction/emit, keeping the device
        # busy (execution is in-order, so deferring never reorders results)
        self._pending = None
        # fused grouped path (decode_extract_packed + stack_rows): stage
        # batches, a whole group in one device call, drain the previous
        # group's packed run arrays while this one computes. ShardedDecoder
        # supports it too (per-shard packed rows merged at drain time), so
        # the mesh path runs the same production flow.
        self._fused = getattr(self.decoder, "supports_fused_extract", False)
        self.flush_group = flush_group if flush_group \
            else (8 if self._fused else 1)
        if not self._fused and flush_group > 1:
            raise ValueError("flush_group > 1 requires a fused decoder "
                             "(PallasDecoder or ShardedDecoder)")
        # minimum pad bucket: extraction caps need multiples of 256 per
        # extraction shard, and the pair axis must stay mesh-divisible
        self._pad_floor = 256 * getattr(self.decoder, "n_extract_shards", 1)
        self._group: List[dict] = []
        self._gpending = None
        self._pps_cap = 8192
        # decode memory guard (see _flush_entry): cap t_len * P so one
        # program's big per-site buffers fit the 15.75 GB HBM with
        # headroom. With age estimates the [t_len, K, P] f32 posterior
        # temp dominates (8M elements ~= 4.1 GB at the padded K=128);
        # otherwise the alpha stream does (f32 exact: 16M ~= 5.2 GB at
        # KA=80; bf16 fast/turbo: 32M). A chromosome-wide union batch at
        # t_len 8192 x P 8192 is 19.3 GB in f32 either way — the split
        # keeps arbitrary candidate streams compilable at any batch size.
        self._post_budget = 8 << 20
        alpha_bytes = getattr(getattr(self.decoder, "alpha_dtype", None),
                              "itemsize", 4)
        self._alpha_budget = (32 << 20) if alpha_bytes == 2 else (16 << 20)
        self._gp32 = np.float32(self.data.genetic_positions)
        # candidate sorting buffer (see __init__ docstring): column arrays
        # (from, to, id1, id2) accumulated until sort_batches*batch_size
        self.sort_batches = sort_batches
        self._sort_buf: List[Tuple[np.ndarray, ...]] = []
        self._sort_n = 0
        # canonical-window buckets (see bucket_sites in the docstring)
        if bucket_sites is None:
            bucket_sites = 0 if sort_batches > 1 else 64
        if bucket_sites and sort_batches > 1:
            raise ValueError("bucket_sites and sort_batches are mutually "
                             "exclusive candidate orderings")
        self.bucket_sites = bucket_sites
        self._buckets: dict = {}        # region -> list of column tuples
        self._bucket_n: dict = {}       # region -> buffered count
        # window-waste accounting (VERDICT r2: measure batch-union waste)
        # + host/link roofline terms (VERDICT r4 #4): D2H bytes, device
        # wait inside the drain (device_get = queue wait + transfer on the
        # ~23 MB/s link) vs pure host CPU in the drain
        self.stats = {"decoded_site_pairs": 0, "union_site_pairs": 0,
                      "cand_site_pairs": 0, "flushes": 0,
                      "overflow_redos": 0, "d2h_bytes": 0,
                      "drain_wait_s": 0.0, "drain_host_s": 0.0,
                      "batcher_s": 0.0, "ckpt_s": 0.0}

    # ------------------------------------------------------------------
    def _open_writer(self, append: bool = False):
        p = self.params
        path = p.ibd_output_path()
        if p.bin_out:
            self._writer = writers.IbdBinaryWriter(
                path, self.data.fam_id_list, self.data.iid_list,
                self.data.chr_number, p.output_ibd_segment_length,
                p.do_per_pair_posterior_mean, p.do_per_pair_map,
                append=append)
        else:
            self._writer = writers.IbdTextWriter(
                path, self.data.fam_id_list, self.data.iid_list,
                self.data.chr_number, append=append)
        return path

    # ------------------------------------------------------------------
    # decodeFromHashing mirror (HMM.cpp:470-502)
    # ------------------------------------------------------------------
    def _on_match(self, id1: int, id2: int, from_pos: int, to_pos: int):
        self._on_matches_array(
            np.asarray([id1], np.int32), np.asarray([id2], np.int32),
            np.asarray([from_pos], np.int64), np.asarray([to_pos], np.int64))

    def _on_matches_array(self, id1, id2, from_pos, to_pos):
        """Bulk candidate ingestion (the native scan delivers the whole
        stream as arrays; per-candidate Python calls would dominate a
        biobank run)."""
        self._cpt += len(id1)
        if self.bucket_sites:
            self._bucket_push(np.asarray(id1, np.int32),
                              np.asarray(id2, np.int32),
                              np.asarray(from_pos, np.int64),
                              np.asarray(to_pos, np.int64))
            return
        if self.sort_batches > 1:
            self._sort_buf.append((np.asarray(from_pos, np.int64),
                                   np.asarray(to_pos, np.int64),
                                   np.asarray(id1, np.int32),
                                   np.asarray(id2, np.int32)))
            self._sort_n += len(id1)
            if self._sort_n >= self.sort_batches * self.params.batch_size:
                self._drain_sort_buf(final=False)
            return
        self._push_arrays(id1, id2, from_pos, to_pos)

    def _canonical_windows(self, frm, to):
        """Canonical decode window per candidate: the smallest aligned
        power-of-two block [o, o + 2^k) (alignment 2^(k-1)) containing
        the candidate's 0.5 cM-PADDED window. Returns (k, o) arrays."""
        g = self.data.genetic_positions
        frm_p = pad_from_positions(g, frm)
        t2_p = pad_to_positions(g, to)
        ln = np.maximum(t2_p - frm_p, 1)
        k = np.frexp(ln.astype(np.float64))[1]        # ceil log2
        k = np.maximum(k, max(int(self.bucket_sites).bit_length() - 1, 6))
        o = (frm_p >> (k - 1)) << (k - 1)
        fits = o + (np.int64(1) << k) >= t2_p
        k = np.where(fits, k, k + 1)                  # at most one bump
        o = (frm_p >> (k - 1)) << (k - 1)
        return k.astype(np.int64), o.astype(np.int64)

    def _bucket_push(self, id1, id2, frm, to):
        """Canonical-window bucketing: each candidate is assigned the
        smallest ALIGNED power-of-two block covering its padded window
        (:meth:`_canonical_windows`); candidates sharing a block batch
        together, the block IS the decode window, and a batch flushes the
        moment any bucket holds batch_size candidates (no sort barrier —
        the device gets work while the producer thread keeps scanning).

        This makes validation output a DETERMINISTIC FUNCTION OF THE
        CANDIDATE SET: a candidate's posterior depends only on (pair,
        canonical window) — never on batch size, arrival order, grouping
        or which other candidates share the batch. Neither arrival-order
        big batches (union windows can span the chromosome) nor the
        reference itself (batch-32 unions, HMM.cpp:560-565) have this
        property: per-site posteriors of recent-TMRCA states mix over
        ~cM scales, so the decode-window choice shifts knife-edge
        detections. Waste is bounded by construction: decode width
        <= 4x the padded candidate window (typically ~2x), vs 11x
        measured for arrival-order unions at batch 8192.

        ``bucket_sites`` floors the block size (windows below it share
        64-site-aligned blocks)."""
        bs = self.params.batch_size
        t0 = time.perf_counter()
        t_flush = 0.0
        kk, oo = self._canonical_windows(frm, to)
        key = (kk << 48) | oo
        order = np.argsort(key, kind="stable")
        keys, starts = np.unique(key[order], return_index=True)
        for i, k in enumerate(keys):
            sl = order[starts[i]:
                       starts[i + 1] if i + 1 < len(keys) else None]
            k = int(k)
            self._buckets.setdefault(k, []).append(
                (id1[sl], id2[sl], frm[sl], to[sl]))
            n = self._bucket_n.get(k, 0) + len(sl)
            while n >= bs:
                cols = [np.concatenate([c_[j] for c_ in self._buckets[k]])
                        for j in range(4)]
                tf = time.perf_counter()
                self._flush_bucket([c[:bs] for c in cols], k)
                t_flush += time.perf_counter() - tf
                self._buckets[k] = [tuple(c[bs:] for c in cols)]
                n -= bs
            self._bucket_n[k] = n
        # host/link roofline (VERDICT r4 #4): pure batching CPU — window
        # canonicalization + bucket bookkeeping, excluding the dispatch/
        # drain work inside _flush_bucket (timed by the decode/segments/
        # outputPerPair phases)
        self.stats["batcher_s"] += time.perf_counter() - t0 - t_flush

    def _flush_bucket(self, cols, key: int):
        """Flush one canonical-window batch: decode bounds come from the
        bucket key, NOT from the members' min/max (that is the point)."""
        k = key >> 48
        o = key & ((1 << 48) - 1)
        frm = int(o)
        t2 = int(min(o + (1 << k), self.data.sites))
        self._flush_entry(cols[0].astype(np.int32),
                          cols[1].astype(np.int32), cols[2], cols[3],
                          self.params.batch_size, bounds=(frm, t2))

    def _drain_buckets(self):
        """End-of-scan flush: each remaining bucket tail flushes as its
        OWN (partial) batch, in key order — same canonical bounds, so
        tail candidates decode identically to full-batch ones; the
        underfull-batch pad shrink keeps small tails cheap."""
        for key in sorted(self._buckets):
            cols = [np.concatenate([c_[j] for c_ in self._buckets[key]])
                    for j in range(4)]
            if len(cols[0]):
                self._flush_bucket(cols, key)
        self._buckets.clear()
        self._bucket_n.clear()

    def _push_arrays(self, id1, id2, from_pos, to_pos):
        bs = self.params.batch_size
        i, n = 0, len(id1)
        while i < n:
            take = min(bs - self._bn, n - i)
            sl = slice(self._bn, self._bn + take)
            self._bh1[sl] = id1[i:i + take]
            self._bh2[sl] = id2[i:i + take]
            self._from[sl] = from_pos[i:i + take]
            self._to[sl] = to_pos[i:i + take]
            self._bn += take
            i += take
            if self._bn == bs:
                self._flush(self._bn)

    def _drain_sort_buf(self, final: bool):
        """Sort buffered candidates and flush full batches; keep a partial
        batch buffered unless ``final`` (stable sort keeps the stream
        deterministic for resume).

        Ordering is genomic-region major (from//512), then window-length
        class, then start: batches hold candidates from one ~512-site
        region with similar lengths, so the batch-union window (the
        reference's permissive compromise, HMM.cpp:560-565, sized for
        batch 32) stays near the candidates' own windows even at batch
        8192 — one long straggler no longer widens a whole batch of short
        windows. Measured on the 16k founder-mosaic stream (batch 8192):
        arrival order decodes 10.95x the candidate site-pairs over 96.5k
        grid steps; this key decodes 7.13x over 62.8k steps (region-major
        keeps same-pair candidates adjacent, unlike a pure length-class
        sort, which tripled duplicated segment output)."""
        frm = np.concatenate([c[0] for c in self._sort_buf])
        to = np.concatenate([c[1] for c in self._sort_buf])
        id1 = np.concatenate([c[2] for c in self._sort_buf])
        id2 = np.concatenate([c[3] for c in self._sort_buf])
        wl = np.maximum(to - frm, 1)
        cls = np.frexp(wl.astype(np.float64))[1]   # ceil log2 length class
        order = np.lexsort((to, frm, cls, frm // 512))
        bs = self.params.batch_size
        keep = 0 if final else len(order) % bs
        emit = order[:len(order) - keep] if keep else order
        rest = order[len(order) - keep:] if keep else order[:0]
        self._sort_buf = [(frm[rest], to[rest], id1[rest], id2[rest])] \
            if keep else []
        self._sort_n = keep
        self._push_arrays(id1[emit], id2[emit], frm[emit], to[emit])

    def _flush(self, n: int):
        if n == 0:
            return
        h1 = self._bh1[:n].copy()
        h2 = self._bh2[:n].copy()
        fr = self._from[:n].copy()
        to = self._to[:n].copy()
        self._bn = 0
        self._flush_entry(h1, h2, fr, to, self.params.batch_size)

    def _flush_entry(self, h1, h2, fr, to, pad_to: int, bounds=None):
        n = len(h1)
        p = self.params
        g = self.data.genetic_positions
        start_batch = int(fr.min())
        end_batch = int(to.max())
        if bounds is not None:
            # canonical-window batch (_flush_bucket): decode bounds are a
            # property of the bucket, not of the members' min/max
            frm, t2 = bounds
        else:
            frm = get_from_position(g, start_batch)
            t2 = get_to_position(g, end_batch)
        t_len = bucket_len(t2 - frm)
        need_ages = p.do_per_pair_posterior_mean or p.do_per_pair_map

        # decode memory guard: a wide-union batch materializes per-site
        # buffers ([t_len, K, P] f32 posterior with ages; the [t_len, KA,
        # P] alpha stream otherwise) that at t_len 8192 x P 8192 reach
        # 19.3 GB and cannot compile into the 15.75 GB HBM. Split the
        # pair axis (candidates stay in stream order, so each half's own
        # union usually also shrinks) until the program fits the budget.
        # underfull batches (e.g. a lone near-chromosome-wide candidate in
        # the final flush, or canonical-bucket tails) shrink their pad
        # bucket first: a single wide candidate must not dispatch at
        # t_len 8192 x P 8192 with the ages posterior (~19 GB — the HBM
        # compile crash the guard prevents); per-pair outputs are
        # independent of the pad width, so this only changes program
        # shapes, never results. Floor 1024 (not 256): every extra
        # (t_len, P) shape is a 30-80 s cold compile on the axon backend,
        # and canonical bucketing produces ~#buckets partial tails per
        # run — padded compute below width 1024 is cheaper than the
        # compile diversity.
        while pad_to > max(self._pad_floor, 1024) and n <= pad_to // 2:
            pad_to //= 2
        budget = self._post_budget if need_ages else self._alpha_budget
        if (pad_to > self._pad_floor and n > 1 and t_len * pad_to > budget):
            k = (n + 1) // 2
            self._flush_entry(h1[:k], h2[:k], fr[:k], to[:k], pad_to // 2,
                              bounds=bounds)
            self._flush_entry(h1[k:], h2[k:], fr[k:], to[k:], pad_to // 2,
                              bounds=bounds)
            return

        if self._batch_idx < self._resume_skip:
            self._batch_idx += 1
            return
        self._batch_idx += 1

        # scan-window semantics: permissive = the batch union (reference
        # HMM.cpp:1199-1204 override, raw-union variant); default = each
        # candidate's own PADDED window (the reference's flagged
        # less-permissive TODO option — batch-composition-invariant
        # output; see config.permissive_window)
        if self.params.permissive_window:
            w0r = w1r = None
            s0r, s1r = start_batch - frm, end_batch - frm
        else:
            w0a = pad_from_positions(g, fr)
            w1a = pad_to_positions(g, to)
            w0r = np.clip(w0a - frm, 0, t_len).astype(np.int32)
            w1r = np.clip(w1a - frm, 0, t_len).astype(np.int32)
            s0r, s1r = 0, t2 - frm

        # pad to a fixed batch width (one jit shape), like the reference pads
        # to a VECX multiple (HMM.cpp:617-621)
        if n < pad_to:
            fill = pad_to - n
            h1 = np.concatenate([h1, np.full(fill, h1[-1], np.int32)])
            h2 = np.concatenate([h2, np.full(fill, h2[-1], np.int32)])
            if w0r is not None:
                w0r = np.concatenate([w0r, np.full(fill, w0r[-1], np.int32)])
                w1r = np.concatenate([w1r, np.full(fill, w1r[-1], np.int32)])

        self.stats["flushes"] += 1
        self.stats["union_site_pairs"] += (end_batch - start_batch) * n
        self.stats["cand_site_pairs"] += int((to - fr).sum())

        if self._fused:
            self._group.append(dict(
                hap1=h1, hap2=h2, n=n, frm=frm, to=t2,
                start=start_batch, end=end_batch, t_len=t_len,
                s0=s0r, s1=s1r, w0=w0r, w1=w1r,
                P=pad_to, need_ages=need_ages, idx=self._batch_idx))
            if len(self._group) >= self.flush_group:
                self._dispatch_group()
            return

        self.stats["decoded_site_pairs"] += t_len * pad_to
        with self.timer.phase("decode"):
            post, th_sums = self._decode(h1, h2, frm, t_len, need_ages)

        # host-side work for the PREVIOUS batch happens while this batch's
        # decode runs on device (in-order execution keeps results exact)
        self._finish_pending()
        self._pending = (th_sums, post, n, frm, s0r, s1r, w0r, w1r,
                         h1, h2, need_ages, self._batch_idx)

    # ------------------------------------------------------------------
    # fused grouped path: one device dispatch per flush group, packed run
    # arrays drained asynchronously (see flush_group in __init__)
    # ------------------------------------------------------------------
    def _dispatch_group(self):
        if not self._group:
            return
        entries = self._group
        self._group = []
        need_pps = any(e["need_ages"] for e in entries)
        self.stats["decoded_site_pairs"] += \
            sum(e["t_len"] * e["P"] for e in entries)

        # per-batch fused decode+extract(+ages) dispatches (cheap and
        # FASTER than fusing the group into one program:
        # MULTI_VARIANT_PROBE.json measured ~26 ms/batch for any one-jit
        # grouping vs 7.4 ms dispatched separately); then one stacking
        # dispatch and an async D2H so the drain doesn't wait behind the
        # next group's execution in the in-order device queue. With ages
        # on the [T, K, P] posterior is a program-internal temp (a flush
        # group of separate posterior buffers would not fit HBM). The
        # same call serves PallasDecoder (flat packed rows) and
        # ShardedDecoder (per-shard rows merged at drain time).
        ths, packs, ppss = [], [], []
        # the raw pass bounds what can be kept; clamping (rather than an
        # invariant on the attributes) keeps externally-tweaked caps
        # (tests, tuning) legal
        kcap = min(self._kept_cap, self._seg_cap)
        with self.timer.phase("decode"):
            for e in entries:
                packed, ages_rows, th = self.decoder.decode_extract_packed(
                    e["hap1"], e["hap2"], e["frm"], e["t_len"],
                    self.state_threshold, e["s0"], e["s1"],
                    self.prob_threshold,
                    self._seg_cap, self._pps_cap, self.age_threshold,
                    self.dq.initial_state_prob,
                    need_ages=e["need_ages"],
                    w0=e["w0"], w1=e["w1"], kcap=kcap)
                ths.append(th)
                packs.append(packed)
                ppss.append(ages_rows)
            res = {"th": ths,
                   "packed": seg.stack_rows(packs),
                   "pps": seg.stack_rows(ppss) if need_pps else None,
                   # dispatch-time caps: overflow checks at drain time
                   # must compare against what THIS group extracted with
                   "caps": (self._seg_cap, kcap)}
            # start BOTH D2H copies now: a device op issued at drain time
            # (e.g. a pps row gather) would queue behind the NEXT group's
            # programs in the in-order stream and block the drain for a
            # whole group's compute (~0.75 s/group at 98k ages)
            for key in ("packed", "pps"):
                try:
                    if res[key] is not None:
                        res[key].copy_to_host_async()
                except AttributeError:
                    pass
        self._drain_group()
        self._gpending = (res, entries, need_pps)

    @staticmethod
    def _unpack_entry(packed_i: np.ndarray, t_len: int, P: int):
        """Host unpack of one entry's packed extraction: flat row
        (PallasDecoder) or per-shard rows (ShardedDecoder). Returns
        (start, b, score, ns_kept, ns_raw) sliced to the valid KEPT-run
        count; ``ns_kept[s]`` over the kept cap or ``ns_raw[s]`` over the
        raw cap means truncation and the batch must be redone at grown
        caps."""
        if packed_i.ndim == 2:                 # sharded [S, 3*kcap+2]
            return seg.merge_packed_shards(packed_i, t_len,
                                           P // packed_i.shape[0])
        kcap = (len(packed_i) - 2) // 3
        start, b, score, nk, nr = seg.unpack_extract_rows(packed_i, kcap)
        k = min(nk, kcap)
        return start[:k], b[:k], score[:k], [nk], [nr]

    @staticmethod
    def _merge_entry_ages(ages_i: np.ndarray, ns_kept):
        """Device-computed age rows for one entry ([2, capp] flat or
        [S, 2, capp] sharded) -> [2, n_kept] aligned 1:1 with the merged
        kept-run arrays (extraction compacts kept runs on device)."""
        capp = ages_i.shape[-1]
        if ages_i.ndim == 3:
            return np.concatenate(
                [ages_i[s][:, :min(ns_kept[s], capp)]
                 for s in range(ages_i.shape[0])], axis=1)
        return ages_i[:, :min(ns_kept[0], capp)]

    def _drain_group(self):
        if self._gpending is None:
            return
        res, entries, need_pps = self._gpending
        self._gpending = None
        import jax
        with self.timer.phase("segments"):
            t_seg0 = time.perf_counter()
            wait0 = self.stats["drain_wait_s"]
            # ONE download for the whole group: idx/lv/score/n are packed
            # into a single i32 matrix in-jit (each device_get leaf costs
            # a ~40+ ms round-trip on the remote link)
            packed = np.asarray(jax.device_get(res["packed"]))
            self.stats["d2h_bytes"] += packed.nbytes
            self.stats["drain_wait_s"] += time.perf_counter() - t_seg0
            raw_cap, kcap = res["caps"]
            pps_cap = res["pps"].shape[-1] if need_pps else 0
            rows = []
            per_batch: List = []
            pps_rows = []           # batch indices needing age rows
            for i, e in enumerate(entries):
                start_h, b_h, score_h, ns_kept, ns_raw = \
                    self._unpack_entry(packed[i], e["t_len"], e["P"])
                rows.append(ns_kept)
                nk, nr = max(ns_kept), max(ns_raw)
                if nr > raw_cap or nk > kcap \
                        or (need_pps and e["need_ages"]
                            and nk > pps_cap):
                    per_batch.append(None)        # overflow: redo below
                    self.stats["overflow_redos"] += 1
                    while self._seg_cap < nr:
                        self._seg_cap *= 2
                    while self._kept_cap < nk:
                        self._kept_cap *= 2
                    while need_pps and self._pps_cap < nk:
                        self._pps_cap *= 2
                    if self._kept_cap > self._seg_cap:
                        self._seg_cap = self._kept_cap
                    continue
                # array-only path: no per-run Python objects (both writers
                # have write_block; ages attach as vectorised columns)
                per_batch.append(("runs",) + seg.runs_from_packed(
                    start_h, b_h, score_h, e["t_len"]))
                if e["need_ages"] and max(ns_kept):
                    pps_rows.append(i)
            ages = {}
            if pps_rows:
                # ages computed ON DEVICE ([B, 2, cap]: posterior-mean +
                # MAP per run); one whole-stack download whose async copy
                # started at dispatch time — 2 scalars/run instead of K
                # posterior sums on the ~23 MB/s host link
                t_w = time.perf_counter()
                ages_h = np.asarray(jax.device_get(res["pps"]))
                self.stats["d2h_bytes"] += ages_h.nbytes
                self.stats["drain_wait_s"] += time.perf_counter() - t_w
                for i in pps_rows:
                    ages[i] = self._merge_entry_ages(ages_h[i], rows[i])
            for i, e in enumerate(entries):
                if per_batch[i] is None:          # overflow redo
                    per_batch[i], redo_ages = self._redo_entry(
                        e, res["th"][i])
                    if redo_ages is not None:
                        ages[i] = redo_ages
            self.stats["drain_host_s"] += (
                time.perf_counter() - t_seg0
                - (self.stats["drain_wait_s"] - wait0))
        done_idx = None
        with self.timer.phase("outputPerPair"):
            for i, e in enumerate(entries):
                pb = per_batch[i]
                if isinstance(pb, tuple):         # array fast path
                    self._emit_runs(e, *pb[1:], ages=ages.get(i))
                else:
                    segs = [s for s in pb if s.pair < e["n"]]
                    self._emit(segs, e["hap1"], e["hap2"])
                done_idx = e["idx"]
        if done_idx is not None:
            # checkpointing closes + reopens the gzip member, which must
            # drain the writer thread's format+deflate backlog onto the
            # critical path — at 98k-hap density that wait measured
            # ~0.8 s per checkpoint (ckpt_s roofline term), so every
            # 16th drain balances resume granularity against it. resume
            # only replays the candidate stream (cheap). run() writes a
            # final checkpoint-free close.
            self._drains_since_ckpt = getattr(self, "_drains_since_ckpt",
                                              0) + 1
            if self._drains_since_ckpt >= 16:
                self._drains_since_ckpt = 0
                self._write_progress(done_idx)

    def _redo_entry(self, e, th):
        """Overflow redo at the (already grown) caps, through the SAME
        numeric path as a normal batch: with ages the batch re-runs the
        fused decode+extract+ages program (the posterior was a program-
        internal temp, so a re-decode is unavoidable), otherwise the saved
        threshold sums re-extract in-jit. Returns (("runs", pair, a, b,
        score), ages [2, n_kept] or None) exactly like the normal drain,
        so redone batches are byte-identical to what a big-enough initial
        cap would have produced (run-to-run reproducible output bytes)."""
        import jax
        s0, s1 = int(e["s0"]), int(e["s1"])
        while True:
            raw_cap = self._seg_cap
            kcap = min(self._kept_cap, raw_cap)
            if e["need_ages"]:
                packed_d, ages_d, _ = self.decoder.decode_extract_packed(
                    e["hap1"], e["hap2"], e["frm"], e["t_len"],
                    self.state_threshold, s0, s1, self.prob_threshold,
                    raw_cap, self._pps_cap, self.age_threshold,
                    self.dq.initial_state_prob, need_ages=True,
                    w0=e["w0"], w1=e["w1"], kcap=kcap)
            else:
                # re-extract only: the saved threshold sums already hold
                # the decode result
                th_m = th if e["w0"] is None else \
                    seg.mask_window(th, e["w0"], e["w1"])
                packed_d, _ = seg.extract_packed(
                    th_m, s0, s1, self.prob_threshold, raw_cap,
                    None, 0, kcap=kcap)
                ages_d = None
            t_w = time.perf_counter()
            packed = np.asarray(jax.device_get(packed_d))
            self.stats["d2h_bytes"] += packed.nbytes
            self.stats["drain_wait_s"] += time.perf_counter() - t_w
            start_h, b_h, score_h, ns_kept, ns_raw = self._unpack_entry(
                packed, e["t_len"], e["P"])
            nk, nr = max(ns_kept), max(ns_raw)
            capp = ages_d.shape[-1] if ages_d is not None else nk
            if nr <= raw_cap and nk <= kcap and nk <= capp:
                break
            while self._seg_cap < nr:
                self._seg_cap *= 2
            while self._kept_cap < nk:
                self._kept_cap *= 2
            while ages_d is not None and self._pps_cap < nk:
                self._pps_cap *= 2
            # the effective kept cap is min(kept, raw): when the raw cap
            # is the binding side (e.g. externally shrunk), it must grow
            # too or the retry loop cannot make progress
            while min(self._kept_cap, self._seg_cap) < nk:
                self._seg_cap *= 2
        runs = ("runs",) + seg.runs_from_packed(start_h, b_h, score_h,
                                                e["t_len"])
        redo_ages = None
        if ages_d is not None:
            t_w = time.perf_counter()
            ages_h = np.asarray(jax.device_get(ages_d))
            self.stats["d2h_bytes"] += ages_h.nbytes
            self.stats["drain_wait_s"] += time.perf_counter() - t_w
            redo_ages = self._merge_entry_ages(ages_h, ns_kept)
        return runs, redo_ages

    def _emit_runs(self, e, pair, a, b, score_sum, ages=None):
        """Vectorised emit from run arrays (window-relative a/b); byte-
        identical to :meth:`_emit` + per-record writes. ``ages`` ([2,
        n_kept] f32: device-computed posterior-mean and MAP rows aligned
        with the kept-run arrays) carries the age columns of the
        reference default profile (HMM.cpp:1179-1357)."""
        p = self.params
        keep = pair < e["n"]
        pair, a, b = pair[keep], a[keep], b[keep]
        score_sum = score_sum[keep]
        start = a + e["frm"]
        end = b + e["frm"]
        h1 = e["hap1"][pair]
        h2 = e["hap2"][pair]
        length = None
        if p.output_ibd_segment_length:
            gp32 = self._gp32
            length = np.float32(100.0) * (gp32[end] - gp32[start])
        score = score_sum.astype(np.float64) / (end - start + 1)
        post_est = map_est = None
        if ages is not None:
            if p.do_per_pair_posterior_mean:
                post_est = ages[0][keep]
            if p.do_per_pair_map:
                map_est = ages[1][keep]
        phys = self.data.physical_positions
        self._writer.write_block(h1 >> 1, 1 + (h1 & 1), h2 >> 1,
                                 1 + (h2 & 1), phys[start], phys[end],
                                 length, score, post_est, map_est)
        self.n_segments += len(pair)

    def _finish_pending(self):
        if self._pending is None:
            return
        (th_sums, post, n, frm, s0, s1, w0r, w1r,
         hap1, hap2, need_ages, done_idx) = self._pending
        self._pending = None
        # segment scan windows: batch union (permissive) or per-candidate
        # padded windows (default; -1-masked columns clip runs, see
        # _flush_entry)
        with self.timer.phase("segments"):
            if self._bwd_outputs_cls is not None:
                # device extraction: only run boundaries + per-run
                # reductions cross the (slow) host link
                if w0r is not None:
                    th_sums = seg.mask_window(th_sums, w0r, w1r)
                segs, self._seg_cap = seg.extract_segments_device(
                    th_sums, post if need_ages else None,
                    self.prob_threshold, s0, s1, frm,
                    self.age_threshold, cap=self._seg_cap)
                segs = [s for s in segs if s.pair < n]
            else:
                sums_w = np.asarray(th_sums)[s0:s1]
                if w0r is not None:
                    pos = np.arange(s0, s1)[:, None]
                    in_win = (pos >= w0r[None, :]) & (pos < w1r[None, :])
                    sums_w = np.where(in_win, sums_w, np.float32(-1.0))
                segs = seg.extract_segments(sums_w, self.prob_threshold,
                                            frm + s0, None,
                                            self.age_threshold)
                segs = [s for s in segs if s.pair < n]
                if need_ages and segs:
                    self._fill_pps(segs, post, frm)
        with self.timer.phase("outputPerPair"):
            self._emit(segs, hap1, hap2)
        self._write_progress(done_idx)

    def _write_progress(self, done_idx: int):
        """Crash-safe checkpoint: close the current gzip member so the file
        is valid up to here, record (finished batches, segments, byte
        offset), and reopen in append mode. On resume the file is truncated
        back to the recorded offset, discarding any partially-written
        member."""
        import os
        t0 = time.perf_counter()
        out = self.params.ibd_output_path()
        # reopening replaces the writer object: carry the roofline
        # counters so a checkpointed run reports its FULL fmt/deflate
        # cost (they silently reset every 4 drains in round 4)
        fmt_s = getattr(self._writer, "fmt_s", 0.0)
        deflate_s = getattr(self._writer, "deflate_s", 0.0)
        self._writer.close()
        offset = os.path.getsize(out)
        path = out + ".progress"
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{done_idx} {self.n_segments} {offset}\n")
        os.replace(tmp, path)
        self._open_writer(append=True)
        self._writer.fmt_s = fmt_s
        self._writer.deflate_s = deflate_s
        # checkpoint cost is mostly the writer close: it drains the
        # background deflate queue (gzip member boundary), pulling any
        # deflate backlog onto the main thread every 4th drain
        self.stats["ckpt_s"] += time.perf_counter() - t0

    def _fill_pps(self, segs: List[seg.Segment], post, frm: int,
                  chunk: int = 256) -> None:
        """Per-segment posterior-state sums, computed on device via an
        indicator matmul over the run intervals (replaces transferring the
        full [T, K, P] posterior to host). Segments are processed in
        fixed-size chunks so the gathered [T, K, chunk] posterior stays a
        few hundred MB even when a large batch emits thousands of runs."""
        import jax.numpy as jnp
        T = post.shape[0]
        n_seg = len(segs)
        n_pad = bucket_len(n_seg, chunk) if n_seg > chunk \
            else bucket_len(n_seg, 32)
        n_chunk = min(n_pad, chunk)
        ind = np.zeros((n_pad, T), np.float32)
        p_idx = np.zeros(n_pad, np.int32)
        for i, s in enumerate(segs):
            ind[i, s.start - frm:s.end - frm + 1] = 1.0
            p_idx[i] = s.pair
        post = jnp.asarray(post)
        pps_parts = []
        for lo in range(0, n_pad, n_chunk):
            hi = lo + n_chunk
            post_g = jnp.take(post, jnp.asarray(p_idx[lo:hi]),
                              axis=2)                  # [T, K, n_chunk]
            pps_parts.append(np.asarray(jnp.einsum(
                "it,tki->ik", jnp.asarray(ind[lo:hi]), post_g,
                precision="highest")))
        pps = np.concatenate(pps_parts, axis=0)
        for i, s in enumerate(segs):
            s.pps = pps[i, :self.age_threshold]

    def _decode(self, hap1, hap2, frm: int, t_len: int, need_ages: bool
                ) -> Tuple[Optional[np.ndarray], np.ndarray]:
        """Returns (posterior [T,K,P] or None, threshold_sums [T,P]).

        On the device path both stay on device — segment extraction runs
        there too (engine/segments.py: extract_segments_device) and only
        boundary indices + per-run reductions cross the host link."""
        if self._bwd_outputs_cls is not None:
            outs = self._bwd_outputs_cls(
                posterior=need_ages, posterior_sums=False,
                per_pair_mean=False, per_pair_map=False, threshold_sums=True)
            r = self.decoder.decode_pairs(hap1, hap2, frm, t_len, outs,
                                          self.state_threshold)
            post = r["posterior"] if need_ages else None  # stays on device
            return post, r["threshold_sums"]
        post = self.decoder.decode_pairs(hap1, hap2, frm, t_len)
        th = np.asarray(post[:, :self.state_threshold, :].sum(axis=1))
        return (post if need_ages else None), th

    def _emit(self, segs: List[seg.Segment], hap1, hap2):
        p = self.params
        dq = self.dq
        w = self._writer
        for s in segs:
            h1, h2 = int(hap1[s.pair]), int(hap2[s.pair])
            length_cm = None
            if p.output_ibd_segment_length:
                length_cm = 100.0 * (
                    np.float32(self.data.genetic_positions[s.end])
                    - np.float32(self.data.genetic_positions[s.start]))
            score = s.score_sum / float(s.end - s.start + 1)
            post_est = map_est = None
            if s.pps is not None:
                if p.do_per_pair_posterior_mean:
                    post_est = seg.posterior_mean_from_pps(
                        s.pps, dq.expected_times)
                if p.do_per_pair_map:
                    map_est = seg.map_from_pps(
                        s.pps, dq.initial_state_prob, dq.expected_times)
            w.write(writers.IbdRecord(
                ind1=h1 // 2, hap1=1 + h1 % 2,
                ind2=h2 // 2, hap2=1 + h2 % 2,
                pos_start=int(self.data.physical_positions[s.start]),
                pos_end=int(self.data.physical_positions[s.end]),
                length_cm=length_cm, score=score,
                post_est=post_est, map_est=map_est))
            self.n_segments += 1

    def roofline(self) -> dict:
        """Per-resource accounting of a finished run (VERDICT r4 #4): the
        host/link terms that bound the wall — D2H bytes over the ~23 MB/s
        link, drain device-wait vs host CPU, writer formatter vs gzip
        deflate CPU, and producer-thread scan CPU."""
        st = self.stats
        w = self._writer
        return {
            "d2h_mb": round(st["d2h_bytes"] / 1e6, 1),
            "drain_wait_s": round(st["drain_wait_s"], 2),
            "drain_host_s": round(st["drain_host_s"], 2),
            "batcher_s": round(st["batcher_s"], 2),
            "ckpt_s": round(st["ckpt_s"], 2),
            "writer_fmt_s": round(getattr(w, "fmt_s", 0.0), 2),
            "writer_deflate_s": round(getattr(w, "deflate_s", 0.0), 2),
            "scan_thread_s": round(getattr(self, "_scan_thread_s", 0.0), 2),
        }

    # ------------------------------------------------------------------
    # no-hashing mode: decode every pair in the job range
    # ------------------------------------------------------------------
    def _run_no_hashing(self):
        """HMM::decodeAll pair enumeration (HMM.cpp:310-364) with flat
        pair-range splitting by jobInd/jobs."""
        from .asmc import ASMC
        p = self.params
        N = self.data.n_ind
        tot_pairs = N if p.within_only else 2 * N * N - N
        pairs_start = tot_pairs * (p.job_ind - 1) // p.jobs
        pairs_end = tot_pairs * p.job_ind // p.jobs

        # batches decode the full sequence; the job's hap pairs come from
        # the closed-form flat-index inversion (pairs_from_flat_indices),
        # one batch at a time — never a Python loop over all 2N^2-N pairs
        # (HMM.cpp:310-364 does that loop in C++; at 98k haps it would be
        # ~1e10 Python iterations) and never a materialised list
        bs = p.batch_size
        L = self.data.sites
        for ofs in range(pairs_start, pairs_end, bs):
            idx = np.arange(ofs, min(ofs + bs, pairs_end), dtype=np.int64)
            h1, h2 = ASMC.pairs_from_flat_indices(idx, p.within_only)
            h1 = h1.astype(np.int32)
            h2 = h2.astype(np.int32)
            n = len(h1)
            if n < bs:
                h1 = np.concatenate([h1, np.full(bs - n, h1[-1], np.int32)])
                h2 = np.concatenate([h2, np.full(bs - n, h2[-1], np.int32)])
            t_len = bucket_len(L)
            need_ages = p.do_per_pair_posterior_mean or p.do_per_pair_map
            post, th = self._decode(h1, h2, 0, t_len, need_ages)
            if self._bwd_outputs_cls is not None:
                segs, self._seg_cap = seg.extract_segments_device(
                    th, post if need_ages else None, self.prob_threshold,
                    0, L, 0, self.age_threshold, cap=self._seg_cap)
                segs = [s for s in segs if s.pair < n]
            else:
                sums_w = th[:L]
                segs = seg.extract_segments(sums_w, self.prob_threshold, 0,
                                            None, self.age_threshold)
                segs = [s for s in segs if s.pair < n]
                if need_ages and segs:
                    self._fill_pps(segs, post, 0)
            self._emit(segs, h1, h2)

    # ------------------------------------------------------------------
    def run(self, verbose: bool = True, resume: bool = False) -> str:
        """Full pipeline; returns the output path.

        With ``resume=True`` a partially-written output is continued: the
        deterministic candidate stream is replayed and batches already
        flushed (per the ``.progress`` sidecar) are skipped.
        """
        import os
        t0 = time.time()
        self.timer = PhaseTimer()
        progress = self.params.ibd_output_path() + ".progress"
        append = False
        if resume and os.path.exists(progress) \
                and os.path.exists(self.params.ibd_output_path()):
            done, nseg, offset = open(progress).read().split()
            self._resume_skip = int(done)
            self.n_segments = int(nseg)
            # drop any partial gzip member written after the last checkpoint
            with open(self.params.ibd_output_path(), "ab") as fh:
                fh.truncate(int(offset))
            append = True
        path = self._open_writer(append=append)
        if self.params.hashing:
            with self.timer.phase("identification"):
                if self.hashing_backend == "device":
                    from ..hashing.vectorized import VectorizedHashingScan
                    scan = VectorizedHashingScan(self.params, self.data,
                                                 self._on_match)
                    scan.run(verbose=verbose)
                else:
                    scan = HashingScan(self.params, self.data, self._on_match)
                    scan.array_callback = self._on_matches_array
                    # FASTSMC_NO_OVERLAP=1 falls back to the monolithic
                    # scan (A/B knob for the producer-thread overlap);
                    # "" and "0" conventionally mean off
                    scan.run(verbose=verbose,
                             overlap=os.environ.get("FASTSMC_NO_OVERLAP",
                                                    "") in ("", "0"))
            self._scan_thread_s = getattr(scan, "scan_thread_s", 0.0)
            if self.bucket_sites:
                self._drain_buckets()
            if self._sort_buf:
                self._drain_sort_buf(final=True)
            self._flush(self._bn)
            if self._fused:
                self._dispatch_group()
                self._drain_group()
            self._finish_pending()
        else:
            self._run_no_hashing()
        self._writer.close()
        if os.path.exists(progress):
            os.remove(progress)
        if verbose:
            print(f"[fastsmc] {self.n_segments} segments "
                  f"({self._cpt} candidates) in {time.time() - t0:.2f}s "
                  f"-> {path}")
            st = self.stats
            if st["cand_site_pairs"]:
                dr = st["decoded_site_pairs"] / st["cand_site_pairs"]
                ur = st["union_site_pairs"] / st["cand_site_pairs"]
                print(f"[fastsmc] window waste: decoded/candidate "
                      f"site-pairs = {dr:.2f}x (union/candidate = {ur:.2f}x, "
                      f"{st['flushes']} flushes)")
            self.timer.report()
        return path
