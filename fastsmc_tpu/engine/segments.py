"""IBD segment extraction: the 4-level threshold state machine.

Vectorised mirror of ``HMM::writePerPairOutputFastSMC`` (reference
HMM.cpp:1179-1357).  The reference walks positions per pair keeping four
"recall level" flags (isIBD / isIBD1 / isIBD2 / isIBD3); a segment is a
maximal run of constant level, emitted with

  * score   = (sum over run of the below-threshold posterior mass)
              / run length in positions              (HMM.cpp:1130)
  * age estimates from the per-state posterior summed over the run
    (posterior mean HMM.cpp:1087-1097; MAP HMM.cpp:1099-1107)

Levels (HMM.cpp:1226/1254/1281/1308):
  level 0: sum >= 1000 * probabilityThreshold
  level 1: sum >=  100 * probabilityThreshold
  level 2: sum >=   10 * probabilityThreshold
  level 3: sum >=        probabilityThreshold
  else: no IBD

The run/emission structure here is equivalent to the reference's flag
machine: entering a different level ends the previous run, a drop below all
thresholds ends it, and the window end flushes the active run.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class Segment:
    pair: int          # batch index
    start: int         # position index (absolute)
    end: int           # position index (absolute, inclusive)
    score_sum: float   # cumulative posterior (before dividing by length)
    pps: Optional[np.ndarray]  # per-state posterior sums [age_threshold]


def state_threshold(discretization: np.ndarray, time: int, states: int) -> int:
    """HMM::getStateThreshold (HMM.cpp:504-513)."""
    r = 0
    while r < states and discretization[r] < float(time):
        r += 1
    return r


def probability_threshold(initial_state_prob: np.ndarray, st: int) -> float:
    """HMM.cpp:96-99: cumulative initial-state mass below the threshold
    (sequential float32 sum like the reference)."""
    s = np.float32(0.0)
    for x in initial_state_prob[:st]:
        s = np.float32(s + np.float32(x))
    return float(s)


def levels_from_sums(sums: np.ndarray, prob_threshold: float) -> np.ndarray:
    """sums [T, P] -> level [T, P] uint8 (0..3 active, 4 = none)."""
    p = np.float32(prob_threshold)
    lvl = np.full(sums.shape, 4, dtype=np.uint8)
    lvl[sums >= p] = 3
    lvl[sums >= np.float32(10.0) * p] = 2
    lvl[sums >= np.float32(100.0) * p] = 1
    lvl[sums >= np.float32(1000.0) * p] = 0
    return lvl


def extract_runs(sums: np.ndarray, prob_threshold: float
                 ) -> tuple:
    """Vectorised run detection over the whole batch at once.

    ``sums`` is the device-reduced [T, P] threshold-sum matrix; no per-pair
    Python loop — boundaries come from one boolean diff over the batch
    (the cumsum-over-break-flags formulation, cf. hashing/vectorized.py).

    Returns (pair, start, end, score) arrays, ordered pair-major then by
    start (the reference's emission order, HMM.cpp:1179-1357); runs at
    level 4 (below every threshold) are dropped.
    """
    T, P = sums.shape
    lvl = levels_from_sums(sums, prob_threshold)
    lv = lvl.T                                         # [P, T]
    chg = np.empty((P, T), dtype=bool)
    chg[:, 0] = True
    np.not_equal(lv[:, 1:], lv[:, :-1], out=chg[:, 1:])
    flat = np.flatnonzero(chg.reshape(-1))
    pair = flat // T
    a = flat % T
    b = np.empty_like(a)
    if len(a):
        b[:-1] = np.where(pair[1:] == pair[:-1], a[1:] - 1, T - 1)
        b[-1] = T - 1
    keep = lv[pair, a] != 4
    pair, a, b = pair[keep], a[keep], b[keep]
    # run scores via prefix sums (float64: differencing error ~1e-13 on
    # posteriors <= 1, far below the float32 data)
    cs = np.empty((T + 1, P), np.float64)
    cs[0] = 0.0
    np.cumsum(sums, axis=0, dtype=np.float64, out=cs[1:])
    score = cs[b + 1, pair] - cs[a, pair]
    return pair, a, b, score


def extract_segments(
        sums: np.ndarray,                     # [T, P] threshold sums
        prob_threshold: float,
        from_pos: int,                        # absolute start of window
        posterior: Optional[np.ndarray] = None,   # [T, K, P] if ages wanted
        age_threshold: int = 0,
        ) -> List[Segment]:
    """Extract segments for a batch window.  Positions in the output are
    absolute (``from_pos`` added)."""
    pair, a, b, score = extract_runs(sums, prob_threshold)
    want_pps = posterior is not None
    out: List[Segment] = []
    for i in range(len(pair)):
        pps = None
        if want_pps:
            pps = posterior[a[i]:b[i] + 1, :age_threshold,
                            pair[i]].sum(axis=0)
        out.append(Segment(pair=int(pair[i]), start=from_pos + int(a[i]),
                           end=from_pos + int(b[i]),
                           score_sum=float(score[i]), pps=pps))
    return out


# ---------------------------------------------------------------------------
# Device-side extraction. The level/run logic above runs in-jit and only
# boundary indices (KBs) cross the host link, instead of downloading the
# [T, P] sums matrix (tens of MB) and uploading a dense [runs, T] indicator
# (tens of MB) per batch — the host<->device link is the pipeline bottleneck
# (~40 MB/s on the remote TPU backend). Run scores and per-state posterior
# sums are then computed on device by an indicator einsum over the run
# intervals and downloaded as [runs]/[runs, K] — the reference's
# "sumOfPosteriors" accumulation (HMM.cpp:1216-1222) as one MXU contraction.
# ---------------------------------------------------------------------------

# -- pure traced building blocks (used inside the fused decode+extract jit,
# extract_packed, and by the standalone jits below) ------------------------

def _boundaries_runs_jax(th, s0, s1, prob_threshold, cap: int):
    """In-jit boundary detection + run bounds (no scores): level
    classification, two-level boundary compaction, and per-run (pair, a,
    b). Returns (idx [cap] i32, lv [cap] u8, n i32, pair, a, b [cap]
    i32); entries past ``n`` have idx == T*P and lv == 4, and if n > cap
    the results are truncated (callers must re-extract with more cap)."""
    import jax
    import jax.numpy as jnp

    T, P = th.shape
    p = jnp.float32(prob_threshold)
    lvl = (4
           - (th >= p).astype(jnp.int32)
           - (th >= jnp.float32(10.0) * p).astype(jnp.int32)
           - (th >= jnp.float32(100.0) * p).astype(jnp.int32)
           - (th >= jnp.float32(1000.0) * p).astype(jnp.int32))
    pos = jnp.arange(T, dtype=jnp.int32)
    valid = (pos >= s0) & (pos < s1)
    lvl = jnp.where(valid[:, None], lvl, 4)
    lvl_t = lvl.T                                       # [P, T]
    prev = jnp.concatenate(
        [jnp.full((P, 1), 4, lvl_t.dtype), lvl_t[:, :-1]], axis=1)
    chg = lvl_t != prev
    n = chg.sum().astype(jnp.int32)
    # two-level compaction: a flat jnp.nonzero over the [T*P] flags costs
    # ~60 ms on the chip at 8M elements (MULTI_VARIANT_PROBE.json); the
    # boundaries are sparse (~1e-4), so compact 64-element block flags
    # first, then the gathered flagged blocks. Each flagged block holds
    # >= 1 boundary, so n <= cap implies flagged-blocks <= cap and the
    # two size-capped passes are exact. Ordering (ascending flat index =
    # pair-major, position order) is preserved.
    C = 64
    nblk = (T * P) // C
    chg_b = chg.reshape(nblk, C)
    flags = chg_b.any(axis=1)
    (bidx,) = jnp.nonzero(flags, size=cap, fill_value=nblk)
    g = jnp.where((bidx < nblk)[:, None],
                  chg_b[jnp.minimum(bidx, nblk - 1)], False)  # [cap, C]
    (loc,) = jnp.nonzero(g.ravel(), size=cap, fill_value=cap * C)
    idx = jnp.where(loc < cap * C,
                    bidx[jnp.minimum(loc // C, cap - 1)] * C + loc % C,
                    T * P).astype(jnp.int32)
    lv = jnp.where(idx < T * P,
                   lvl_t.ravel()[jnp.minimum(idx, T * P - 1)], 4
                   ).astype(jnp.uint8)

    pair = idx // T                                     # == P for fill
    a = idx % T
    nxt = jnp.concatenate([idx[1:], jnp.full((1,), T * P, jnp.int32)])
    same = (nxt // T) == pair
    b = jnp.where(same, (nxt % T) - 1, s1 - 1)
    return idx, lv, n, pair, a, b


def _run_scores_jax(th, pair, a, b, n, cap: int, score_chunk: int = 256):
    """Per-run scores over [cap] run arrays: chunked HIGHEST-precision
    indicator einsum, only the chunks holding the first ``n`` runs
    computed (fill/e.g. padded entries have b < a -> score 0). Each
    output element is an independent dot over its own indicator row, so
    values do not depend on which other runs share a chunk."""
    import jax
    import jax.numpy as jnp

    T, P = th.shape
    pr = jnp.minimum(pair, P - 1)
    ar = jnp.clip(a, 0, T - 1)

    def chunk_fn(args):
        prc, arc, brc = args
        posr = jnp.arange(T, dtype=jnp.int32)
        ind = ((posr[None, :] >= arc[:, None])
               & (posr[None, :] <= brc[:, None])).astype(jnp.float32)
        th_g = th[:, prc]                               # [T, C]
        return jnp.einsum("it,ti->i", ind, th_g,
                          precision=jax.lax.Precision.HIGHEST)

    sh = (cap // score_chunk, score_chunk)
    return _bounded_chunk_loop(chunk_fn, (pr.reshape(sh), ar.reshape(sh),
                                          b.reshape(sh)),
                               (sh[0], score_chunk), n,
                               score_chunk).reshape(cap)


def extract_runs_jax(th, s0, s1, prob_threshold, cap: int,
                     score_chunk: int = 256):
    """Fully in-jit run extraction over the window [s0, s1) of ``th``
    [T, P]: level classification, boundary compaction, run bounds, and run
    scores — no host round-trip (the synchronous count check + boundary
    download of ``extract_segments_device`` cost ~0.4 s/flush on the
    remote TPU link, DISPATCH_PROBE.json).

    Returns (idx [cap] i32, lv [cap] u8, n i32, score [cap] f32,
    pair [cap] i32, a [cap] i32, b [cap] i32). Entries past ``n`` have
    idx == T*P and lv == 4 (callers mask on lv != 4); if n > cap the
    results are truncated and the caller must re-extract with more cap.

    Scores use the same chunked HIGHEST-precision indicator einsum as
    ``extract_segments_device`` (identical numerics; the reference
    accumulates in f32 too, HMM.cpp:1216-1222).
    """
    idx, lv, n, pair, a, b = _boundaries_runs_jax(th, s0, s1,
                                                  prob_threshold, cap)
    score = _run_scores_jax(th, pair, a, b, n, cap, score_chunk)
    return idx, lv, n, score, pair, a, b


def _bounded_chunk_loop(chunk_fn, args, out_shape, n, chunk: int):
    """Run ``chunk_fn`` over row-chunks of ``args`` but only for the first
    ``ceil(n / chunk)`` chunks (a ``lax.while_loop`` with a traced bound);
    the remaining output rows are zeros.  The caps grow sticky to the
    worst batch in a run (e.g. 8192) while the average batch has ~1-2k
    runs, so a full ``lax.map`` over every cap row wastes most of the
    einsum/gather work — measured 43.4 s of a 70.1 s wall in the 98k
    ages-on `segments` phase (BIOBANK_PROBE.json e2e_98304_r4_fast_ages).
    Rows < n are computed by the same chunk_fn calls in the same order as
    the old full map, so used outputs are bitwise identical."""
    import jax
    import jax.numpy as jnp

    needed = (n + chunk - 1) // chunk

    def body(carry):
        i, out = carry
        res = chunk_fn(tuple(jax.lax.dynamic_index_in_dim(x, i, 0,
                                                          keepdims=False)
                             for x in args))
        return i + 1, jax.lax.dynamic_update_index_in_dim(out, res, i, 0)

    _, out = jax.lax.while_loop(
        lambda c: c[0] < needed, body,
        (jnp.int32(0), jnp.zeros(out_shape, jnp.float32)))
    return out


def run_pps_jax(post, pair, a, b, pps_cap: int, chunk: int = 256, n=None):
    """Per-run per-state posterior sums [pps_cap, K], in-jit (mirrors
    ``run_pps``). Only the first ``pps_cap`` runs are covered — overflow
    is detected by the caller via the run count. The run arrays may be
    shorter or longer than ``pps_cap`` (they come from a separately-sized
    extraction cap): shorter inputs are padded with empty runs (b < a,
    all-zero rows), longer ones sliced. With ``n`` (traced run count)
    only the chunks holding the first n runs are computed (the rest are
    zeros, exactly what the empty-run rows produce anyway)."""
    import jax
    import jax.numpy as jnp

    T, K = post.shape[0], post.shape[1]
    P = post.shape[2]
    n_in = pair.shape[0]
    if n_in < pps_cap:
        pad = pps_cap - n_in
        pair = jnp.concatenate([pair, jnp.full((pad,), P, pair.dtype)])
        a = jnp.concatenate([a, jnp.zeros((pad,), a.dtype)])
        b = jnp.concatenate([b, jnp.full((pad,), -1, b.dtype)])
    pr = jnp.minimum(pair[:pps_cap], P - 1)
    ar = jnp.clip(a[:pps_cap], 0, T - 1)
    br = b[:pps_cap]

    def chunk_fn(args):
        prc, arc, brc = args
        posr = jnp.arange(T, dtype=jnp.int32)
        ind = ((posr[None, :] >= arc[:, None])
               & (posr[None, :] <= brc[:, None])).astype(jnp.float32)
        post_g = jnp.take(post, prc, axis=2)            # [T, K, C]
        return jnp.einsum("it,tki->ik", ind, post_g,
                          precision=jax.lax.Precision.HIGHEST)

    sh = (pps_cap // chunk, chunk)
    args = (pr.reshape(sh), ar.reshape(sh), br.reshape(sh))
    if n is None:
        out = jax.lax.map(chunk_fn, args)
    else:
        out = _bounded_chunk_loop(chunk_fn, args, (sh[0], chunk, K),
                                  jnp.minimum(n, pps_cap), chunk)
    return out.reshape(pps_cap, K)


def run_ages_jax(pps, expected_times, initial_state_prob,
                 age_threshold: int):
    """Per-run posterior-mean and MAP ages from [N, K] posterior-state
    sums, in-jit (device mirrors of :func:`posterior_mean_from_pps` /
    :func:`map_from_pps`, HMM.cpp:1087-1107). Returns [2, N] f32 (mean
    row, MAP row) — ~70x fewer download bytes than the pps rows on a
    bandwidth-limited host link."""
    import jax.numpy as jnp

    ppa = pps[:, :age_threshold]
    s = ppa.sum(axis=1)
    norm = jnp.float32(1.0) / s
    pm = (norm[:, None] * ppa
          * expected_times[None, :age_threshold]).sum(axis=1)
    ratio = ppa / initial_state_prob[None, :age_threshold]
    mp = expected_times[jnp.argmax(ratio, axis=1)]
    return jnp.stack([pm, mp])


def _extract_packed_impl(th, s0, s1, p, cap: int, posterior, pps_cap: int,
                         kcap: int = 0):
    """``cap`` bounds the RAW boundary pass (every level change, sticky
    on the worst flush exactly like round 4); ``kcap`` (default ``cap``)
    bounds the KEPT (lv != 4) output rows — typically ~20-40% of the
    boundaries on biobank panels, so the downloaded row and the
    score/pps einsums shrink accordingly while the boundary-compaction
    nonzero sizes stay raw-count-driven (growing them 4x for headroom
    measurably slowed the extraction program on chip)."""
    import jax
    import jax.numpy as jnp

    T, P = th.shape
    kcap = kcap or cap
    idx, lv, n_raw, pair, a, b = _boundaries_runs_jax(th, s0, s1, p, cap)
    # kept-run compaction: discarded (lv == 4) runs exist only to delimit
    # the kept runs' ends, and b is already computed above — so only the
    # kept runs are scored, pps-reduced and downloaded. Fill entries past
    # n_raw have lv == 4, so the mask needs no explicit n_raw guard.
    keep = lv != jnp.uint8(4)
    n_kept = keep.sum().astype(jnp.int32)
    (kidx,) = jnp.nonzero(keep, size=kcap, fill_value=cap)
    valid = kidx < cap
    sel = jnp.minimum(kidx, cap - 1)
    kstart = jnp.where(valid, idx[sel], T * P).astype(jnp.int32)
    kpair = jnp.where(valid, pair[sel], P).astype(jnp.int32)
    ka = jnp.where(valid, a[sel], 0).astype(jnp.int32)
    kb = jnp.where(valid, b[sel], -1).astype(jnp.int32)
    score = _run_scores_jax(th, kpair, ka, kb, n_kept, kcap)
    # pack everything the drain needs into ONE i32 row so the host
    # downloads a whole flush group in a single transfer (each device_get
    # leaf costs a ~40+ ms round-trip on the remote link):
    # [start (pair*T + a), b (inclusive, window-relative), bitcast(score),
    # n_kept, n_raw] — length 3*kcap + 2. Requires T*P < 2**28 (fill
    # sentinel headroom).
    packed = jnp.concatenate([
        kstart, kb,
        jax.lax.bitcast_convert_type(score, jnp.int32),
        n_kept[None], n_raw[None]])
    if posterior is None:
        return packed, None
    return packed, run_pps_jax(posterior, kpair, ka, kb, pps_cap,
                               n=n_kept)


_packed_jit = None


def extract_packed(th, s0, s1, prob_threshold, cap: int,
                   posterior=None, pps_cap: int = 0, kcap: int = 0):
    """One async dispatch: in-jit run extraction on a device-resident
    ``th`` [T, P], KEPT runs packed into a single i32 row ([3*kcap+2]:
    start, end, bitcast scores, n_kept, n_raw — unpack with
    :func:`unpack_extract_rows`). ``cap`` bounds the raw boundary pass,
    ``kcap`` (default ``cap``) the kept output rows. With ``posterior``,
    also returns the per-KEPT-run posterior-state sums [pps_cap,
    K(padded)] (rows past the kept count are garbage; callers gather
    only valid rows).

    This is the device half of the pipeline's grouped validation flow:
    nothing is downloaded here — callers stack the group's rows
    (:func:`stack_rows`), start ``copy_to_host_async``, and drain later.
    """
    global _packed_jit
    import functools

    import jax
    import jax.numpy as jnp

    T, P = th.shape
    if T * P >= 1 << 28:
        raise ValueError(f"T*P = {T * P} >= 2**28 overflows the packed "
                         "boundary encoding")
    kcap = kcap or cap
    if cap <= 0 or cap % 256 or kcap % 256 or kcap > cap:
        raise ValueError(f"cap={cap}/kcap={kcap} must be positive "
                         "multiples of 256 with kcap <= cap "
                         "(score-chunk reshape)")
    if posterior is not None and (pps_cap <= 0 or pps_cap % 256):
        raise ValueError(f"pps_cap={pps_cap} must be a positive multiple "
                         "of 256 (pps-chunk reshape)")
    # at most ``kcap`` kept runs can be emitted, so pps rows beyond kcap
    # are unreachable; clamping keeps the caps independently sized without
    # the run arrays (length kcap) ever underfilling the pps reshape
    pps_cap = min(pps_cap, kcap)
    if _packed_jit is None:
        _packed_jit = jax.jit(_extract_packed_impl,
                              static_argnums=(4, 6, 7))
    return _packed_jit(th, jnp.asarray(s0, jnp.int32),
                       jnp.asarray(s1, jnp.int32),
                       jnp.asarray(prob_threshold, jnp.float32),
                       int(cap), posterior, int(pps_cap), int(kcap))


_mask_jit = None


def mask_window(th, w0, w1):
    """Per-column window mask: th [T, P] with -1 outside each column's
    [w0_p, w1_p) window. Sites outside the window fall below every level
    threshold, so run extraction clips to the candidate's own window —
    the per-candidate scan semantics (config.permissive_window=False)
    with no change to the extraction machinery."""
    global _mask_jit
    import jax
    import jax.numpy as jnp
    if _mask_jit is None:
        def f(th, w0, w1):
            pos = jnp.arange(th.shape[0], dtype=jnp.int32)
            m = ((pos[:, None] >= w0[None, :])
                 & (pos[:, None] < w1[None, :]))
            return jnp.where(m, th, jnp.float32(-1.0))
        _mask_jit = jax.jit(f)
    return _mask_jit(th, jnp.asarray(w0, jnp.int32),
                     jnp.asarray(w1, jnp.int32))


_stack_jit = None


def stack_rows(rows):
    """jnp.stack as one dispatch (collect a flush group's packed rows or
    pps matrices into a single download-friendly array)."""
    global _stack_jit
    import jax
    if _stack_jit is None:
        import jax.numpy as jnp
        _stack_jit = jax.jit(lambda xs: jnp.stack(xs))
    return _stack_jit(tuple(rows))


def unpack_extract_rows(packed_row: np.ndarray, kcap: int):
    """Host-side unpack of one :func:`extract_packed` row ([3*kcap+2]
    i32): returns (start [kcap] i32 (pair*T + a), b [kcap] i32
    (inclusive run end, window-relative), score [kcap] f32, n_kept int,
    n_raw int). ``n_kept > kcap`` means the kept output rows truncated;
    ``n_raw`` exceeding the RAW cap the row was extracted with means the
    boundary pass truncated (which corrupts run ends) — the caller must
    redo at grown caps in either case."""
    start = packed_row[:kcap]
    b = packed_row[kcap:2 * kcap]
    score = packed_row[2 * kcap:3 * kcap].view(np.float32)
    return (start, b, score, int(packed_row[3 * kcap]),
            int(packed_row[3 * kcap + 1]))


def merge_packed_shards(mat: np.ndarray, T: int, P_local: int):
    """Merge the per-shard packed rows of a mesh-sharded fused extraction
    (``ShardedDecoder.decode_extract_packed``): ``mat`` [S, 3*kcap+2] i32.

    Shard ``s`` holds local pair indices over its slice of the pair axis;
    offsetting its flat run starts by ``s * P_local * T`` and
    concatenating in shard order yields exactly the meshless extraction's
    pair-major ascending kept-run stream (shards partition the pair axis
    contiguously and in order). Returns (start int64 [n], b [n], score
    [n], ns_kept, ns_raw) with per-shard counts — ``ns_kept[s] > kcap``
    (or ``ns_raw[s]`` over the raw cap) means that shard's row was
    truncated and the batch must be redone at larger caps; ``ns_kept``
    sizes the shard's valid age rows."""
    S = mat.shape[0]
    kcap = (mat.shape[1] - 2) // 3
    parts = []
    ns_kept, ns_raw = [], []
    for s in range(S):
        start, b, score, nk, nr = unpack_extract_rows(mat[s], kcap)
        ns_kept.append(nk)
        ns_raw.append(nr)
        k = min(nk, kcap)
        parts.append((start[:k].astype(np.int64) + s * P_local * T,
                      b[:k], score[:k]))
    return (np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]), ns_kept, ns_raw)


def runs_from_packed(start: np.ndarray, b: np.ndarray,
                     score: np.ndarray, T: int):
    """Array-only run columns from an unpacked (already kept-only,
    already count-sliced) extraction row: returns (pair, a, b, score)
    with positions window-relative. Run ends come from the device
    (computed against the FULL boundary stream before discarded runs
    were compacted away)."""
    return start // T, start % T, b, score


def segments_from_runs(idx: np.ndarray, lv: np.ndarray, score: np.ndarray,
                       n: int, T: int, s1: int, from_pos: int,
                       pps: Optional[np.ndarray] = None,
                       age_threshold: int = 0) -> List[Segment]:
    """Host-side finish for downloaded ``extract_runs_jax`` results: drop
    level-4 boundaries and build :class:`Segment` records (positions made
    absolute with ``from_pos``)."""
    idx = idx[:n]
    lv = lv[:n]
    score = score[:n]
    pair = idx // T
    a = idx % T
    b = np.empty_like(a)
    if n:
        b[:-1] = np.where(pair[1:] == pair[:-1], a[1:] - 1, s1 - 1)
        b[-1] = s1 - 1
    out: List[Segment] = []
    for i in range(n):
        if lv[i] == 4:
            continue
        pps_i = None
        if pps is not None:
            pps_i = pps[i, :age_threshold]
        out.append(Segment(
            pair=int(pair[i]), start=from_pos + int(a[i]),
            end=from_pos + int(b[i]), score_sum=float(score[i]),
            pps=pps_i))
    return out


_jit_cache: dict = {}


def _get_jit(name: str):
    """Lazily build the jitted device helpers (keeps jax an optional import
    for pure-host users of this module)."""
    if name in _jit_cache:
        return _jit_cache[name]
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(4,))
    def boundaries(th, s0, s1, p, cap):
        """th [T, P] f32 -> (flat boundary idx [cap] i32 over the [P, T]
        row-major layout, level at each boundary [cap] u8, count)."""
        T, P = th.shape
        p = jnp.float32(p)
        lvl = (4
               - (th >= p).astype(jnp.int32)
               - (th >= jnp.float32(10.0) * p).astype(jnp.int32)
               - (th >= jnp.float32(100.0) * p).astype(jnp.int32)
               - (th >= jnp.float32(1000.0) * p).astype(jnp.int32))
        pos = jnp.arange(T, dtype=jnp.int32)
        valid = (pos >= s0) & (pos < s1)
        lvl = jnp.where(valid[:, None], lvl, 4)
        lvl_t = lvl.T                                       # [P, T]
        prev = jnp.concatenate(
            [jnp.full((P, 1), 4, lvl_t.dtype), lvl_t[:, :-1]], axis=1)
        chg = lvl_t != prev
        n = chg.sum()
        (idx,) = jnp.nonzero(chg.ravel(), size=cap, fill_value=T * P)
        idx = idx.astype(jnp.int32)
        lv = jnp.where(idx < T * P,
                       lvl_t.ravel()[jnp.minimum(idx, T * P - 1)], 4)
        return idx, lv.astype(jnp.uint8), n.astype(jnp.int32)

    def _indicator(a, b, T):
        pos = jnp.arange(T, dtype=jnp.int32)
        return ((pos[None, :] >= a[:, None])
                & (pos[None, :] <= b[:, None])).astype(jnp.float32)

    @functools.partial(jax.jit, static_argnums=(4,))
    def run_scores(th, pair, a, b, chunk):
        """Sum of th over [a_i, b_i] in column pair_i, per run (f32,
        HIGHEST-precision contraction). One dispatch: chunked internally
        with lax.map so the gathered columns stay small."""
        T = th.shape[0]

        def chunk_fn(args):
            pr, ar, br = args
            ind = _indicator(ar, br, T)                     # [C, T]
            th_g = th[:, pr]                                # [T, C]
            return jnp.einsum("it,ti->i", ind, th_g,
                              precision=jax.lax.Precision.HIGHEST)

        n = pair.shape[0]
        sh = (n // chunk, chunk)
        out = jax.lax.map(chunk_fn, (pair.reshape(sh), a.reshape(sh),
                                     b.reshape(sh)))
        return out.reshape(n)

    @functools.partial(jax.jit, static_argnums=(4,))
    def run_pps(post, pair, a, b, chunk):
        """Per-state posterior sums over each run: [N, K]. Chunked with
        lax.map so the [T, K, chunk] gathered posterior stays a few
        hundred MB; single dispatch + single download."""
        T, K = post.shape[0], post.shape[1]

        def chunk_fn(args):
            pr, ar, br = args
            ind = _indicator(ar, br, T)                     # [C, T]
            post_g = jnp.take(post, pr, axis=2)             # [T, K, C]
            return jnp.einsum("it,tki->ik", ind, post_g,
                              precision=jax.lax.Precision.HIGHEST)

        n = pair.shape[0]
        sh = (n // chunk, chunk)
        out = jax.lax.map(chunk_fn, (pair.reshape(sh), a.reshape(sh),
                                     b.reshape(sh)))
        return out.reshape(n, K)

    _jit_cache.update(boundaries=boundaries, run_scores=run_scores,
                      run_pps=run_pps)
    return _jit_cache[name]


def extract_segments_device(
        th,                                   # [T, P] device threshold sums
        posterior,                            # [T, K, P] device or None
        prob_threshold: float,
        s0: int, s1: int,                     # window within [0, T)
        from_pos: int,                        # absolute position of index 0
        age_threshold: int = 0,
        cap: int = 16384,
        pps_chunk: int = 256,
        ) -> Tuple[List[Segment], int]:
    """Device-side mirror of :func:`extract_segments` on the decode window
    ``[s0, s1)``. Returns (segments, grown_cap) — callers should carry the
    returned cap forward so a batch-heavy run compiles the boundary kernel
    for at most a few cap buckets.

    Scores/pps are f32 HIGHEST contractions (the reference accumulates
    these in f32 too, HMM.cpp:1216-1222); the host path's f64 differencing
    agrees to ~1e-7 relative.
    """
    import os
    import time

    import jax.numpy as jnp

    dbg = os.environ.get("FASTSMC_SEG_DEBUG")
    t_start = time.time()
    T, P = th.shape
    boundaries = _get_jit("boundaries")
    while True:
        cap_eff = min(cap, T * P)
        idx, lv, n = boundaries(th, jnp.asarray(s0, jnp.int32),
                                jnp.asarray(s1, jnp.int32),
                                float(prob_threshold), cap_eff)
        n = int(n)
        if n <= cap_eff or cap_eff == T * P:
            break
        # the first dispatch already told us the true count — jump straight
        # to the power-of-two bucket that fits it (at most ONE re-dispatch,
        # and caps stay bucketed so compiles stay log-many)
        while cap < n:
            cap *= 2
    idx = np.asarray(idx)[:n]
    lv = np.asarray(lv)[:n]
    t_bounds = time.time()

    pair = idx // T
    a = idx % T
    b = np.empty_like(a)
    if n:
        b[:-1] = np.where(pair[1:] == pair[:-1], a[1:] - 1, s1 - 1)
        b[-1] = s1 - 1
    keep = lv != 4
    pair, a, b = pair[keep], a[keep], b[keep]
    n_runs = len(pair)
    if n_runs == 0:
        return [], cap

    run_scores = _get_jit("run_scores")
    run_pps = _get_jit("run_pps")
    # pad the run list to a power-of-two chunk multiple (log-many shapes
    # -> log-many compiles); scores + pps go out in single dispatches and
    # one download each
    n_pad = pps_chunk
    while n_pad < n_runs:
        n_pad *= 2
    fill = n_pad - n_runs
    pr = np.concatenate([pair, np.zeros(fill, pair.dtype)])
    ar = np.concatenate([a, np.zeros(fill, a.dtype)])
    br = np.concatenate([b, np.full(fill, -1, b.dtype)])
    pr, ar, br = (jnp.asarray(x, jnp.int32) for x in (pr, ar, br))
    score_dev = run_scores(th, pr, ar, br, pps_chunk)
    pps_dev = run_pps(posterior, pr, ar, br, pps_chunk) \
        if posterior is not None else None
    t_disp = time.time()
    score = np.asarray(score_dev)[:n_runs]
    pps = np.asarray(pps_dev)[:n_runs] if pps_dev is not None else None
    if dbg:
        print(f"[segdev] n={n} runs={n_runs} pad={n_pad} "
              f"bounds {t_bounds - t_start:.3f}s host+disp "
              f"{t_disp - t_bounds:.3f}s download "
              f"{time.time() - t_disp:.3f}s", flush=True)

    out: List[Segment] = []
    for i in range(n_runs):
        out.append(Segment(
            pair=int(pair[i]), start=from_pos + int(a[i]),
            end=from_pos + int(b[i]), score_sum=float(score[i]),
            pps=pps[i, :age_threshold] if pps is not None else None))
    return out, cap


def posterior_mean_from_pps(pps: np.ndarray, expected_times: np.ndarray
                            ) -> float:
    """HMM::getPosteriorMean (HMM.cpp:1087-1097)."""
    norm = 1.0 / float(np.float32(pps.sum()))
    return float(np.float32(np.sum(
        np.float32(norm) * pps * expected_times[:len(pps)])))


def map_from_pps(pps: np.ndarray, initial_state_prob: np.ndarray,
                 expected_times: np.ndarray) -> float:
    """HMM::getMAP (HMM.cpp:1099-1107)."""
    ratio = pps / initial_state_prob[:len(pps)]
    return float(expected_times[int(np.argmax(ratio))])


def posterior_mean_from_pps_block(pps: np.ndarray,
                                  expected_times: np.ndarray) -> np.ndarray:
    """Vectorised :func:`posterior_mean_from_pps` over [N, Ka] rows —
    bit-identical per row (same f32 rounding points; numpy's pairwise
    reduction order matches for the small per-row K)."""
    s = pps.sum(axis=1)                                   # f32 per row
    norm = (1.0 / s.astype(np.float64)).astype(np.float32)  # f64 div, f32
    return (norm[:, None] * pps
            * expected_times[None, :pps.shape[1]]).sum(axis=1)


def map_from_pps_block(pps: np.ndarray, initial_state_prob: np.ndarray,
                       expected_times: np.ndarray) -> np.ndarray:
    """Vectorised :func:`map_from_pps` over [N, Ka] rows."""
    ratio = pps / initial_state_prob[None, :pps.shape[1]]
    return expected_times[np.argmax(ratio, axis=1)]
