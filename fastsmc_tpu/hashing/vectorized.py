"""Sort-based TPU formulation of the GERMLINE2 identification scan.

The reference identification stage (ASMC_SRC/SRC/FastSMC.cpp:144-227,
HASHING/SeedHash.hpp, HASHING/ExtendHash.hpp) is a streaming, dict-based
state machine: per 64-SNP word, haplotypes are bucketed by word value,
colliding pairs extend per-pair matches, and matches not extended within
``gap`` words flush to the HMM.  Pointer-chasing dictionaries do not map to
a TPU; this module reformulates the scan as data-parallel array ops:

  1. **Bucketing by sorting** — per word, a stable double-argsort of the
     (hi, lo) u32 halves of the word value groups equal words; bucket sizes
     and boundaries come from adjacent equality of the sorted keys.
  2. **Closed-form pair enumeration** — colliding pairs are enumerated into
     a fixed-capacity event buffer: a cumulative-pair-count array over
     (word, bucket) plus searchsorted + a triangular-index decode maps every
     flat slot to its (word, hap1, hap2) collision, entirely vectorized.
  3. **Run detection instead of a match dictionary** — events are sorted by
     (pair, word); a match is a maximal run of per-pair collision words
     whose gaps survive the reference flush rule.  With sub-hashing off
     (``max_seeds == 0``, the FastSMC default profile) the survival test
     between consecutive collisions is history-free, so runs fall out of a
     cumsum over break flags — no sequential state machine.

Flush-rule equivalence (including ``skip`` low-complexity words): a skip
word w forces every active match's end to w (ExtendHash::extendAllPairsTo,
FastSMC.cpp:212-219) and performs no flush; a normal word w flushes matches
with w1 < w - gap *after* extending this word's collisions.  Hence for
consecutive collisions of one pair at words wa < wb the match survives iff
wb <= D(e, wa) — the collision at the death word itself rescues the match —
where the death word D is computed from per-word tables (next non-skip word
N, next skip word U, the skip-chain death Dskip, last skip word LS) derived
once per chunk from the skip flags; see :func:`_death_tables`.

Genome chunking: words are processed in chunks; matches still alive at a
chunk boundary carry over as synthetic events (pair, w_evt = chunk_start-1,
ext = current match end, original w0), so results are independent of chunk
size; event-buffer capacity grows by powers of two on overflow.

Scope: exact pair/segment parity with the host/native scans (including
``gap``, ``skip``, MAF filtering, haploid/diploid folding, triangular job
windows, and ``max_seeds > 0`` recursive sub-hashing; validated in
tests/test_hashing_vectorized.py).

Sub-hashing (SeedHash.hpp:56-93) runs level by level: buckets larger than
``max_seeds`` whose read-ahead horizon allows it (``w + d + 1 <
min(total_words, w + const_read_ahead)``) are re-keyed on the next word by
a second stable sort pass over the affected rows; buckets at the horizon
enumerate all their pairs (the reference's "seed not analyzed" branch is
dead code — its condition is subsumed by the outer recursion guard).  A
sub-hash collision at depth d extends the match end to ``w + d`` while the
match still *starts* at the current word (ExtendHash.hpp:75-81), so run
detection tracks a running end M per match: ``M_b = max(ext_b, u)`` where
u is the last skip word since the previous collision (skip words OVERWRITE
every active end, ExtendHash::extendAllPairsTo) or ``max(ext_b, M_a)``
with no intervening skip.  M is computed by a monotone fixpoint (link
flags -> segmented cummax of ext over (run, skip-epoch) segments -> link
flags) that converges to the exact sequential semantics; with
``max_seeds == 0`` it converges in one pass because M == ext == word.

When to use which (scripts/hashing_scale_probe.py, BIOBANK_PROBE.json
``device_scan_onchip_r4``): the native C++ host scan is the production
path and is ~175x faster on real hardware (1.6 s vs 282.6 s at 16k haps)
— GERMLINE2 is linear and cache-friendly, while the device formulation
pays per-word sorts and XLA dispatch overheads that no plausible tuning
closes. This module is therefore a PARITY/PORTABILITY artifact, not a
performance path: it proves the GERMLINE2 semantics are expressible as
pure XLA (useful where no host toolchain exists) and serves as a second
independent implementation for set-parity testing. It is NOT the
"TPU-scalable version" — identification is host-bound by design, and the
producer-thread overlap (germline.py) hides its cost behind validation.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .germline import HashingScan, cm_between

BIG = 2 ** 30


# ---------------------------------------------------------------------------
# host-side per-chunk tables from skip flags
# ---------------------------------------------------------------------------

def _death_tables(skip: np.ndarray, lo: int, gap: int):
    """Tables over word x in [lo, lo + m) where m = len(skip) + 1; index 0
    is the synthetic pre-chunk word lo (= chunk_start - 1, flag irrelevant:
    lookups only ever read indices > 0) and index i >= 1 covers word lo + i
    with skip flag skip[i-1].  Words beyond the chunk are unknown: BIG.

    N[i]   : first non-skip word >= lo + i (BIG if none known)
    U[i]   : first skip word >= lo + i (BIG if none known)
    LS[i]  : last skip word <= lo + i (-1 if none in range)
    Dsk[i] : death word of a match whose end was forced to the skip word
             lo + i (BIG-filled at non-skip words / unknown)
    """
    m = len(skip) + 1
    flags = np.zeros(m, bool)
    flags[1:] = skip
    N = np.full(m + 1, BIG, np.int64)
    U = np.full(m + 1, BIG, np.int64)
    Dsk = np.full(m, BIG, np.int64)
    LS = np.full(m, -1, np.int64)
    for i in range(m - 1, -1, -1):
        N[i] = (lo + i) if not flags[i] else N[i + 1]
        U[i] = (lo + i) if flags[i] else U[i + 1]

    def first_nonskip_gt(x):        # first non-skip word > x
        j = x - lo + 1
        if j < 0:
            j = 0
        return N[j] if j <= m else BIG

    for i in range(m - 1, 0, -1):
        if not flags[i]:
            continue
        u = lo + i
        vstar = first_nonskip_gt(u + gap)
        unext = U[i + 1] if i + 1 <= m else BIG
        Dsk[i] = Dsk[unext - lo] if unext < vstar else vstar

    last = -1
    for i in range(m):
        if flags[i]:
            last = lo + i
        LS[i] = last
    return N[:m], U[:m], LS, Dsk


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------

def _sort_word(hi_col, lo_col):
    """Stable grouping order for one word column; newbkt[i] marks sorted
    position i starting a new bucket of equal word values."""
    o1 = jnp.argsort(lo_col, stable=True)
    o2 = jnp.argsort(hi_col[o1], stable=True)
    order = o1[o2]
    shi = hi_col[order]
    slo = lo_col[order]
    same = (shi[1:] == shi[:-1]) & (slo[1:] == slo[:-1])
    newbkt = jnp.concatenate([jnp.ones(1, bool), ~same])
    return order, newbkt


@jax.jit
def _bucketize(hi, lo):
    """[H, Wc] word halves -> per-word sort order, bucket boundaries, and
    distinct-seed counts."""
    order, newbkt = jax.vmap(_sort_word, in_axes=(1, 1), out_axes=0)(hi, lo)
    seeds = jnp.sum(newbkt, axis=1)
    return order, newbkt, seeds


def _tri_decode(r):
    """Flat triangular index r -> (a, b), a < b, with r = b(b-1)/2 + a."""
    rf = r.astype(jnp.float32)
    b = jnp.floor((1.0 + jnp.sqrt(1.0 + 8.0 * rf)) / 2.0).astype(r.dtype)
    # float sqrt can be off by one: correct both directions
    b = jnp.where(r < b * (b - 1) // 2, b - 1, b)
    b = jnp.where(r >= b * (b + 1) // 2, b + 1, b)
    a = r - b * (b - 1) // 2
    return a, b


def _bucket_sizes(newbkt):
    """[Wc, H] bucket-start flags -> (bucket id per position, bucket size
    per position)."""
    Wc, H = newbkt.shape
    bid = jnp.cumsum(newbkt.astype(jnp.int32), axis=1) - 1     # [Wc, H]
    sizes = jax.vmap(
        lambda s: jax.ops.segment_sum(jnp.ones(H, jnp.int32), s,
                                      num_segments=H))(bid)
    return bid, jnp.take_along_axis(sizes, bid, axis=1)


@jax.jit
def _level_masks(newbkt, base_ok, horizon, max_seeds):
    """Per-level bucket dispositions (SeedHash.hpp:84-99).

    newbkt [Wc, H]: bucket-start flags; base_ok [Wc, H]: position eligible
    (level 0: word not low-complexity-skipped; level >= 1: row belongs to a
    carried bucket); horizon [Wc]: the read-ahead buffer holds the next
    word (w + d + 1 < min(total_words, w + const_read_ahead)).

    Returns (emit [Wc, H] at bucket starts, carried_here [Wc, H] per
    position, group [Wc, H] for the next level: dense bucket id on carried
    rows, unique negatives elsewhere, any_carry scalar).
    """
    Wc, H = newbkt.shape
    bid, size_here = _bucket_sizes(newbkt)
    oversized = (max_seeds > 0) & (size_here > max_seeds)
    start_ok = newbkt & base_ok
    carry_start = start_ok & oversized & horizon[:, None]
    emit = start_ok & ~(oversized & horizon[:, None])
    # broadcast the bucket-start carry flag to every member position
    carried_per_bucket = jax.vmap(
        lambda c, s: jax.ops.segment_max(c.astype(jnp.int32), s,
                                         num_segments=H))(carry_start, bid)
    carried_here = jnp.take_along_axis(carried_per_bucket, bid,
                                       axis=1).astype(bool)
    pos = jnp.arange(H, dtype=jnp.int32)[None, :]
    group = jnp.where(carried_here, bid, -1 - pos)
    return emit, carried_here, group, carry_start.any()


@jax.jit
def _subhash_level(order, group, hi_next, lo_next):
    """One sub-hash recursion level (SeedHash::subHash): re-key carried
    buckets on the next word with a stable LSD sort by (parent bucket,
    word value); rows with group < 0 keep unique singleton buckets.

    order/group [Wc, H] in the previous level's sorted layout; hi_next/
    lo_next [H, Wc] are the halves of each row's word at w + d.
    Returns (order', newbkt', group_sorted').
    """

    def one_word(o, g, hi_col, lo_col):
        khi = hi_col[o]
        klo = lo_col[o]
        p1 = jnp.argsort(klo, stable=True)
        p2 = p1[jnp.argsort(khi[p1], stable=True)]
        perm = p2[jnp.argsort(g[p2], stable=True)]
        og = g[perm]
        ohi = khi[perm]
        olo = klo[perm]
        same = ((og[1:] == og[:-1]) & (ohi[1:] == ohi[:-1])
                & (olo[1:] == olo[:-1]))
        newbkt = jnp.concatenate([jnp.ones(1, bool), ~same])
        return o[perm], newbkt, og

    return jax.vmap(one_word, in_axes=(0, 0, 1, 1))(order, group,
                                                    hi_next, lo_next)


@functools.partial(jax.jit,
                   static_argnames=("cap", "haploid", "window"))
def _enumerate_events(order, newbkt, emit, id_num, w0c, cap: int,
                      haploid: bool, window):
    """Collision events for one chunk level.

    order/newbkt: [Wc, H] sorted layout; emit: [Wc, H] bucket-start flags
    of buckets whose pairs enumerate at this level.
    Returns (ki, kj, w_evt, total): folded pair keys ki <= kj with invalid
    slots marked BIG; ``total`` is the true event count (may exceed cap, in
    which case the host grows the buffer and retries).
    """
    Wc, H = order.shape

    _, size_here = _bucket_sizes(newbkt)
    cnt = jnp.where(emit, size_here * (size_here - 1) // 2, 0)
    cum = jnp.cumsum(cnt.reshape(-1))                          # [Wc*H] int32
    total = cum[-1]

    t = jnp.arange(cap, dtype=jnp.int32)
    p = jnp.searchsorted(cum, t, side="right")
    p_c = jnp.minimum(p, Wc * H - 1)
    base = jnp.where(p_c > 0, cum[jnp.maximum(p_c - 1, 0)], 0)
    r = t - base
    word = (p_c // H).astype(jnp.int32)
    start = p_c % H
    a, b = _tri_decode(jnp.maximum(r, 0))
    h1 = order[word, jnp.minimum(start + a, H - 1)]
    h2 = order[word, jnp.minimum(start + b, H - 1)]
    valid = t < total

    ind_i = jnp.maximum(h1, h2).astype(jnp.int32)
    ind_j = jnp.minimum(h1, h2).astype(jnp.int32)

    if window is not None:
        # triangular job-window pair filter (SeedHash.hpp:103-129)
        (ws, w_i, w_j, job_ind, jobs, above) = window
        id_i = id_num[ind_i]
        id_j = id_num[ind_j]
        diag = (w_j - 1) * ws + (id_i - (w_i - 1) * ws)
        if job_ind == jobs:
            ok = ((id_i >= (w_i - 1) * ws) & (id_j >= (w_j - 1) * ws)
                  & (id_j < diag))
        else:
            inside = ((id_i >= (w_i - 1) * ws) & (id_i < w_i * ws)
                      & (id_j >= (w_j - 1) * ws) & (id_j < w_j * ws))
            ok = inside & ((id_j < diag) if above else (id_j >= diag))
        valid = valid & ok

    if not haploid:
        # diploid folding (ExtendHash.hpp:52-70 via _pair_to_location)
        ind_i = ind_i - (ind_i % 2)
        ind_j = ind_j - (ind_j % 2)

    ki = jnp.where(valid, ind_j, BIG)
    kj = jnp.where(valid, ind_i, BIG)
    w_evt = jnp.where(valid, w0c + word, BIG)
    return ki, kj, w_evt, total


@jax.jit
def _detect_runs(ki, kj, w_evt, ext, w0s, N, U, LS, Dsk, EC,
                 tab_lo, chunk_end, gap):
    """Sort events by (pair, word) and aggregate into match runs.

    Event fields [E] int32 (ki = BIG marks invalid).  Real collisions have
    w0s = w_evt and ext = w_evt + subhash_depth (>= w_evt); carried
    synthetic events have w_evt = chunk_start-1, ext = carried match end,
    w0s = original w0.  Tables are indexed by (word - tab_lo); EC counts
    skip words <= each table word; chunk_end is the first word of the
    next chunk.

    The running match end M (module docstring) is solved by a monotone
    fixpoint: init M = ext (a lower bound), then alternate (a) link flags
    from M via the death rule, (b) M from the link segmentation via a
    segmented cummax of ext over (run, skip-epoch) segments plus the
    last-skip overwrite term.  Both maps are monotone and the system is
    causal in event order, so chaotic iteration from below converges to
    the unique sequential solution; iteration count is bounded by the
    events of one pair inside a read_ahead+gap window (1 extra pass when
    max_seeds == 0).
    """
    E = ki.shape[0]
    o = jnp.argsort(w_evt, stable=True)
    o = o[jnp.argsort(kj[o], stable=True)]
    o = o[jnp.argsort(ki[o], stable=True)]
    ki, kj, w_evt, ext, w0s = ki[o], kj[o], w_evt[o], ext[o], w0s[o]
    valid = ki < BIG

    m = N.shape[0]

    def tab(T, x, default):
        i = jnp.clip(x - tab_lo, 0, m - 1)
        in_range = (x >= tab_lo) & (x - tab_lo < m)
        return jnp.where(in_range, T[i], default)

    def death(e, wa):
        # first flush word killing a match with end e, last collision at wa
        vstar = tab(N, jnp.maximum(wa, e + gap) + 1, BIG)
        unext = tab(U, wa + 1, BIG)
        dsk = tab(Dsk, jnp.minimum(unext, tab_lo + m - 1), BIG)
        dsk = jnp.where(unext < BIG, dsk, BIG)
        return jnp.where(unext < vstar, dsk, vstar)

    same = (ki[1:] == ki[:-1]) & (kj[1:] == kj[:-1]) & valid[1:] & valid[:-1]
    epoch = tab(EC, w_evt, 0)                        # skips <= w_evt
    u_last = tab(LS, w_evt, -1)                      # last skip < w_evt

    def links_from_m(M):
        return same & (w_evt[1:] <= death(M[:-1], w_evt[:-1]))

    def seg_scan(vals, starts, combine_val):
        # segmented scan: starts reset the carry
        def op(a, b):
            va, sa = a
            vb, sb = b
            return jnp.where(sb, vb, combine_val(va, vb)), sa | sb
        out, _ = jax.lax.associative_scan(op, (vals, starts))
        return out

    def m_from_links(link):
        brk = jnp.concatenate([jnp.ones(1, bool), ~link])
        # epoch change within a run == a skip word passed between events
        ep_chg = jnp.concatenate(
            [jnp.ones(1, bool), epoch[1:] != epoch[:-1]])
        seg_start = brk | ep_chg
        seg_max = seg_scan(ext, seg_start, jnp.maximum)
        w_first = seg_scan(w_evt, brk, lambda a, b: a)  # run's first word
        # skip overwrite applies iff it happened while this match was alive
        u_term = jnp.where((u_last > w_first) & (u_last >= 0), u_last, -BIG)
        return jnp.maximum(seg_max, u_term)

    link0 = links_from_m(ext)

    def cond(state):
        link, _, changed, it = state
        return changed & (it < jnp.int32(64))

    def body(state):
        link, _, _, it = state
        M = m_from_links(link)
        link2 = links_from_m(M)
        return link2, M, jnp.any(link2 != link), it + 1

    link, M, changed, _ = jax.lax.while_loop(
        cond, body, (link0, m_from_links(link0), jnp.bool_(True),
                     jnp.int32(0)))

    brk = jnp.concatenate([jnp.ones(1, bool), ~link])
    run_id = jnp.cumsum(brk.astype(jnp.int32)) - 1

    idx = jnp.arange(E, dtype=jnp.int32)
    first = jax.ops.segment_min(jnp.where(valid, idx, E), run_id,
                                num_segments=E)
    last = jax.ops.segment_max(jnp.where(valid, idx, -1), run_id,
                               num_segments=E)
    run_valid = (first < E) & (last >= 0)
    first_c = jnp.clip(first, 0, E - 1)
    last_c = jnp.clip(last, 0, E - 1)

    r_ki = ki[first_c]
    r_kj = kj[first_c]
    r_w0 = w0s[first_c]
    w_last = w_evt[last_c]
    m_last = M[last_c]
    run_valid = run_valid & (r_ki < BIG)
    D = death(m_last, w_last)
    dead = run_valid & (D < chunk_end)
    alive = run_valid & ~dead

    # final match end: the last skip word in (w_last, stop) OVERWRITES the
    # running end (even downward, ExtendHash::extendAllPairsTo); else M
    def final_w1(stop):
        u = tab(LS, stop - 1, -1)
        return jnp.where((u > w_last) & (u < stop), u, m_last)

    w1_dead = final_w1(D)
    w1_carry = final_w1(jnp.full_like(D, chunk_end))
    return r_ki, r_kj, r_w0, D, dead, alive, w1_dead, w1_carry, changed


def _pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

class VectorizedHashingScan(HashingScan):
    """Device (XLA) identification scan; interface-compatible with
    :class:`HashingScan`.

    chunk_words bounds device memory (0 = whole panel in one chunk);
    capacity is the initial collision-event buffer size (grows on demand).
    """

    def __init__(self, params, data, callback, chunk_words: int = 0,
                 capacity: int = 1 << 16):
        super().__init__(params, data, callback)
        self.chunk_words = chunk_words
        self.capacity = capacity

    def _enumerate_level(self, order, newbkt, emit, id_num, cs, window,
                         verbose):
        """Enumerate one level's events with buffer-growth retry; returns
        host arrays (ki, kj, w_evt)."""
        p = self.params
        while True:
            ki, kj, w_evt, total = _enumerate_events(
                order, newbkt, emit, id_num, np.int32(cs),
                self._cap, p.haploid, window)
            total = int(total)
            if total < 0:
                raise RuntimeError(
                    "hashing chunk overflows int32 event count; "
                    "reduce chunk_words")
            if total <= self._cap:
                break
            self._cap = _pow2(total)
            if verbose:
                print(f"hashing event buffer grown to {self._cap}")
        n_real = min(total, self._cap)
        return (np.asarray(ki)[:n_real].astype(np.int64),
                np.asarray(kj)[:n_real].astype(np.int64),
                np.asarray(w_evt, np.int64)[:n_real])

    def run(self, verbose: bool = False, use_native: bool = True) -> None:
        p = self.params

        H, W = self.words.shape
        if W == 0 or H == 0:
            return
        ws = self.word_size
        hi_all = (self.words >> np.uint64(32)).astype(np.uint32)
        lo_all = (self.words & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        id_num = jnp.asarray(self.id_num.astype(np.int32))

        wnd = self.windows
        window = ((wnd.window_size, wnd.w_i, wnd.w_j, wnd.job_ind,
                   wnd.jobs, wnd.is_j_above_diag)
                  if wnd is not None else None)

        Wc = self.chunk_words if self.chunk_words > 0 else W
        self._cap = _pow2(self.capacity)
        gap = p.gap
        ms = jnp.int32(p.max_seeds)
        cra = int(p.const_read_ahead)

        carry = np.zeros((4, 0), np.int64)   # ki, kj, w0, w1
        segments = []                        # (flush_word, w0, ki, kj, w1)

        def horizon(cs, ce, d):
            # recursion from level d to d+1 at word w needs
            # w + d + 1 < min(W, w + const_read_ahead)  (FastSMC.cpp:189,
            # SeedHash.hpp:88)
            w = np.arange(cs, ce)
            return jnp.asarray((d + 1 < cra) & (w + d + 1 < W))

        cs = 0
        while cs < W:
            ce = min(W, cs + Wc)
            order, newbkt, seeds = _bucketize(
                jnp.asarray(hi_all[:, cs:ce]),
                jnp.asarray(lo_all[:, cs:ce]))
            skip_np = ~(np.asarray(seeds) / H > p.skip)

            base_ok = jnp.broadcast_to(~jnp.asarray(skip_np)[:, None],
                                       (ce - cs, H))
            ki_l, kj_l, w_l, ext_l = [], [], [], []
            d = 0
            while True:
                emit, carried, group, any_carry = _level_masks(
                    newbkt, base_ok, horizon(cs, ce, d), ms)
                eki, ekj, ewe = self._enumerate_level(
                    order, newbkt, emit, id_num, cs, window, verbose)
                ki_l.append(eki)
                kj_l.append(ekj)
                w_l.append(ewe)
                ext_l.append(ewe + d)
                if not bool(any_carry):
                    break
                d += 1
                # level-d keys: each word w re-keys on column w + d
                sl = slice(cs + d, min(W, ce + d))
                pad = (ce - cs) - (sl.stop - sl.start)
                hi_n = hi_all[:, sl]
                lo_n = lo_all[:, sl]
                if pad:  # columns past the panel never carry (horizon)
                    z = np.zeros((H, pad), np.uint32)
                    hi_n = np.concatenate([hi_n, z], axis=1)
                    lo_n = np.concatenate([lo_n, z], axis=1)
                order, newbkt, group = _subhash_level(
                    order, group, jnp.asarray(hi_n), jnp.asarray(lo_n))
                base_ok = group >= 0

            ki = np.concatenate(ki_l)
            kj = np.concatenate(kj_l)
            w_evt = np.concatenate(w_l)
            ext = np.concatenate(ext_l)
            w0s = w_evt.copy()

            if carry.shape[1]:
                ki = np.concatenate([ki, carry[0]])
                kj = np.concatenate([kj, carry[1]])
                w_evt = np.concatenate(
                    [w_evt, np.full(carry.shape[1], cs - 1, np.int64)])
                ext = np.concatenate([ext, carry[3]])
                w0s = np.concatenate([w0s, carry[2]])

            # pad to a power of two to bound recompiles of _detect_runs
            E = _pow2(max(len(ki), 1))
            pad = E - len(ki)
            if pad:
                ki = np.concatenate([ki, np.full(pad, BIG, np.int64)])
                kj = np.concatenate([kj, np.full(pad, BIG, np.int64)])
                w_evt = np.concatenate([w_evt, np.full(pad, BIG, np.int64)])
                ext = np.concatenate([ext, np.full(pad, BIG, np.int64)])
                w0s = np.concatenate([w0s, np.full(pad, BIG, np.int64)])

            tab_lo = cs - 1
            N, U, LS, Dsk = _death_tables(skip_np, tab_lo, gap)
            flags = np.zeros(len(skip_np) + 1, bool)
            flags[1:] = skip_np
            EC = np.cumsum(flags).astype(np.int32)  # skips <= tab word
            (r_ki, r_kj, r_w0, D, dead, alive, w1_dead, w1_carry,
             m_changed) = (
                np.asarray(x) for x in _detect_runs(
                    jnp.asarray(ki, jnp.int32), jnp.asarray(kj, jnp.int32),
                    jnp.asarray(w_evt, jnp.int32),
                    jnp.asarray(ext, jnp.int32),
                    jnp.asarray(w0s, jnp.int32),
                    jnp.asarray(N, jnp.int32), jnp.asarray(U, jnp.int32),
                    jnp.asarray(LS, jnp.int32), jnp.asarray(Dsk, jnp.int32),
                    jnp.asarray(EC),
                    np.int32(tab_lo), np.int32(ce), np.int32(gap)))
            if bool(m_changed):
                raise RuntimeError(
                    "run-detection fixpoint did not converge in 64 "
                    "iterations (pathological sub-hash chain)")

            for i in np.flatnonzero(dead):
                segments.append((int(D[i]), int(r_w0[i]), int(r_ki[i]),
                                 int(r_kj[i]), int(w1_dead[i])))
            A = np.flatnonzero(alive)
            carry = np.stack([r_ki[A].astype(np.int64),
                              r_kj[A].astype(np.int64),
                              r_w0[A].astype(np.int64),
                              w1_carry[A].astype(np.int64)])
            cs = ce

        # end of scan: clearAllPairs flushes everything still active
        for i in range(carry.shape[1]):
            segments.append((W, int(carry[2, i]), int(carry[0, i]),
                             int(carry[1, i]), int(carry[3, i])))

        segments.sort()
        gpos = self.data.genetic_positions
        for _, w0, kii, kjj, w1 in segments:
            if cm_between(w0, w1, gpos, ws) >= p.min_m:
                frm = w0 * ws
                to = w1 * ws + ws - 1
                self.callback(kii, kjj, frm, to)
