"""Parity of the sort-based device hashing scan vs the host oracle.

The vectorized scan must produce the exact same (pair, from, to) segment
set as the streaming Python transliteration of GERMLINE2 for every
parameter combination it supports (max_seeds == 0)."""

import numpy as np
import pytest

from fastsmc_tpu.hashing.germline import HashingScan
from fastsmc_tpu.hashing.vectorized import VectorizedHashingScan
from fastsmc_tpu.io.haps import JobWindows

from test_hashing import make_data, params_for


def segments_host(params, data):
    out = []
    scan = HashingScan(params, data,
                       lambda a, b, f, t: out.append((a, b, f, t)))
    scan._run_python()
    return out


def segments_vec(params, data, **kw):
    out = []
    scan = VectorizedHashingScan(params, data,
                                 lambda a, b, f, t: out.append((a, b, f, t)),
                                 **kw)
    scan.run()
    return out


def random_panel(seed, n_haps=16, words=8, planted=((2, 5), (7, 11))):
    rng = np.random.default_rng(seed)
    sites = 64 * words
    bits = rng.integers(0, 2, (n_haps, sites)).astype(np.uint8)
    for (a, b) in planted:
        lo = 64 * rng.integers(0, words - 3)
        hi = lo + 64 * int(rng.integers(2, words - lo // 64))
        bits[b, lo:hi] = bits[a, lo:hi]
    cm = np.linspace(0, 20, sites)
    return bits, cm


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_default_params_match(seed):
    bits, cm = random_panel(seed)
    data = make_data(bits, cm)
    p = params_for(min_m=1.0)
    assert sorted(segments_vec(p, data)) == sorted(segments_host(p, data))


def test_gap_tolerance_matches():
    rng = np.random.default_rng(3)
    sites = 64 * 10
    bits = rng.integers(0, 2, (10, sites)).astype(np.uint8)
    # match with a one-word interruption (within gap=2, beyond gap=1)
    bits[6, 0:64 * 3] = bits[1, 0:64 * 3]
    bits[6, 64 * 4:64 * 8] = bits[1, 64 * 4:64 * 8]
    cm = np.linspace(0, 40, sites)
    data = make_data(bits, cm)
    for gap in (0, 1, 2, 3):
        p = params_for(min_m=1.0, gap=gap)
        assert sorted(segments_vec(p, data)) == \
            sorted(segments_host(p, data)), f"gap={gap}"


def test_skip_words_match():
    rng = np.random.default_rng(4)
    sites = 64 * 10
    n_haps = 12
    bits = rng.integers(0, 2, (n_haps, sites)).astype(np.uint8)
    # words 3..5 low complexity: constant across haps
    bits[:, 64 * 3:64 * 6] = np.tile(bits[0:1, 64 * 3:64 * 6], (n_haps, 1))
    bits[9, 64 * 1:64 * 8] = bits[2, 64 * 1:64 * 8]
    cm = np.linspace(0, 40, sites)
    data = make_data(bits, cm)
    for skip in (0.0, 0.3, 0.9):
        p = params_for(min_m=1.0, skip=skip)
        assert sorted(segments_vec(p, data)) == \
            sorted(segments_host(p, data)), f"skip={skip}"


def test_trailing_skip_words_extend_final_match():
    rng = np.random.default_rng(5)
    sites = 64 * 6
    n_haps = 8
    bits = rng.integers(0, 2, (n_haps, sites)).astype(np.uint8)
    bits[5, 0:64 * 3] = bits[2, 0:64 * 3]
    # last two words constant -> skip under high skip ratio
    bits[:, 64 * 4:] = np.tile(bits[0:1, 64 * 4:], (n_haps, 1))
    cm = np.linspace(0, 30, sites)
    data = make_data(bits, cm)
    p = params_for(min_m=1.0, skip=0.5)
    assert sorted(segments_vec(p, data)) == sorted(segments_host(p, data))


def test_min_maf_filter_matches():
    bits, cm = random_panel(6)
    # make some rare sites
    bits[1:, 10:20] = 0
    data = make_data(bits, cm)
    p = params_for(min_m=1.0, min_maf=0.1)
    assert sorted(segments_vec(p, data)) == sorted(segments_host(p, data))


def test_diploid_mode_matches():
    bits, cm = random_panel(7)
    data = make_data(bits, cm)
    p = params_for(min_m=1.0, haploid=False)
    got = segments_vec(p, data)
    assert sorted(got) == sorted(segments_host(p, data))
    assert all(a % 2 == 0 and b % 2 == 0 for a, b, _, _ in got)


def test_job_windows_match():
    rng = np.random.default_rng(8)
    sites = 64 * 5
    n_ind = 12
    bits = rng.integers(0, 2, (2 * n_ind, sites)).astype(np.uint8)
    for (a, b) in [(0, 5), (3, 17), (10, 22), (8, 9), (1, 23)]:
        bits[b] = bits[a]
    cm = np.linspace(0, 30, sites)
    for jobs, job_ind in [(4, 1), (4, 2), (4, 3), (4, 4), (9, 7)]:
        w = JobWindows.compute(n_ind, jobs, job_ind)
        in_job = [d for d in range(n_ind) if w.sample_in_job(d)]
        rows = np.array([h for d in in_job for h in (2 * d, 2 * d + 1)])
        data = make_data(bits[rows], cm, windows=w, sample_size=n_ind)
        p = params_for(min_m=1.0, jobs=jobs, job_ind=job_ind)
        assert sorted(segments_vec(p, data)) == \
            sorted(segments_host(p, data)), f"job {job_ind}/{jobs}"


@pytest.mark.parametrize("chunk_words", [1, 2, 3, 5])
def test_chunking_is_invariant(chunk_words):
    bits, cm = random_panel(9, n_haps=14, words=9)
    data = make_data(bits, cm)
    p = params_for(min_m=1.0)
    full = segments_vec(p, data)
    chunked = segments_vec(p, data, chunk_words=chunk_words)
    assert sorted(chunked) == sorted(full)


def test_chunking_with_skip_words():
    rng = np.random.default_rng(10)
    sites = 64 * 9
    n_haps = 10
    bits = rng.integers(0, 2, (n_haps, sites)).astype(np.uint8)
    bits[:, 64 * 3:64 * 6] = np.tile(bits[0:1, 64 * 3:64 * 6], (n_haps, 1))
    bits[7, 64 * 1:64 * 8] = bits[3, 64 * 1:64 * 8]
    cm = np.linspace(0, 40, sites)
    data = make_data(bits, cm)
    p = params_for(min_m=1.0, skip=0.5, gap=2)
    host = segments_host(p, data)
    for cw in (2, 3, 4):
        assert sorted(segments_vec(p, data, chunk_words=cw)) == \
            sorted(host), f"chunk_words={cw}"


def test_capacity_growth():
    bits, cm = random_panel(11)
    data = make_data(bits, cm)
    p = params_for(min_m=1.0)
    small = segments_vec(p, data, capacity=4)
    assert sorted(small) == sorted(segments_host(p, data))


def clustered_panel(seed, n_haps=24, words=10, cluster=8):
    """Panel with an oversized seed cluster so max_seeds sub-hashing
    actually recurses: `cluster` haps share words 2..5 exactly, with a
    planted sub-structure at words 3..6 splitting them into two groups."""
    rng = np.random.default_rng(seed)
    sites = 64 * words
    bits = rng.integers(0, 2, (n_haps, sites)).astype(np.uint8)
    for h in range(1, cluster):
        bits[h, 64 * 2:64 * 3] = bits[0, 64 * 2:64 * 3]
    for h in range(1, cluster // 2):
        bits[h, 64 * 3:64 * 7] = bits[0, 64 * 3:64 * 7]
    for h in range(cluster // 2 + 1, cluster):
        bits[h, 64 * 3:64 * 6] = bits[cluster // 2, 64 * 3:64 * 6]
    cm = np.linspace(0, 50, sites)
    return bits, cm


@pytest.mark.parametrize("max_seeds", [1, 2, 3, 5])
def test_max_seeds_parity(max_seeds):
    bits, cm = clustered_panel(12)
    data = make_data(bits, cm)
    p = params_for(min_m=1.0, max_seeds=max_seeds)
    assert sorted(segments_vec(p, data)) == sorted(segments_host(p, data))


@pytest.mark.parametrize("gap", [0, 1, 3])
def test_max_seeds_with_gap(gap):
    bits, cm = clustered_panel(13)
    data = make_data(bits, cm)
    p = params_for(min_m=1.0, max_seeds=2, gap=gap)
    assert sorted(segments_vec(p, data)) == \
        sorted(segments_host(p, data)), f"gap={gap}"


def test_max_seeds_with_skip_words():
    # skip words interleaved with sub-hashed clusters exercise the
    # end-overwrite (extendAllPairsTo) against sub-hash-extended ends
    rng = np.random.default_rng(14)
    sites = 64 * 12
    n_haps = 20
    bits = rng.integers(0, 2, (n_haps, sites)).astype(np.uint8)
    for h in range(1, 9):
        bits[h, 64 * 2:64 * 3] = bits[0, 64 * 2:64 * 3]
    for h in range(1, 5):
        bits[h, 64 * 3:64 * 8] = bits[0, 64 * 3:64 * 8]
    bits[:, 64 * 5:64 * 7] = np.tile(bits[0:1, 64 * 5:64 * 7], (n_haps, 1))
    cm = np.linspace(0, 60, sites)
    data = make_data(bits, cm)
    for skip in (0.0, 0.3, 0.9):
        p = params_for(min_m=1.0, max_seeds=2, skip=skip, gap=1)
        assert sorted(segments_vec(p, data)) == \
            sorted(segments_host(p, data)), f"skip={skip}"


@pytest.mark.parametrize("read_ahead", [1, 2, 3, 10])
def test_max_seeds_read_ahead_horizon(read_ahead):
    # small const_read_ahead stops the recursion early; buckets at the
    # horizon enumerate all pairs (SeedHash.hpp:88 outer guard)
    bits, cm = clustered_panel(15, cluster=10)
    data = make_data(bits, cm)
    p = params_for(min_m=1.0, max_seeds=2, const_read_ahead=read_ahead)
    assert sorted(segments_vec(p, data)) == \
        sorted(segments_host(p, data)), f"read_ahead={read_ahead}"


@pytest.mark.parametrize("chunk_words", [1, 2, 3, 5])
def test_max_seeds_chunking_invariant(chunk_words):
    bits, cm = clustered_panel(16)
    data = make_data(bits, cm)
    p = params_for(min_m=1.0, max_seeds=2, gap=1)
    host = segments_host(p, data)
    assert sorted(segments_vec(p, data)) == sorted(host)
    assert sorted(segments_vec(p, data, chunk_words=chunk_words)) == \
        sorted(host), f"chunk_words={chunk_words}"


def test_max_seeds_diploid_and_windows():
    rng = np.random.default_rng(17)
    sites = 64 * 8
    n_ind = 10
    bits = rng.integers(0, 2, (2 * n_ind, sites)).astype(np.uint8)
    for h in range(1, 8):
        bits[h, 64 * 2:64 * 5] = bits[0, 64 * 2:64 * 5]
    cm = np.linspace(0, 40, sites)
    data = make_data(bits, cm)
    p = params_for(min_m=1.0, max_seeds=2, haploid=False)
    assert sorted(segments_vec(p, data)) == sorted(segments_host(p, data))
    for jobs, job_ind in [(4, 1), (4, 4)]:
        w = JobWindows.compute(n_ind, jobs, job_ind)
        in_job = [d for d in range(n_ind) if w.sample_in_job(d)]
        rows = np.array([h for d in in_job for h in (2 * d, 2 * d + 1)])
        dw = make_data(bits[rows], cm, windows=w, sample_size=n_ind)
        pw = params_for(min_m=1.0, max_seeds=2, jobs=jobs, job_ind=job_ind)
        assert sorted(segments_vec(pw, dw)) == \
            sorted(segments_host(pw, dw)), f"job {job_ind}/{jobs}"


@pytest.mark.parametrize("seed", [20, 21, 22, 23])
def test_max_seeds_randomized_parity(seed):
    # random panels with low max_seeds force recursion on natural clusters
    rng = np.random.default_rng(seed)
    sites = 64 * 9
    n_haps = 18
    # low-entropy words (4 distinct patterns) make big buckets everywhere
    patterns = rng.integers(0, 2, (4, sites)).astype(np.uint8)
    bits = patterns[rng.integers(0, 4, n_haps)]
    flips = rng.random((n_haps, sites)) < 0.02
    bits = np.bitwise_xor(bits, flips.astype(np.uint8))
    cm = np.linspace(0, 45, sites)
    data = make_data(bits, cm)
    for ms in (1, 2):
        for gap in (0, 2):
            p = params_for(min_m=1.0, max_seeds=ms, gap=gap, skip=0.05)
            assert sorted(segments_vec(p, data)) == \
                sorted(segments_host(p, data)), f"ms={ms} gap={gap}"
