"""Hashing (identification) engine semantics."""

import numpy as np
import pytest

from fastsmc_tpu.config import DecodingParams
from fastsmc_tpu.hashing.germline import HashingScan, cm_between
from fastsmc_tpu.io.haps import Data, JobWindows


def make_data(hap_bits, genetic_cm, windows=None, sample_size=None):
    n_haps, sites = hap_bits.shape
    n_ind = n_haps // 2
    sample_size = sample_size or n_ind
    return Data(
        sites=sites, sample_size=sample_size,
        fam_id_list=[f"f{i}" for i in range(n_ind)],
        iid_list=[f"s{i}" for i in range(n_ind)],
        hap_bits=hap_bits.astype(np.uint8),
        genetic_positions=np.asarray(genetic_cm) / 100.0,
        physical_positions=np.arange(sites, dtype=np.int64) * 1000,
        rec_rate_at_marker=np.zeros(sites),
        snp_ids=[f"snp{i}" for i in range(sites)],
        derived_allele_counts=hap_bits.sum(axis=0).astype(np.int32),
        total_samples_count=np.full(sites, n_haps, np.int32),
        site_was_flipped=np.zeros(sites, bool),
        chr_number=1, windows=windows,
        fold_to_minor=False, decoding_uses_csfs=False, use_known_seed=True)


def params_for(**kw):
    p = DecodingParams(fastsmc=True, hashing=True, batch_size=8,
                       in_file_root="/x", decoding_quant_file="/x",
                       out_file_root="/x", **kw)
    return p


def test_cm_between():
    g = np.arange(200) * 0.0001  # Morgans: 0.01 cM per site
    # words of 64 sites: word 0..64*1+63 = sites 0..127
    d = cm_between(0, 1, g, 64)
    assert abs(d - 100 * (g[127] - g[0])) < 1e-6


def test_simple_shared_segment_detected():
    rng = np.random.default_rng(0)
    sites = 64 * 6
    n_haps = 8
    bits = rng.integers(0, 2, (n_haps, sites)).astype(np.uint8)
    # haps 2 and 5 share sites 64..319 (4 words)
    bits[5, 64:320] = bits[2, 64:320]
    cm = np.linspace(0, 10, sites)  # 10 cM total
    data = make_data(bits, cm)
    matches = []
    p = params_for(min_m=1.0)
    scan = HashingScan(p, data, lambda a, b, f, t: matches.append((a, b, f, t)))
    scan.run()
    found = [m for m in matches if {m[0], m[1]} == {2, 5}]
    assert len(found) == 1
    a, b, f, t = found[0]
    assert f == 64 and t == 64 * 4 + 63   # words 1..4


def test_min_m_filters_short_matches():
    rng = np.random.default_rng(1)
    sites = 64 * 6
    bits = rng.integers(0, 2, (8, sites)).astype(np.uint8)
    bits[5, 64:128] = bits[2, 64:128]   # one word only
    cm = np.linspace(0, 3, sites)       # ~0.5 cM per word
    data = make_data(bits, cm)
    matches = []
    scan = HashingScan(params_for(min_m=1.5), data,
                       lambda a, b, f, t: matches.append((a, b)))
    scan.run()
    assert (2, 5) not in matches and (5, 2) not in matches


def test_gap_tolerance_merges_interrupted_match():
    rng = np.random.default_rng(2)
    sites = 64 * 8
    bits = rng.integers(0, 2, (6, sites)).astype(np.uint8)
    # share words 1,2 and 4,5 (gap at word 3)
    bits[3, 64:192] = bits[0, 64:192]
    bits[3, 256:384] = bits[0, 256:384]
    cm = np.linspace(0, 20, sites)
    data = make_data(bits, cm)
    matches = []
    scan = HashingScan(params_for(min_m=0.5, gap=1), data,
                       lambda a, b, f, t: matches.append((a, b, f, t)))
    scan.run()
    found = [m for m in matches if {m[0], m[1]} == {0, 3}]
    # gap=1 keeps the match alive through one missed word -> single interval
    assert len(found) == 1
    assert found[0][2] == 64 and found[0][3] == 64 * 5 + 63


def test_max_seeds_subhash_preserves_pairs():
    """With max_seeds, large buckets recurse on the next word; a true long
    match must still surface."""
    rng = np.random.default_rng(3)
    sites = 64 * 6
    n = 20
    bits = np.zeros((n, sites), dtype=np.uint8)
    # all haps identical on word 0 (collision bucket size n), random after
    bits[:, 64:] = rng.integers(0, 2, (n, sites - 64))
    bits[7, 64:] = bits[12, 64:]   # true long match
    cm = np.linspace(0, 30, sites)
    data = make_data(bits, cm)
    got, got_nosub = [], []
    scan = HashingScan(params_for(min_m=1.0, max_seeds=5), data,
                       lambda a, b, f, t: got.append((min(a, b), max(a, b))))
    scan.run()
    scan2 = HashingScan(params_for(min_m=1.0, max_seeds=0), data,
                        lambda a, b, f, t: got_nosub.append(
                            (min(a, b), max(a, b))))
    scan2.run()
    assert (7, 12) in got
    assert (7, 12) in got_nosub


def test_jobbed_pair_sets_partition_full_set():
    """Pairs found across all 4 jobs == pairs found with 1 job, disjointly
    (the triangular window filter, SeedHash.hpp:103-129)."""
    rng = np.random.default_rng(4)
    sites = 64 * 5
    n_ind = 12
    bits = rng.integers(0, 2, (2 * n_ind, sites)).astype(np.uint8)
    # plant several long matches
    for (a, b) in [(0, 5), (3, 17), (10, 22), (8, 9), (1, 23)]:
        bits[b] = bits[a]
    cm = np.linspace(0, 30, sites)

    def run_job(jobs, job_ind):
        w = JobWindows.compute(n_ind, jobs, job_ind)
        in_job = [d for d in range(n_ind) if w.sample_in_job(d)]
        rows = np.array([h for d in in_job for h in (2 * d, 2 * d + 1)])
        data = make_data(bits[rows], cm, windows=w, sample_size=n_ind)
        # id mapping: local hap i corresponds to global hap rows[i]
        found = set()
        scan = HashingScan(params_for(min_m=1.0, jobs=jobs, job_ind=job_ind),
                           data,
                           lambda a, b, f, t: found.add(
                               tuple(sorted((rows[a], rows[b])))))
        scan.run()
        return found

    full = run_job(1, 1)
    parts = [run_job(4, j) for j in range(1, 5)]
    union = set().union(*parts)
    total = sum(len(p) for p in parts)
    assert total == len(union), "jobs must not duplicate pairs"
    assert union == full, f"missing {full - union}, extra {union - full}"


def test_native_scan_matches_python():
    """The C++ scan must reproduce the Python oracle exactly, including
    emission order (both use insertion-ordered buckets/match tables)."""
    from fastsmc_tpu import native
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    sites = 64 * 10
    bits = rng.integers(0, 2, (30, sites)).astype(np.uint8)
    for (a, b) in [(0, 5), (3, 17), (10, 22), (8, 9), (2, 29)]:
        bits[b, 128:512] = bits[a, 128:512]
    cm = np.linspace(0, 40, sites)
    data = make_data(bits, cm)
    for kw in ({}, {"max_seeds": 4}, {"gap": 2}, {"skip": 0.9}):
        p = params_for(min_m=1.0, **kw)
        got_n, got_p = [], []
        HashingScan(p, data, lambda *a: got_n.append(a)).run(use_native=True)
        HashingScan(p, data, lambda *a: got_p.append(a)).run(use_native=False)
        assert got_n == got_p, f"params {kw}"


def test_native_undistinguished_matches_python():
    from fastsmc_tpu import native
    from fastsmc_tpu.utils.cxx_rng import GlibcRand, sample_hypergeometric
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(1)
    dac = rng.integers(0, 300, 50).astype(np.int32)
    tot = np.full(50, 600, np.int32)
    nat = native.undistinguished_counts(dac, tot, 300, True, 1234)
    r = GlibcRand(1234)
    py = np.empty((50, 3), np.int32)
    for i in range(50):
        for d in range(3):
            s = sample_hypergeometric(r, int(tot[i]) - 2, int(dac[i]) - d, 298)
            if s + d > 150:
                s = 298 - s
            py[i, d] = s
    assert np.array_equal(nat, py)


def test_chunked_overlapped_scan_matches_single_shot():
    """The chunked scan handle (producer-thread overlap path) must emit
    the exact same candidate stream — matches AND order — as the
    single-shot native scan, across chunk sizes that split matches mid-
    extension (the extend-hash state carries across chunk boundaries)."""
    from fastsmc_tpu import native
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    sites = 64 * 12
    bits = rng.integers(0, 2, (40, sites)).astype(np.uint8)
    for (a, b) in [(0, 5), (3, 17), (10, 22), (8, 9), (2, 29), (31, 38)]:
        bits[b, 100:700] = bits[a, 100:700]
    cm = np.linspace(0, 48, sites)
    data = make_data(bits, cm)
    for kw in ({}, {"max_seeds": 4}, {"gap": 2}):
        p = params_for(min_m=1.0, **kw)
        single = []
        s = HashingScan(p, data, None)
        s.array_callback = lambda i1, i2, f, t: single.append(
            (i1.copy(), i2.copy(), f.copy(), t.copy()))
        s.run(use_native=True, overlap=False)
        flat_single = [np.concatenate([c[k] for c in single])
                       for k in range(4)] if single else [np.array([])] * 4
        for cw in (1, 2, 3, 5, 64):
            chunks = []
            sc = HashingScan(p, data, None)
            sc.array_callback = lambda i1, i2, f, t: chunks.append(
                (i1.copy(), i2.copy(), f.copy(), t.copy()))
            sc.run(use_native=True, overlap=True, chunk_words=cw)
            flat = [np.concatenate([c[k] for c in chunks])
                    for k in range(4)] if chunks else [np.array([])] * 4
            for k in range(4):
                np.testing.assert_array_equal(
                    flat[k], flat_single[k],
                    err_msg=f"chunk_words={cw} params={kw} col={k}")
