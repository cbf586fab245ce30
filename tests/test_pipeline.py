"""End-to-end FastSMC pipeline on a small synthetic panel (CPU)."""

import gzip
import hashlib
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synthetic_panel(tmp_path_factory):
    """150 diploid samples x 640 sites with planted IBD segments, written in
    the reference file formats (hap.gz / samples / 3-col map.gz)."""
    d = tmp_path_factory.mktemp("panel")
    rng = np.random.default_rng(123)
    n_ind, sites = 150, 640
    n_haps = 2 * n_ind
    freqs = rng.uniform(0.05, 0.5, sites)
    bits = (rng.random((n_haps, sites)) < freqs).astype(np.uint8)
    # plant long shared segments (word-aligned-ish)
    planted = [(4, 31, 64, 512), (100, 205, 128, 576), (7, 8, 0, 448)]
    for (a, b, s, e) in planted:
        bits[b, s:e] = bits[a, s:e]

    bp = (np.arange(sites) + 1) * 5000
    cm = np.linspace(0.0, 8.0, sites)   # 8 cM total

    root = str(d / "panel")
    with gzip.open(root + ".hap.gz", "wt") as f:
        for s in range(sites):
            alleles = " ".join(str(int(x)) for x in bits[:, s])
            f.write(f"1 SNP_{s} {bp[s]} A G {alleles}\n")
    with open(root + ".samples", "w") as f:
        f.write("ID_1 ID_2 missing\n0 0 0\n")
        for i in range(n_ind):
            f.write(f"fam{i} ind{i} 0\n")
    with gzip.open(root + ".map.gz", "wt") as f:
        f.write("pos rate cm\n")
        for s in range(sites):
            f.write(f"{bp[s]}\t0\t{cm[s]}\n")
    return root, planted, bits


@pytest.mark.slow
def test_fastsmc_end_to_end_cpu(synthetic_panel, repo_root, tmp_path):
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    root, planted, bits = synthetic_panel
    params = DecodingParams.fastsmc_defaults(
        root, str(repo_root / "artifacts" /
                  "n300.array.decodingQuantities.npz"),
        str(tmp_path / "out"), use_known_seed=True, min_m=0.5)
    f = FastSMC(params, use_pallas=False)
    path = f.run(verbose=False)

    with gzip.open(path, "rt") as fh:
        lines = [l.split("\t") for l in fh.read().splitlines()]
    assert lines, "no segments detected"
    # every record is well-formed: 13 columns with increasing bp
    for rec in lines:
        assert len(rec) == 13
        assert int(rec[7]) <= int(rec[8])
        assert rec[6] == "1"
        assert float(rec[10]) >= 0.0   # ibd score

    # the planted pairs must be among the detected segments
    found_pairs = {(r[1], int(r[2]), r[4], int(r[5])) for r in lines}
    for (a, b, s, e) in planted:
        ia, ha = a // 2, 1 + a % 2
        ib, hb = b // 2, 1 + b % 2
        key = (f"ind{ia}", ha, f"ind{ib}", hb)
        key_r = (f"ind{ib}", hb, f"ind{ia}", ha)
        assert key in found_pairs or key_r in found_pairs, \
            f"planted pair {key} not detected"


@pytest.mark.slow
def test_fastsmc_binary_output_roundtrip(synthetic_panel, repo_root, tmp_path):
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.io.writers import BinaryDataReader
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    root, planted, bits = synthetic_panel
    kw = dict(use_known_seed=True, min_m=0.5)
    dq = str(repo_root / "artifacts" / "n300.array.decodingQuantities.npz")

    p_txt = DecodingParams.fastsmc_defaults(
        root, dq, str(tmp_path / "t"), **kw)
    FastSMC(p_txt, use_pallas=False).run(verbose=False)
    p_bin = DecodingParams.fastsmc_defaults(
        root, dq, str(tmp_path / "b"), bin_out=True, **kw)
    FastSMC(p_bin, use_pallas=False).run(verbose=False)

    with gzip.open(p_txt.ibd_output_path(), "rt") as fh:
        text_lines = fh.read().splitlines()
    bin_lines = [l.to_string() for l in
                 BinaryDataReader(p_bin.ibd_output_path())]
    assert len(text_lines) == len(bin_lines)
    # binary stores float32; text from text-writer also float32-formatted
    for t, b in zip(text_lines[:50], bin_lines[:50]):
        tt, bb = t.split("\t"), b.split("\t")
        assert tt[:9] == bb[:9]


@pytest.mark.slow
def test_jobbed_fastsmc_union_covers_single_job(synthetic_panel, repo_root,
                                                tmp_path):
    """4-job run must produce the same *pair coverage* as a single job (the
    reference merges per-job files by concatenation)."""
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    root, planted, bits = synthetic_panel
    dq = str(repo_root / "artifacts" / "n300.array.decodingQuantities.npz")

    def run(jobs, job_ind, tag):
        p = DecodingParams.fastsmc_defaults(
            root, dq, str(tmp_path / tag), jobs=jobs, job_ind=job_ind,
            use_known_seed=True, min_m=0.5)
        f = FastSMC(p, use_pallas=False)
        path = f.run(verbose=False)
        with gzip.open(path, "rt") as fh:
            return {tuple(l.split("\t")[:6]) for l in fh.read().splitlines()}

    full = run(1, 1, "full")
    union = set()
    for j in range(1, 5):
        union |= run(4, j, f"job{j}")
    assert union == full


@pytest.mark.slow
def test_asmc_decode_all_and_api(synthetic_panel, repo_root, tmp_path):
    """ASMC all-pairs sums + decodePairs API on CPU."""
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.asmc import ASMC
    from fastsmc_tpu.engine.oracle import decode_pair

    root, planted, bits = synthetic_panel
    params = DecodingParams.asmc(
        root, str(repo_root / "artifacts" /
                  "n300.array.decodingQuantities.npz"),
        str(tmp_path / "asmc"), do_posterior_sums=True,
        do_major_minor_posterior_sums=True, use_known_seed=True,
        jobs=4, job_ind=2, fastsmc=True)
    asmc = ASMC(params, use_pallas=False, batch_size=64)
    res = asmc.decode_all_in_job(verbose=False)
    L, K = res.sites, res.states
    assert res.sum_over_pairs.shape == (L, K)
    # column sums: each decoded pair contributes 1 per position
    n_pairs = len(asmc._job_pairs())
    np.testing.assert_allclose(res.sum_over_pairs.sum(axis=1), n_pairs,
                               rtol=1e-3)
    # major/minor partition adds back to the total
    total = (res.sum_over_pairs00 + res.sum_over_pairs01
             + res.sum_over_pairs11)
    np.testing.assert_allclose(total, res.sum_over_pairs, rtol=2e-3,
                               atol=2e-3)
    asmc.write_outputs(res)
    assert (tmp_path / "asmc.sumOverPairs.gz").exists()
    assert (tmp_path / "asmc.00.sumOverPairs.gz").exists()

    # decodePairs API vs the oracle
    r = asmc.decode_pairs([1, 5], [2, 6], per_pair_posteriors=True,
                          sum_of_posteriors=True)
    assert len(r.per_pair_indices) == 2
    ref = decode_pair(asmc.ctx, 1, 2)
    expt = asmc.dq.expected_times
    want_mean = (ref * expt[:, None]).sum(axis=0)
    np.testing.assert_allclose(r.per_pair_posterior_means[0], want_mean,
                               rtol=5e-3)
    assert r.per_pair_maps.shape == (2, res.sites)
    np.testing.assert_allclose(
        r.sum_of_posteriors,
        r.per_pair_posteriors.sum(axis=0), rtol=1e-4)


@pytest.mark.slow
def test_fastsmc_resume(repo_root, tmp_path, monkeypatch):
    """Kill the pipeline mid-run, resume, and get the identical output."""
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    # a denser panel: ~24 planted pairs so multiple batches flush
    rng = np.random.default_rng(5)
    n_ind, sites = 150, 640
    n_haps = 2 * n_ind
    freqs = rng.uniform(0.05, 0.5, sites)
    bits = (rng.random((n_haps, sites)) < freqs).astype(np.uint8)
    for i in range(24):
        a, b = rng.choice(n_haps, 2, replace=False)
        s0 = rng.integers(0, 128)
        bits[b, s0:s0 + 448] = bits[a, s0:s0 + 448]
    bp = (np.arange(sites) + 1) * 5000
    cm = np.linspace(0.0, 8.0, sites)
    root = str(tmp_path / "panel")
    with gzip.open(root + ".hap.gz", "wt") as f:
        for s in range(sites):
            f.write(f"1 SNP_{s} {bp[s]} A G "
                    + " ".join(str(int(x)) for x in bits[:, s]) + "\n")
    with open(root + ".samples", "w") as f:
        f.write("ID_1 ID_2 missing\n0 0 0\n")
        for i in range(n_ind):
            f.write(f"fam{i} ind{i} 0\n")
    with gzip.open(root + ".map.gz", "wt") as f:
        f.write("pos rate cm\n")
        for s in range(sites):
            f.write(f"{bp[s]}\t0\t{cm[s]}\n")
    dq = str(repo_root / "artifacts" / "n300.array.decodingQuantities.npz")

    def make(tag):
        return DecodingParams.fastsmc_defaults(
            root, dq, str(tmp_path / tag), use_known_seed=True, min_m=0.5,
            batch_size=8)

    # full run for the expected output
    f0 = FastSMC(make("full"), use_pallas=False)
    f0.run(verbose=False)
    want = gzip.open(f0.params.ibd_output_path(), "rb").read()  # decompressed
    total_batches = f0._batch_idx
    assert total_batches >= 2, "need multiple batches for this test"

    # interrupted run: raise after the second flush dispatch (batch 1's
    # deferred host finish ran inside flush 2, so its checkpoint exists;
    # batch 2 is lost in flight — exactly the crash the checkpoint covers)
    f1 = FastSMC(make("part"), use_pallas=False)
    orig_flush = f1._flush

    class Boom(Exception):
        pass

    def exploding_flush(n):
        orig_flush(n)
        if f1._batch_idx >= 2:
            raise Boom()

    f1._flush = exploding_flush
    with pytest.raises(Boom):
        f1.run(verbose=False)
    assert os.path.exists(f1.params.ibd_output_path() + ".progress")

    # resume with a fresh pipeline object
    f2 = FastSMC(make("part"), use_pallas=False)
    f2.run(verbose=False, resume=True)
    got = gzip.open(f2.params.ibd_output_path(), "rb").read()  # decompressed
    assert got == want
    assert not os.path.exists(f2.params.ibd_output_path() + ".progress")


@pytest.mark.slow
def test_fastsmc_device_hashing_backend_matches_host(synthetic_panel,
                                                     repo_root, tmp_path):
    """The sort-based device identification scan must yield the same IBD
    output file as the streaming host scan (same candidate set -> same
    validated segments; batch composition may differ, so compare the
    segment row sets)."""
    import gzip as _gz

    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    root, planted, bits = synthetic_panel
    dq = str(repo_root / "artifacts" / "n300.array.decodingQuantities.npz")

    def rows(out, backend):
        p = DecodingParams.fastsmc_defaults(
            root, dq, str(tmp_path / out), use_known_seed=True, min_m=0.5)
        path = FastSMC(p, use_pallas=False,
                       hashing_backend=backend).run(verbose=False)
        with _gz.open(path, "rt") as fh:
            # identity + interval columns (scores can differ in the last
            # ulp between batch windows)
            return sorted(tuple(l.split("\t")[:7])
                          for l in fh.read().splitlines())

    host = rows("h", "host")
    device = rows("d", "device")
    assert device == host


@pytest.mark.slow
def test_fastsmc_sort_batches_same_pairs(synthetic_panel, repo_root,
                                         tmp_path):
    """sort_batches reorders candidates into narrower batch windows; the
    permissive union window shrinks, so segment EXTENTS can shift at the
    margins, but the candidate count and the set of IBD pairs must be
    identical, and every planted pair must still be found."""
    import gzip as _gz

    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    root, planted, bits = synthetic_panel
    dq = str(repo_root / "artifacts" / "n300.array.decodingQuantities.npz")

    def run(out, sort_batches):
        p = DecodingParams.fastsmc_defaults(
            root, dq, str(tmp_path / out), use_known_seed=True, min_m=0.5,
            batch_size=8)
        # bucket_sites=0: this test pins the legacy sort-buffer ordering
        # (canonical-window bucketing is the default and is covered by
        # test_fastsmc_canonical_windows_batch_invariant)
        f = FastSMC(p, use_pallas=False, sort_batches=sort_batches,
                    bucket_sites=0)
        path = f.run(verbose=False)
        with _gz.open(path, "rt") as fh:
            lines = fh.read().splitlines()
        return f, sorted(set(tuple(l.split("\t")[:6]) for l in lines))

    f0, pairs0 = run("plain", 0)
    f1, pairs1 = run("sorted", 4)
    assert f0._cpt == f1._cpt, "candidate count changed"
    assert pairs0 == pairs1, "IBD pair set changed"
    # sorting must not increase the decoded-site waste
    w0 = f0.stats["decoded_site_pairs"] / f0.stats["cand_site_pairs"]
    w1 = f1.stats["decoded_site_pairs"] / f1.stats["cand_site_pairs"]
    assert w1 <= w0 + 1e-9, (w0, w1)


def test_pad_position_helpers_match_scalar_loops():
    """The vectorized 0.5 cM padding helpers (pad_from/to_positions,
    used per candidate for canonical windows) must agree with the
    reference's stepwise scalar walks (HmmUtils.cpp:153-177 mirrors) on
    irregular maps, including chromosome edges."""
    from fastsmc_tpu.pipelines.fastsmc import (
        get_from_position, get_to_position, pad_from_positions,
        pad_to_positions)

    rng = np.random.default_rng(11)
    for trial in range(5):
        L = int(rng.integers(50, 400))
        gaps = rng.exponential(2e-4, L - 1)
        gaps[rng.random(L - 1) < 0.1] *= 20          # occasional hot spots
        g = np.concatenate([[0.0], np.cumsum(gaps)])
        idx = rng.integers(0, L, 200)
        want_from = np.array([get_from_position(g, int(i)) for i in idx])
        want_to = np.array([get_to_position(g, int(i)) for i in idx])
        np.testing.assert_array_equal(pad_from_positions(g, idx), want_from)
        np.testing.assert_array_equal(pad_to_positions(g, idx), want_to)


@pytest.mark.slow
def test_fastsmc_canonical_windows_batch_invariant(synthetic_panel,
                                                   repo_root, tmp_path):
    """Canonical-window bucketing (the production default) makes the
    validated output a deterministic function of the candidate set: the
    RECORD SET is identical across batch sizes and across repeat runs
    (each candidate decodes over its canonical aligned block, never over
    a batch-composition-dependent union), every planted pair is found,
    and the candidate count is unchanged vs arrival order."""
    import gzip as _gz

    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    root, planted, bits = synthetic_panel
    dq = str(repo_root / "artifacts" / "n300.array.decodingQuantities.npz")

    def run(out, batch_size, **kw):
        p = DecodingParams.fastsmc_defaults(
            root, dq, str(tmp_path / out), use_known_seed=True, min_m=0.5,
            batch_size=batch_size)
        f = FastSMC(p, use_pallas=False, **kw)
        path = f.run(verbose=False)
        with _gz.open(path, "rt") as fh:
            lines = fh.read().splitlines()
        return f, lines

    f1, lines1 = run("bs8", 8)
    f2, lines2 = run("bs8_again", 8)
    f3, lines3 = run("bs32", 32)
    f0, lines0 = run("arrival", 8, bucket_sites=0)
    assert lines1 == lines2, "bucketed run not deterministic"
    # identity + interval columns identical across batch sizes; float
    # columns to f32 tiling ulps (XLA matmul micro-kernels differ per
    # batch width — the same class of deviation as the reference's
    # AVX-vs-NO_SSE builds, SURVEY §7.3)
    assert len(lines1) == len(lines3), "record count changed"
    for g, w in zip(sorted(lines1), sorted(lines3)):
        ga, wa = g.split("\t"), w.split("\t")
        assert ga[:9] == wa[:9], (g, w)
        for x, y in zip(ga[9:], wa[9:]):
            fx, fy = float(x), float(y)
            assert abs(fx - fy) <= 1e-5 * max(abs(fx), abs(fy), 1e-9), (g, w)
    assert f0._cpt == f1._cpt, "candidate count changed"
    # every planted pair must be detected
    found = {tuple(sorted((int(l.split("\t")[1][3:]) * 2 + int(l.split("\t")[2]) - 1,
                           int(l.split("\t")[4][3:]) * 2 + int(l.split("\t")[5]) - 1)))
             for l in lines1}
    for (a, b, s, e) in planted:
        assert tuple(sorted((a, b))) in found, f"planted pair {(a, b)} lost"


# ---------------------------------------------------------------------------
# default-suite smokes (NOT slow-marked): one end-to-end path always runs
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_panel(tmp_path_factory):
    """150 diploid samples (the n300 CSFS needs 300 haps) x 256 sites, one
    planted IBD pair — small enough for the default (fast) suite."""
    d = tmp_path_factory.mktemp("tiny_panel")
    rng = np.random.default_rng(7)
    n_ind, sites = 150, 256
    n_haps = 2 * n_ind
    freqs = rng.uniform(0.05, 0.5, sites)
    bits = (rng.random((n_haps, sites)) < freqs).astype(np.uint8)
    planted = [(3, 17, 32, 224)]
    for (a, b, s, e) in planted:
        bits[b, s:e] = bits[a, s:e]
    bp = (np.arange(sites) + 1) * 5000
    cm = np.linspace(0.0, 4.0, sites)
    root = str(d / "panel")
    with gzip.open(root + ".hap.gz", "wt") as f:
        for s in range(sites):
            alleles = " ".join(str(int(x)) for x in bits[:, s])
            f.write(f"1 SNP_{s} {bp[s]} A G {alleles}\n")
    with open(root + ".samples", "w") as f:
        f.write("ID_1 ID_2 missing\n0 0 0\n")
        for i in range(n_ind):
            f.write(f"fam{i} ind{i} 0\n")
    with gzip.open(root + ".map.gz", "wt") as f:
        f.write("pos rate cm\n")
        for s in range(sites):
            f.write(f"{bp[s]}\t0\t{cm[s]}\n")
    # second root with the ASMC 4-column map format (chr id cM pos,
    # Data.cpp:162-210) for non-FastSMC runs
    root2 = str(d / "panel_asmc")
    import shutil
    shutil.copy(root + ".hap.gz", root2 + ".hap.gz")
    shutil.copy(root + ".samples", root2 + ".samples")
    with gzip.open(root2 + ".map.gz", "wt") as f:
        for s in range(sites):
            f.write(f"1\tSNP_{s}\t{cm[s]}\t{bp[s]}\n")
    return root, root2, planted, bits


def test_fastsmc_smoke_default_suite(tiny_panel, repo_root, tmp_path):
    """Trimmed end-to-end FastSMC (hashing -> validation -> writer) that
    always runs in the default suite (VERDICT r1 #6)."""
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    root, _root2, planted, bits = tiny_panel
    params = DecodingParams.fastsmc_defaults(
        root, str(repo_root / "artifacts" /
                  "n300.array.decodingQuantities.npz"),
        str(tmp_path / "smoke"), use_known_seed=True, min_m=0.5,
        batch_size=16)
    f = FastSMC(params, use_pallas=False)
    path = f.run(verbose=False)
    with gzip.open(path, "rt") as fh:
        lines = [l.split("\t") for l in fh.read().splitlines()]
    assert lines, "no segments detected"
    # the planted pair must be recovered
    got_pairs = {(int(l[1].split("ind")[1]) * 2 + int(l[2]) - 1,
                  int(l[4].split("ind")[1]) * 2 + int(l[5]) - 1)
                 for l in lines}
    a, b = planted[0][0], planted[0][1]
    assert any({p, q} == {a, b} for p, q in got_pairs)


def test_asmc_per_pair_streaming_outputs(tiny_panel, repo_root, tmp_path):
    """ASMC decode_all_in_job streams .perPairPosteriorMeans.gz /
    .perPairMAP.gz (HMM.cpp:258-271, 1360-1419), validated against the
    scalar oracle; --expectedCoalTimesFile swaps the time scale
    (HMM.cpp:1741-1748)."""
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.engine.oracle import decode_pair
    from fastsmc_tpu.pipelines.asmc import ASMC

    _root, root, planted, bits = tiny_panel
    dq = str(repo_root / "artifacts" / "n300.array.decodingQuantities.npz")
    out = str(tmp_path / "pp")
    params = DecodingParams.asmc(
        root, dq, out, do_per_pair_posterior_mean=True, do_per_pair_map=True,
        within_only=True, use_known_seed=True)
    # batch 64 < 150 pairs forces a partial batch through the writer path
    a = ASMC(params, use_pallas=False, batch_size=64)
    a.decode_all_in_job(verbose=False)

    means = np.loadtxt(out + ".perPairPosteriorMeans.gz")
    maps = np.loadtxt(out + ".perPairMAP.gz")
    n_ind, L = 150, a.data.sites
    assert means.shape == (n_ind, L)
    assert maps.shape == (n_ind, L)

    expt = a.dq.expected_times
    for i in (0, 80, 149):  # spans full and partial batches
        post = decode_pair(a.ctx, 2 * i, 2 * i + 1)       # [K, L]
        want_mean = (post * expt[:, None]).sum(axis=0)
        np.testing.assert_allclose(means[i], want_mean, rtol=5e-3)
        np.testing.assert_array_equal(maps[i], post.argmax(axis=0))

    # expectedCoalTimesFile: 3-column intervals file, middle column used
    ect = str(tmp_path / "times.intervalsInfo")
    with open(ect, "w") as fh:
        for k, t in enumerate(expt):
            fh.write(f"{k}\t{2.0 * t}\t{k + 1}\n")
    out2 = str(tmp_path / "pp2")
    params2 = DecodingParams.asmc(
        root, dq, out2, expected_coal_times_file=ect, within_only=True,
        use_known_seed=True)
    assert params2.do_per_pair_posterior_mean  # implied (processOptions)
    a2 = ASMC(params2, use_pallas=False, batch_size=64)
    a2.decode_all_in_job(verbose=False)
    means2 = np.loadtxt(out2 + ".perPairPosteriorMeans.gz")
    np.testing.assert_allclose(means2, 2.0 * means, rtol=1e-4)


def test_fastsmc_fused_group_path_matches(tiny_panel, repo_root, tmp_path):
    """The grouped validation flow (per-batch decode + extract_packed +
    in-jit extraction, Pallas interpret mode on CPU) must reproduce the
    per-batch path: flush_group=2 (each batch dispatched at its own t_len
    bucket, one stacked drain) vs flush_group=1, exact same output lines;
    and the same segments as the XLA BatchedDecoder path."""
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    root, _root2, planted, bits = tiny_panel
    dq = str(repo_root / "artifacts" / "n300.array.decodingQuantities.npz")

    def run(tag, ages=True, **kw):
        params = DecodingParams.fastsmc_defaults(
            root, dq, str(tmp_path / tag), use_known_seed=True, min_m=0.5,
            batch_size=16)
        if not ages:
            params.do_per_pair_posterior_mean = False
            params.do_per_pair_map = False
        f = FastSMC(params, **kw)
        path = f.run(verbose=False)
        with gzip.open(path, "rt") as fh:
            return fh.read().splitlines()

    g2 = run("g2", use_pallas="interpret", flush_group=2)
    g1 = run("g1", use_pallas="interpret", flush_group=1)
    assert g2 == g1
    legacy = run("legacy", use_pallas=False)

    # ages-off exercises the vectorised run-array emit (_emit_runs /
    # write_block); must be byte-identical to the object path
    na_fused = run("na_fused", ages=False, use_pallas="interpret",
                   flush_group=2)
    na_legacy = run("na_legacy", ages=False, use_pallas=False)
    assert [l.split("\t")[:9] for l in na_fused] == \
        [l.split("\t")[:9] for l in na_legacy]
    for lf, ll in zip(na_fused, na_legacy):
        np.testing.assert_allclose(
            [float(x) for x in lf.split("\t")[9:]],
            [float(x) for x in ll.split("\t")[9:]], rtol=2e-3, atol=2e-4)

    def keyed(lines):
        return {tuple(l.split("\t")[:7]) for l in lines}

    assert keyed(g1) == keyed(legacy)
    # scores/ages agree to float tolerance across engines
    got = {tuple(l.split("\t")[:7]): [float(x) for x in l.split("\t")[7:]]
           for l in g1}
    want = {tuple(l.split("\t")[:7]): [float(x) for x in l.split("\t")[7:]]
            for l in legacy}
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("seg_cap,pps_cap", [(256, 1024), (1024, 256),
                                             (256, 256)])
def test_fastsmc_fused_cap_mismatch(tiny_panel, repo_root, tmp_path,
                                    seg_cap, pps_cap):
    """Regression for the round-3 shipped crash: the extraction cap and
    the pps cap are sized independently (`_seg_cap` vs `_pps_cap`), and
    `extract_packed` must accept every combination — `cap < pps_cap`
    reshaped a cap-long run array to pps_cap inside `run_pps_jax` and
    blew up on the reference's DEFAULT output profile (ages on,
    DecodingParams.cpp:56-63). Output must match the legacy path for
    every cap combination, including ones that force the overflow redo
    (seg_cap=256 on this panel overflows some flushes)."""
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    root, _root2, planted, bits = tiny_panel
    dq = str(repo_root / "artifacts" / "n300.array.decodingQuantities.npz")

    def run(tag, caps=None):
        params = DecodingParams.fastsmc_defaults(
            root, dq, str(tmp_path / tag), use_known_seed=True, min_m=0.5,
            batch_size=16)
        f = FastSMC(params, use_pallas="interpret", flush_group=2)
        if caps:
            f._seg_cap, f._pps_cap = caps
        path = f.run(verbose=False)
        with gzip.open(path, "rt") as fh:
            return fh.read().splitlines(), f

    want, _ = run("legacy")
    got, f = run(f"c{seg_cap}_{pps_cap}", caps=(seg_cap, pps_cap))
    keyed_w = {tuple(l.split("\t")[:7]): [float(x) for x in l.split("\t")[7:]]
               for l in want}
    keyed_g = {tuple(l.split("\t")[:7]): [float(x) for x in l.split("\t")[7:]]
               for l in got}
    assert keyed_g.keys() == keyed_w.keys()
    for k, v in keyed_w.items():
        np.testing.assert_allclose(keyed_g[k], v, rtol=2e-3, atol=2e-4)


def test_fastsmc_fused_overflow_redo(tiny_panel, repo_root, tmp_path,
                                     monkeypatch):
    """The seg-cap overflow redo in `_drain_group` (extract_segments_device
    + re-decode + _fill_pps) ships unexercised at real cap sizes — the
    tiny panel peaks at ~32 runs/flush. Fault-inject an overflow by
    reporting n > cap from the unpacker for the first flush: the redo must
    recompute that flush from th and produce output identical to the
    legacy path, and the caps must grow."""
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.engine import segments as seg
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    root, _root2, planted, bits = tiny_panel
    dq = str(repo_root / "artifacts" / "n300.array.decodingQuantities.npz")

    def run(tag, inject=False):
        params = DecodingParams.fastsmc_defaults(
            root, dq, str(tmp_path / tag), use_known_seed=True, min_m=0.5,
            batch_size=16)
        f = FastSMC(params, use_pallas="interpret", flush_group=2)
        if inject:
            orig = seg.unpack_extract_rows
            state = {"fired": False}

            def spy(row, cap):
                start, b, score, nk, nneed = orig(row, cap)
                if not state["fired"]:
                    state["fired"] = True
                    return start, b, score, nk, cap + 1  # force redo
                return start, b, score, nk, nneed

            monkeypatch.setattr(seg, "unpack_extract_rows", spy)
        path = f.run(verbose=False)
        if inject:
            monkeypatch.setattr(seg, "unpack_extract_rows", orig)
            assert state["fired"]
            assert f._seg_cap > 4096          # overflow grew the cap
        with gzip.open(path, "rt") as fh:
            return fh.read().splitlines()

    want = run("plain")
    got = run("overflow", inject=True)
    keyed_w = {tuple(l.split("\t")[:7]): [float(x) for x in l.split("\t")[7:]]
               for l in want}
    keyed_g = {tuple(l.split("\t")[:7]): [float(x) for x in l.split("\t")[7:]]
               for l in got}
    assert keyed_g.keys() == keyed_w.keys()
    for k, v in keyed_w.items():
        np.testing.assert_allclose(keyed_g[k], v, rtol=2e-3, atol=2e-4)


def test_no_hashing_enumeration_vectorized(tiny_panel, repo_root, tmp_path):
    """The no-hashing path must (a) enumerate the job's pairs via the
    closed-form flat-index inversion — parity with a transliteration of
    the reference loop (HMM.cpp:310-364) across Ns and job splits — and
    (b) run end-to-end producing the planted segment."""
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.asmc import ASMC
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    def naive(N, within_only):
        out = []
        for i in range(N):
            if not within_only:
                for j in range(i):
                    for ihap in (0, 1):
                        for jhap in (0, 1):
                            out.append((2 * j + jhap, 2 * i + ihap))
            out.append((2 * i, 2 * i + 1))
        return out

    for N in (1, 2, 3, 17, 150):
        for wo in (False, True):
            tot = N if wo else 2 * N * N - N
            want = naive(N, wo)
            assert len(want) == tot
            h1, h2 = ASMC.pairs_from_flat_indices(
                np.arange(tot, dtype=np.int64), wo)
            assert list(zip(h1.tolist(), h2.tolist())) == want
            # job split: concatenated job ranges tile the enumeration
            for jobs in (3,):
                got = []
                for job in range(1, jobs + 1):
                    s = tot * (job - 1) // jobs
                    e = tot * job // jobs
                    j1, j2 = ASMC.pairs_from_flat_indices(
                        np.arange(s, e, dtype=np.int64), wo)
                    got += list(zip(j1.tolist(), j2.tolist()))
                assert got == want

    root, _root2, planted, bits = tiny_panel
    dq = str(repo_root / "artifacts" / "n300.array.decodingQuantities.npz")
    params = DecodingParams.fastsmc_defaults(
        root, dq, str(tmp_path / "nh"), use_known_seed=True, min_m=0.5,
        batch_size=64)
    params.hashing = False
    params.within_only = True          # 150 within pairs: fast
    f = FastSMC(params, use_pallas=False)
    path = f.run(verbose=False)
    with gzip.open(path, "rt") as fh:
        lines = fh.read().splitlines()
    assert lines  # within pairs of 150 diploids yield IBD-dense output


def test_fastsmc_fused_binary_ages_matches_legacy(tiny_panel, repo_root,
                                                  tmp_path):
    """The fused array-only drain now covers the binary writer and the
    age columns (reference default profile, HMM.cpp:1179-1357): a fused
    binary run must carry the same records as the legacy per-record
    binary path, ages included."""
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.io.writers import BinaryDataReader
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    root, _root2, planted, bits = tiny_panel
    dq = str(repo_root / "artifacts" / "n300.array.decodingQuantities.npz")

    def run(tag, **kw):
        params = DecodingParams.fastsmc_defaults(
            root, dq, str(tmp_path / tag), use_known_seed=True, min_m=0.5,
            batch_size=16, bin_out=True)
        f = FastSMC(params, **kw)
        path = f.run(verbose=False)
        return [l.to_string() for l in BinaryDataReader(path)]

    fused = run("fused", use_pallas="interpret", flush_group=2)
    legacy = run("legacy", use_pallas=False)
    keyed_f = {tuple(l.split("\t")[:7]): [float(x) for x in l.split("\t")[7:]]
               for l in fused}
    keyed_l = {tuple(l.split("\t")[:7]): [float(x) for x in l.split("\t")[7:]]
               for l in legacy}
    assert keyed_f.keys() == keyed_l.keys() and keyed_f
    for k, v in keyed_l.items():
        np.testing.assert_allclose(keyed_f[k], v, rtol=2e-3, atol=2e-4)


def test_fastsmc_posterior_budget_split_matches(repo_root, tmp_path):
    """The age-estimates posterior guard splits wide-union batches down
    the pair axis (HBM cannot hold [8192, K, 8192] f32). With a tiny
    budget every flush splits repeatedly; the output must still carry the
    same IBD pairs as the unsplit run (each sub-batch scans its own,
    narrower union — same permissive-window contract)."""
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    # dense panel: ~24 planted pairs so a batch holds many candidates
    rng = np.random.default_rng(5)
    n_ind, sites = 150, 640
    n_haps = 2 * n_ind
    freqs = rng.uniform(0.05, 0.5, sites)
    bits = (rng.random((n_haps, sites)) < freqs).astype(np.uint8)
    for i in range(24):
        a, b = rng.choice(n_haps, 2, replace=False)
        s0 = rng.integers(0, 128)
        bits[b, s0:s0 + 448] = bits[a, s0:s0 + 448]
    bp = (np.arange(sites) + 1) * 5000
    cm = np.linspace(0.0, 8.0, sites)
    root = str(tmp_path / "panel")
    with gzip.open(root + ".hap.gz", "wt") as f:
        for s in range(sites):
            f.write(f"1 SNP_{s} {bp[s]} A G "
                    + " ".join(str(int(x)) for x in bits[:, s]) + "\n")
    with open(root + ".samples", "w") as f:
        f.write("ID_1 ID_2 missing\n0 0 0\n")
        for i in range(n_ind):
            f.write(f"fam{i} ind{i} 0\n")
    with gzip.open(root + ".map.gz", "wt") as f:
        f.write("pos rate cm\n")
        for s in range(sites):
            f.write(f"{bp[s]}\t0\t{cm[s]}\n")
    dq = str(repo_root / "artifacts" / "n300.array.decodingQuantities.npz")

    def run(tag, budget=None):
        params = DecodingParams.fastsmc_defaults(
            root, dq, str(tmp_path / tag), use_known_seed=True, min_m=0.5,
            batch_size=1024)
        f = FastSMC(params, use_pallas="interpret", flush_group=2)
        if budget:
            f._post_budget = budget
            # the underfull-batch shrink already drops this panel's ~50
            # candidates to the 256 pad floor (which fits any budget);
            # lower the floor so the recursive split machinery still runs
            f._pad_floor = 8
        path = f.run(verbose=False)
        with gzip.open(path, "rt") as fh:
            return f, fh.read().splitlines()

    f0, want = run("nosplit")
    f1, got = run("split", budget=64)   # forces splits down to pad 64
    assert f1.stats["flushes"] > f0.stats["flushes"]
    pairs_w = {tuple(l.split("\t")[:6]) for l in want}
    pairs_g = {tuple(l.split("\t")[:6]) for l in got}
    assert pairs_g == pairs_w


def test_ages_never_change_detection(repo_root, tmp_path):
    """Age estimates add columns, not segments: with identical batching
    (equal split budgets) the ages-on run must carry exactly the same
    intervals as ages-off (reference semantics: the segment state machine
    never reads the age columns, HMM.cpp:1179-1357)."""
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    rng = np.random.default_rng(5)
    n_ind, sites = 150, 640
    n_haps = 2 * n_ind
    freqs = rng.uniform(0.05, 0.5, sites)
    bits = (rng.random((n_haps, sites)) < freqs).astype(np.uint8)
    for i in range(24):
        a, b = rng.choice(n_haps, 2, replace=False)
        s0 = rng.integers(0, 128)
        bits[b, s0:s0 + 448] = bits[a, s0:s0 + 448]
    bp = (np.arange(sites) + 1) * 5000
    cm = np.linspace(0.0, 8.0, sites)
    root = str(tmp_path / "panel")
    with gzip.open(root + ".hap.gz", "wt") as f:
        for s in range(sites):
            f.write(f"1 SNP_{s} {bp[s]} A G "
                    + " ".join(str(int(x)) for x in bits[:, s]) + "\n")
    with open(root + ".samples", "w") as f:
        f.write("ID_1 ID_2 missing\n0 0 0\n")
        for i in range(n_ind):
            f.write(f"fam{i} ind{i} 0\n")
    with gzip.open(root + ".map.gz", "wt") as f:
        f.write("pos rate cm\n")
        for s in range(sites):
            f.write(f"{bp[s]}\t0\t{cm[s]}\n")
    dq = str(repo_root / "artifacts" / "n300.array.decodingQuantities.npz")

    ivs = {}
    for ages in (False, True):
        p = DecodingParams.fastsmc_defaults(
            root, dq, str(tmp_path / f"o{ages}"), use_known_seed=True,
            min_m=0.5, batch_size=64)
        if not ages:
            p.do_per_pair_posterior_mean = False
            p.do_per_pair_map = False
            p.output_ibd_segment_length = False
        f = FastSMC(p, use_pallas="interpret", flush_group=2)
        f._alpha_budget = f._post_budget    # identical split schedule
        path = f.run(verbose=False)
        with gzip.open(path, "rt") as fh:
            ivs[ages] = {tuple(l.split("\t")[:9])
                         for l in fh.read().splitlines()}
    assert ivs[True] == ivs[False]
