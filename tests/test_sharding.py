"""Multi-device pair-parallel decoding on the 8-device virtual CPU mesh."""

import numpy as np
import pytest


def test_sharded_posterior_sums_match_single_device(n300_ctx):
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs multi-device mesh")
    from fastsmc_tpu.engine.hmm import BatchedDecoder
    from fastsmc_tpu.parallel.sharding import ShardedDecoder, make_mesh

    mesh = make_mesh(4)
    sd = ShardedDecoder(n300_ctx, mesh)
    P = 16
    rng = np.random.default_rng(0)
    ha = rng.integers(0, n300_ctx.data.n_haps, P).astype(np.int32)
    hb = (ha + 3) % n300_ctx.data.n_haps

    sums = np.asarray(sd.posterior_sums(ha, hb, 100, 128))
    assert sums.shape == (128, 69)

    dec = BatchedDecoder(n300_ctx)
    post = np.asarray(dec.decode_pairs(ha, hb, 100, 128))
    np.testing.assert_allclose(sums, post.sum(axis=2), rtol=1e-4, atol=1e-4)


def test_sharded_per_pair_outputs(n300_ctx):
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs multi-device mesh")
    from fastsmc_tpu.engine.hmm import BatchedDecoder
    from fastsmc_tpu.parallel.sharding import ShardedDecoder, make_mesh

    mesh = make_mesh(4)
    sd = ShardedDecoder(n300_ctx, mesh)
    P = 8
    ha = np.arange(P, dtype=np.int32)
    hb = ha + 50
    th, mean = sd.per_pair_outputs(ha, hb, 200, 64, 10)
    th, mean = np.asarray(th), np.asarray(mean)
    assert th.shape == (64, P) and mean.shape == (64, P)

    dec = BatchedDecoder(n300_ctx)
    post = np.asarray(dec.decode_pairs(ha, hb, 200, 64))
    np.testing.assert_allclose(th, post[:, :10, :].sum(axis=1),
                               rtol=1e-4, atol=1e-5)
    expt = n300_ctx.dq.expected_times
    np.testing.assert_allclose(
        mean, np.einsum("tkp,k->tp", post, expt), rtol=1e-3)


def test_training_step_runs(n300_ctx):
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    from fastsmc_tpu.parallel.sharding import make_mesh, training_step

    mesh = make_mesh(min(8, len(jax.devices())))
    step, args = training_step(n300_ctx, mesh)
    out = step(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_multihost_tile_assignment_partitions_all_jobs():
    from fastsmc_tpu.parallel.multihost import job_tiles_for_process
    for procs, tpp in [(1, 1), (2, 2), (4, 1), (3, 3), (8, 2)]:
        all_tiles = []
        jobs_vals = set()
        for p in range(procs):
            tiles, jobs = job_tiles_for_process(p, procs, tpp)
            all_tiles.extend(tiles)
            jobs_vals.add(jobs)
        assert len(jobs_vals) == 1
        jobs = jobs_vals.pop()
        assert sorted(all_tiles) == list(range(1, jobs + 1))
        assert jobs >= procs * tpp


def test_multihost_merge_concatenates_gzip(tmp_path):
    import gzip

    from fastsmc_tpu.parallel.multihost import merge_ibd_outputs
    paths = []
    for i in range(3):
        p = str(tmp_path / f"part{i}.ibd.gz")
        with gzip.open(p, "wt") as f:
            f.write(f"line{i}\n")
        paths.append(p)
    out = merge_ibd_outputs(paths, str(tmp_path / "merged.ibd.gz"))
    with gzip.open(out, "rt") as f:
        assert f.read().splitlines() == ["line0", "line1", "line2"]


def test_multihost_fastsmc_tiles_cover_single_job(synthetic_panel_root):
    """Per-process multihost runs over 4 'hosts' detect the same IBD pair
    set as a single job (segment *splitting* can differ across tilings —
    the batch-union permissive window depends on batch composition, as in
    the reference, HMM.cpp:1199-1204)."""
    import gzip

    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.parallel.multihost import (merge_ibd_outputs,
                                                run_fastsmc_multihost)
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    root, dq_path, tmp = synthetic_panel_root

    def pair_ids(path):
        with gzip.open(path, "rt") as fh:
            return set(tuple(l.split("\t")[:7])
                       for l in fh.read().splitlines())

    single = DecodingParams.fastsmc_defaults(
        root, dq_path, str(tmp / "single"), use_known_seed=True, min_m=0.5)
    single_ids = pair_ids(FastSMC(single, use_pallas=False).run(
        verbose=False))

    paths = []
    for pid in range(4):
        params = DecodingParams.fastsmc_defaults(
            root, dq_path, str(tmp / "mh"), use_known_seed=True, min_m=0.5)
        paths += run_fastsmc_multihost(params, process_id=pid,
                                       num_processes=4, use_pallas=False)
    merged = merge_ibd_outputs(paths, str(tmp / "merged.ibd.gz"))
    assert pair_ids(merged) == single_ids
    assert len(single_ids) > 0


def assert_ibd_equal(got: str, want: str, rtol: float = 2e-5):
    """Token-wise IBD-file comparison: identity columns exactly, float
    columns to `rtol` — the single-device run extracts segments on host
    (f64-differencing scores) while the mesh run extracts on device
    (f32 HIGHEST indicator-einsum, engine/segments.py), so the score's
    last printed digit may differ. The reference's own python regression
    compares float columns with allclose too (test_regression.py:15-113)."""
    gl, wl = got.splitlines(), want.splitlines()
    assert len(gl) == len(wl), f"{len(gl)} vs {len(wl)} lines"
    for g, w in zip(gl, wl):
        gt, wt = g.split("\t"), w.split("\t")
        assert len(gt) == len(wt), (g, w)
        for a, b in zip(gt, wt):
            if a == b:
                continue
            fa, fb = float(a), float(b)   # raises -> genuine mismatch
            assert abs(fa - fb) <= rtol * max(abs(fa), abs(fb)), (g, w)


def test_fastsmc_mesh_pipeline_matches_single_device(synthetic_panel_root):
    """The production FastSMC pipeline with mesh=N produces the same IBD
    output as the single-device run (per-pair math is independent of how
    the batch is sharded; scores compared to float tolerance — see
    assert_ibd_equal)."""
    import gzip

    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs multi-device mesh")
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.parallel.sharding import make_mesh
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    root, dq_path, tmp = synthetic_panel_root

    def run(tag, mesh):
        p = DecodingParams.fastsmc_defaults(
            root, dq_path, str(tmp / tag), use_known_seed=True, min_m=0.5,
            batch_size=16)
        path = FastSMC(p, use_pallas=False, mesh=mesh).run(verbose=False)
        with gzip.open(path, "rt") as fh:
            return fh.read()

    single = run("sd_single", None)
    sharded = run("sd_mesh", make_mesh(4))
    assert_ibd_equal(sharded, single)
    assert single.count("\n") > 0


def test_asmc_mesh_decode_all_matches_single_device(synthetic_panel_root):
    """ASMC decode_all_in_job over a mesh: psum'd posterior sums and the
    sharded per-pair output files match the single-device run."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs multi-device mesh")
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.parallel.sharding import make_mesh
    from fastsmc_tpu.pipelines.asmc import ASMC

    root, dq_path, tmp = synthetic_panel_root

    from fastsmc_tpu.io.haps import load_data

    def run(tag, mesh):
        p = DecodingParams.asmc(
            root, dq_path, str(tmp / tag), do_posterior_sums=True,
            do_per_pair_posterior_mean=True, do_per_pair_map=True,
            within_only=True, use_known_seed=True, fastsmc=True)
        # fastsmc=True selects the FastSMC 3-col map format at load time;
        # per-pair file streaming is a non-FastSMC feature, so flip the
        # flag after loading
        data = load_data(p)
        p.fastsmc = False
        a = ASMC(p, data=data, use_pallas=False, batch_size=64, mesh=mesh)
        res = a.decode_all_in_job(verbose=False)
        means = np.loadtxt(str(tmp / tag) + ".perPairPosteriorMeans.gz")
        maps = np.loadtxt(str(tmp / tag) + ".perPairMAP.gz")
        return res.sum_over_pairs, means, maps

    s1, m1, mp1 = run("asmc_single", None)
    s2, m2, mp2 = run("asmc_mesh", make_mesh(4))
    np.testing.assert_allclose(s2, s1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(m2, m1, rtol=1e-5)
    # MAP argmax can flip at exact posterior near-ties (1-ulp differences
    # between XLA fusion choices inside vs outside shard_map)
    assert (mp2 != mp1).mean() < 1e-3
