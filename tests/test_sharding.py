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
