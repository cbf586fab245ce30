"""Decoder engines vs the scalar oracle (CPU)."""

import numpy as np
import pytest

from fastsmc_tpu.engine.oracle import decode_pair
from fastsmc_tpu.engine.hmm import BatchedDecoder, bucket_len
from fastsmc_tpu.engine.dense import build_dense_operators


def test_oracle_posterior_normalised(n300_ctx):
    post = decode_pair(n300_ctx, 1, 2, 500, 700)
    assert post.shape == (69, 200)
    np.testing.assert_allclose(post.sum(axis=0), 1.0, atol=1e-5)


def test_dense_operators_match_recurrences(n300_dq):
    dq = n300_dq
    K = dq.states
    g = 1234
    Tf, Tb = build_dense_operators(dq.D[g:g + 1], dq.B[g:g + 1],
                                   dq.U[g:g + 1], dq.RR[g:g + 1],
                                   dq.column_ratios)
    rng = np.random.default_rng(0)
    prev = rng.random(K).astype(np.float32)
    # forward recurrence (HMM.cpp:1611-1633)
    D, B, U, CR = dq.D[g], dq.B[g], dq.U[g], dq.column_ratios
    alpha_c = np.zeros(K + 1, np.float32)
    alpha_c[K - 1] = prev[K - 1]
    for k in range(K - 2, -1, -1):
        alpha_c[k] = alpha_c[k + 1] + prev[k]
    want = np.zeros(K, np.float32)
    au = np.float32(0)
    for k in range(K):
        if k:
            au = np.float32(U[k - 1] * prev[k - 1] + CR[k - 1] * au)
        term = au + np.float32(D[k] * prev[k])
        if k < K - 1:
            term = np.float32(term + B[k] * alpha_c[k + 1])
        want[k] = term
    got = Tf[0] @ prev
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-10)

    # backward recurrence (HMM.cpp:1692-1721)
    vec = rng.random(K).astype(np.float32)
    RR = dq.RR[g]
    bl = np.zeros(K, np.float32)
    s = np.float32(0)
    for k in range(1, K):
        s = np.float32(s + B[k - 1] * vec[k - 1])
        bl[k] = s
    bu = np.zeros(K, np.float32)
    for k in range(K - 2, -1, -1):
        bu[k] = np.float32(vec[k + 1] * U[k] + RR[k] * bu[k + 1])
    wantb = bl + vec * D + bu
    gotb = Tb[0] @ vec
    np.testing.assert_allclose(gotb, wantb, rtol=2e-5, atol=1e-10)


@pytest.mark.slow
def test_batched_decoder_matches_oracle_window(n300_ctx):
    dec = BatchedDecoder(n300_ctx)
    pa = np.array([1, 3, 10, 21, 40, 33, 7, 9], dtype=np.int32)
    pb = np.array([2, 4, 11, 22, 41, 133, 107, 209], dtype=np.int32)
    post = np.asarray(dec.decode_pairs(pa, pb, 100, 256))
    for i in range(len(pa)):
        ref = decode_pair(n300_ctx, int(pa[i]), int(pb[i]), 100, 356)
        np.testing.assert_allclose(post[:, :, i].T, ref, atol=2e-4)


@pytest.mark.slow
def test_pallas_interpret_matches_oracle_window(n300_ctx):
    from fastsmc_tpu.engine.kernels import PallasDecoder, BwdOutputs
    dec = PallasDecoder(n300_ctx, interpret=True)
    pa = np.array([1, 3, 10, 21, 40, 33, 7, 9] * 16, dtype=np.int32)
    pb = np.array([2, 4, 11, 22, 41, 133, 107, 209] * 16, dtype=np.int32)
    outs = BwdOutputs(posterior=True, posterior_sums=True,
                      per_pair_mean=True, threshold_sums=True,
                      major_minor_sums=True)
    r = dec.decode_pairs(pa, pb, 100, 128, outs, 10)
    post = np.asarray(r["posterior"])
    ref = decode_pair(n300_ctx, 1, 2, 100, 228)
    np.testing.assert_allclose(post[:, :, 0].T, ref, atol=2e-4)
    # reductions consistent with the posterior
    np.testing.assert_allclose(np.asarray(r["posterior_sums"]),
                               post.sum(axis=2), rtol=1e-3, atol=1e-3)
    th = np.asarray(r["threshold_sums"])
    np.testing.assert_allclose(th, post[:, :10, :].sum(axis=1),
                               rtol=1e-3, atol=1e-5)
    mm = np.asarray(r["major_minor_sums"])
    np.testing.assert_allclose(mm.sum(axis=1), post.sum(axis=2),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_pallas_interpret_turbo_profile(n300_ctx):
    """Turbo profile (pure-bf16 single-pass matmuls): per-step
    normalization keeps the recursion stable, posterior within ~2e-2 of
    the exact oracle (segment-level quality is pinned on hardware by
    scripts/profile_accuracy_probe.py)."""
    from fastsmc_tpu.engine.kernels import PallasDecoder, BwdOutputs
    dec = PallasDecoder(n300_ctx, interpret=True, precision="turbo")
    pa = np.array([1, 3, 10, 21, 40, 33, 7, 9] * 16, dtype=np.int32)
    pb = np.array([2, 4, 11, 22, 41, 133, 107, 209] * 16, dtype=np.int32)
    r = dec.decode_pairs(pa, pb, 100, 128, BwdOutputs(posterior=True), 0)
    post = np.asarray(r["posterior"], np.float32)
    for i in (0, 5):
        ref = decode_pair(n300_ctx, int(pa[i]), int(pb[i]), 100, 228)
        np.testing.assert_allclose(post[:, :, i].T, ref, atol=2e-2)


def test_bucket_len():
    assert bucket_len(1) == 64
    assert bucket_len(64) == 64
    assert bucket_len(65) == 128
    assert bucket_len(6760) == 8192
