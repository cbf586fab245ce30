"""Conditioned-SFS computation (prepare/conditioned_sfs.py).

Fast identity tests at small n; the full n=300 golden comparison against
the shipped smcpp-generated 30-100-2000.csfs takes ~10+ min and runs only
with FASTSMC_RUN_CSFS_GOLDEN=1 (see scripts/csfs_golden_check.py)."""

import os

import numpy as np
import pytest

from fastsmc_tpu.prepare.conditioned_sfs import (
    ConditionedSFS, _q_same, block_weights, write_csfs)


N_SMALL = 8
NE = 1000.0
MU = 1e-6
DISC = np.array([0.0, 500.0, 2000.0, 6000.0])


@pytest.fixture(scope="module")
def small():
    c = ConditionedSFS([0.0], [NE], DISC, N_SMALL, mu=MU,
                       max_efolds=1.0, order=8)
    return c, c.compute()


def test_block_weight_identities():
    n = N_SMALL
    V2, V1 = block_weights(n)
    ks = np.arange(2, n + 1)
    assert np.allclose(V2.sum(axis=(1, 2)), ks)          # sum N = k
    assert np.allclose(V1.sum(axis=(1, 2)), ks[:-1])
    w = (np.arange(3)[None, :, None] + np.arange(n - 1)[None, None, :])
    assert np.allclose((V2 * w).sum(axis=(1, 2)), n)     # sum (a+b) N = n
    assert np.allclose((V1 * w).sum(axis=(1, 2)), n)


def test_mixture_recovers_unconditional_block_counts():
    from scipy.special import comb
    n = N_SMALL
    V2, V1 = block_weights(n)
    p2k = 1 - _q_same(n, np.arange(2, n + 1))
    for k in (2, 4, 7):
        i = k - 2
        mix = p2k[i] * V2[i]
        if k <= n - 1:
            mix = mix + (1 - p2k[i]) * V1[i]
        for a in range(3):
            for b in range(n - 1):
                sz = a + b
                if sz < 1 or sz > n - k + 1:
                    continue
                exact = (k * comb(n - sz - 1, k - 2) / comb(n - 1, k - 1)
                         * comb(2, a) * comb(n - 2, b) / comb(n, sz))
                assert mix[a, b] == pytest.approx(exact, abs=1e-12)


def test_interval_probabilities_exponential(small):
    c, _ = small
    # constant size: tau ~ Exp(1/NE) per generation (size is
    # coalescent-scaled: pair rate 1/size)
    R = DISC / NE
    pt = np.exp(-R) - np.append(np.exp(-R[1:]), 0.0)
    assert np.allclose(c._debug["Ptau"], pt, rtol=1e-8)


def test_unconditional_spectrum_recovered(small):
    c, mats = small
    n = N_SMALL
    tot = np.zeros((3, n - 1))
    for M, p in zip(mats, c._debug["Ptau"]):
        M = np.asarray(M).copy()
        M[0, 0] = 0.0
        tot += M * p
    # frequency spectrum theta/d with theta = size * mu (pair rate 1/size)
    for d in range(1, n):
        s = sum(tot[a, d - a] for a in range(3) if 0 <= d - a <= n - 2)
        assert s == pytest.approx(2 * NE * MU / d, rel=1e-4)


def test_rows_nonnegative_and_normalized(small):
    _, mats = small
    for M in mats:
        M = np.asarray(M)
        assert np.all(M[1:] >= -1e-15)
        assert np.all(M[0, 1:] >= -1e-15)
        assert M.sum() == pytest.approx(1.0, abs=1e-12)


def test_csfs_file_roundtrip(tmp_path, small):
    from fastsmc_tpu.prepare.csfs import CSFS
    c, mats = small
    path = str(tmp_path / "t.csfs")
    write_csfs(path, [0.0], [NE], MU, N_SMALL, DISC, mats)
    loaded = CSFS.load(path)
    assert loaded.samples == N_SMALL
    keys = loaded.keys()
    assert len(keys) == len(DISC)
    for i, k in enumerate(keys):
        assert np.allclose(loaded.entries[k].csfs, mats[i])
    # verify() mirrors the prepare pipeline, which passes inf-appended
    # arrays from read_demography/read_discretization
    assert loaded.verify([0.0, np.inf], [NE, NE], MU, N_SMALL,
                         np.append(DISC, np.inf))


@pytest.mark.skipif(os.environ.get("FASTSMC_RUN_CSFS_GOLDEN") != "1",
                    reason="n=300 golden comparison takes ~20 min")
def test_golden_csfs_n300():
    """Validated 2026-08: worst relative error 1.45e-9 over all 69
    intervals x 3 x 299 entries vs the shipped smcpp output."""
    from fastsmc_tpu.prepare.csfs import CSFS
    demo = np.loadtxt("/root/reference/FILES/CEU.demo")
    disc = np.loadtxt("/root/reference/FILES/DISC/30-100-2000.disc")
    golden = CSFS.load(
        "/root/reference/FILES/DECODING_QUANTITIES/30-100-2000.csfs")
    c = ConditionedSFS(demo[:, 0], demo[:, 1], disc, golden.samples,
                       mu=1.65e-8)
    mats = c.compute()
    for i, k in enumerate(golden.keys()):
        g = golden.entries[k].csfs
        m = np.asarray(mats[i])
        mask = np.abs(g) > 1e-10
        rel = np.max(np.abs(m[mask] - g[mask]) / np.abs(g[mask]))
        assert rel < 1e-6, f"interval {i}: rel err {rel}"
