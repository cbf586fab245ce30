"""Model-preparation math vs reference golden artifacts."""

import numpy as np
import pytest

from fastsmc_tpu.prepare.transition import (Transition, read_demography,
                                            read_discretization)
from fastsmc_tpu.prepare.csfs import CSFS, compute_classic_emission

REF = "/root/reference/FILES"


@pytest.fixture(scope="module")
def transition():
    tv, sv = read_demography(f"{REF}/CEU.demo")
    disc = read_discretization(f"{REF}/DISC/30-100-2000.disc")
    return Transition(tv, sv, disc)


def test_expected_times_match_golden_intervals_info(transition):
    golden = np.loadtxt(f"{REF}/DECODING_QUANTITIES/30-100-2000.intervalsInfo")
    # bit-exact float64 agreement with the Java tool's output
    np.testing.assert_array_equal(transition.expected_times, golden[:, 1])
    np.testing.assert_array_equal(transition.discretization[:-1], golden[:, 0])


def test_initial_state_prob_sums_to_one(transition):
    isp = transition.initial_state_prob()
    assert isp.shape == (69,)
    assert abs(isp.sum() - 1.0) < 1e-12
    assert (isp > 0).all()


def test_coal_dist_matches_initial_state_prob(transition):
    np.testing.assert_allclose(transition.get_coal_dist(),
                               transition.initial_state_prob(), rtol=1e-14)


def test_identity_at_zero_distance(transition):
    D, B, U, RR = transition.decoding_quantities_batch(np.array([0.0]))
    np.testing.assert_allclose(D[0], np.ones(69), atol=1e-12)
    np.testing.assert_allclose(B[0], np.zeros(68), atol=1e-12)
    np.testing.assert_allclose(U[0], np.zeros(68), atol=1e-12)
    # Java leaves RR[states-2] at 0 (loop bound i < states-2,
    # Transition.java:183-195)
    np.testing.assert_allclose(RR[0][:67], np.ones(67), atol=1e-12)
    assert RR[0][67] == 0.0


def test_transition_rows_are_stochastic(transition):
    """Each forward operator row must sum to ~1 (it is a probability
    distribution over next states)."""
    from fastsmc_tpu.engine.dense import build_dense_operators
    # Note: the D/B/U/RR factorization's geometric tails are only an
    # approximation of the dense transition at large rho, so rows are
    # near-stochastic only for small distances (the reference relies on
    # per-step normalization to absorb the drift).
    r = np.array([1e-8])
    D, B, U, RR = transition.decoding_quantities_batch(r)
    K = transition.states
    Dp = D.astype(np.float32)
    pad = lambda m: np.pad(m, ((0, 0), (0, 1))).astype(np.float32)
    Tf, Tb = build_dense_operators(Dp, pad(B), pad(U), pad(RR),
                                   np.pad(transition.column_ratios,
                                          (0, 1)).astype(np.float32))
    sums = Tf.sum(axis=2)
    np.testing.assert_allclose(sums, np.ones_like(sums), atol=1e-4)


def test_csfs_load_and_verify():
    csfs = CSFS.load(f"{REF}/DECODING_QUANTITIES/30-100-2000.csfs")
    assert csfs.samples == 300
    assert len(csfs.entries) == 69
    tv, sv = read_demography(f"{REF}/CEU.demo")
    disc = read_discretization(f"{REF}/DISC/30-100-2000.disc")
    assert csfs.verify(tv, sv, 1.65e-8, 300, disc)
    assert not csfs.verify(tv, sv, 1.0e-8, 300, disc)  # wrong mu


def test_fold_preserves_mass():
    csfs = CSFS.load(f"{REF}/DECODING_QUANTITIES/30-100-2000.csfs")
    folded = csfs.fold(csfs.entries)
    k = csfs.keys()[0]
    assert abs(folded[k].csfs.sum() - csfs.entries[k].csfs.sum()) < 1e-12


def test_classic_emission():
    et = np.array([10.0, 100.0, 1000.0])
    em = compute_classic_emission(et, 1.65e-8)
    np.testing.assert_allclose(em[0], np.exp(-2 * et * 1.65e-8))
    np.testing.assert_allclose(em[0] + em[1], 1.0)


def test_prepared_artifact_roundtrip(tmp_path, n300_dq):
    """npz save/load and reference-text write/parse roundtrips."""
    from fastsmc_tpu.io.decoding_quantities import DecodingQuantities
    from fastsmc_tpu.prepare.make_dq import write_reference_text

    p = tmp_path / "dq.npz"
    n300_dq.save_npz(str(p))
    back = DecodingQuantities.load_npz(str(p))
    np.testing.assert_array_equal(back.D, n300_dq.D)
    np.testing.assert_array_equal(back.initial_state_prob,
                                  n300_dq.initial_state_prob)

    # text roundtrip on a sliced copy (full grid write is slow)
    import dataclasses
    small = dataclasses.replace(
        n300_dq,
        gen_dists=n300_dq.gen_dists[:50], D=n300_dq.D[:50],
        B=n300_dq.B[:50], U=n300_dq.U[:50], RR=n300_dq.RR[:50],
        phys_dists=n300_dq.phys_dists[:20],
        homozygous_emissions=n300_dq.homozygous_emissions[:20])
    tp = tmp_path / "dq.gz"
    write_reference_text(small, str(tp))
    parsed = DecodingQuantities.load(str(tp))
    assert parsed.states == small.states
    np.testing.assert_allclose(parsed.D, small.D, rtol=1e-6)
    np.testing.assert_allclose(parsed.initial_state_prob,
                               small.initial_state_prob, rtol=1e-6)
    np.testing.assert_allclose(parsed.compressed_emission,
                               small.compressed_emission, rtol=1e-6)
    np.testing.assert_allclose(parsed.folded_ascertained_csfs,
                               small.folded_ascertained_csfs, rtol=1e-6)


def test_decoding_quantities_file_validation():
    """Mirror of test_decoding_quantities.cpp:24-45 against the reference's
    own fixtures: magic-header check on the text format."""
    import pytest

    from fastsmc_tpu.io.decoding_quantities import parse_reference_text
    data = "/root/reference/ASMC_SRC/TESTS/data"
    with pytest.raises(Exception):
        parse_reference_text(f"{data}/random_nonexistent_file.txt")
    parse_reference_text(f"{data}/decoding_quantities_good.txt")  # no raise
    with pytest.raises(ValueError):
        parse_reference_text(f"{data}/decoding_quantities_bad.txt")
