"""Reference pybind-surface compatibility shim (fastsmc_tpu/compat.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def asmc_mod():
    import fastsmc_tpu.compat as asmc
    return asmc


def test_asmc_reference_ctor_and_decode_all(asmc_mod, repo_root):
    a = asmc_mod.ASMC(
        "/root/reference/FILES/EXAMPLE/exampleFile.n300.array",
        str(repo_root / "artifacts" / "n300.array.decodingQuantities.npz"),
        "/tmp/compat_out")
    # restrict to a tiny pair set via decodePairs instead of decodeAllInJob
    a.decodePairs([0, 3], [7, 40], per_pair_posteriors=True,
                  sum_of_posteriors=True, per_pair_posterior_means=True,
                  per_pair_MAPs=True)
    r = a.get_copy_of_results()
    assert r.per_pair_posteriors.shape[0] == 2
    assert r.sum_of_posteriors is not None
    assert r.per_pair_MAPs.shape[0] == 2
    assert r.min_MAPs is not None and r.argmin_MAPs is not None
    ref = a.get_ref_of_results()
    assert np.allclose(ref.per_pair_posterior_means,
                       r.per_pair_posterior_means)


def test_decoding_quantities_ctor(asmc_mod, repo_root):
    dq = asmc_mod.DecodingQuantities(
        str(repo_root / "artifacts" / "n300.array.decodingQuantities.npz"))
    assert dq.states == 69


def test_binary_reader_camel_case(asmc_mod):
    rd = asmc_mod.BinaryDataReader(
        "/root/reference/ASMC_SRC/TESTS/data/binary_output.bibd.gz")
    n = 0
    first = None
    while rd.moreLinesInFile():
        line = rd.getNextLine()
        if first is None:
            first = line
        n += 1
    assert n == 1520
    assert isinstance(first.toString(), str)


def test_decoding_params_camel_case(asmc_mod):
    """notebooks/fastsmc.ipynb configures params attribute-style with the
    pybind camelCase names (pybind.cpp:146-178)."""
    DecodingMode = asmc_mod.DecodingMode
    p = asmc_mod.DecodingParams()
    p.decodingQuantFile = "dq.npz"
    p.inFileRoot = "in"
    p.outFileRoot = "out"
    p.decodingModeString = "array"
    p.decodingMode = DecodingMode.arrayFolded
    p.foldData = True
    p.usingCSFS = True
    p.batchSize = 32
    p.recallThreshold = 3
    p.min_m = 1.5
    p.hashing = True
    p.FastSMC = True
    p.BIN_OUT = True
    p.outputIbdSegmentLength = True
    p.time = 50
    p.noConditionalAgeEstimates = True
    p.doPerPairMAP = True
    p.doPerPairPosteriorMean = True
    assert p.validateParamsFastSMC()
    # camelCase reads reflect the native snake_case fields
    assert p.batch_size == 32 and p.batchSize == 32
    assert p.bin_out and p.BIN_OUT and p.fastsmc and p.FastSMC
    assert p.decodingMode == DecodingMode.arrayFolded
    # the enum field is distinct from decodingModeString in the reference:
    # assigning it does not rewrite the string, and validate re-derives the
    # enum from the string (DecodingParams.cpp:502-533)
    p.decodingMode = DecodingMode.sequence
    assert p.decodingMode == DecodingMode.sequence
    assert p.decoding_mode == "array" and p.fold_data
    assert p.validateParamsFastSMC()
    assert p.decodingMode == DecodingMode.arrayFolded


def test_decoding_params_rejects_unknown_attrs(asmc_mod):
    """The pybind surface is strict: a typo'd attribute must raise, not
    silently do nothing."""
    import pytest
    p = asmc_mod.DecodingParams()
    with pytest.raises(AttributeError):
        p.decodingQuantFlie = "typo.npz"
    with pytest.raises(AttributeError):
        p.batchSzie = 64


def test_validate_fastsmc_requires_flag(asmc_mod):
    """DecodingParams.cpp:282-287: validating FastSMC params with the
    FastSMC flag unset is a hard error."""
    import pytest
    p = asmc_mod.DecodingParams()
    p.inFileRoot = "in"
    assert not p.fastsmc
    with pytest.raises(RuntimeError):
        p.validateParamsFastSMC()


def test_fastsmc_in_dir_kwargs(asmc_mod, repo_root):
    """FastSMC(in_dir=..., out_dir=...) keyword ctor (pybind.cpp:233,
    notebooks/fastsmc-minimal.ipynb)."""
    panel = str(repo_root / "artifacts" / "panels" / "example_array"
                / "example")
    fs = asmc_mod.FastSMC(in_dir=panel, out_dir="/tmp/compat_min_out")
    # dq file auto-derives to <inFileRoot>.decodingQuantities.gz
    assert fs._params.decoding_quant_file == (
        panel + ".decodingQuantities.gz")
    import pytest
    with pytest.raises(TypeError):
        asmc_mod.FastSMC(in_dir=panel)  # out_dir required


def test_preparedecoding_submodule(asmc_mod, repo_root, tmp_path):
    """`from asmc.preparedecoding import *` equivalent: wrapper exposes the
    reference package save methods over our native artifact."""
    from fastsmc_tpu import preparedecoding as pdec
    from fastsmc_tpu.io.decoding_quantities import (
        DecodingQuantities as NativeDQ)
    native = NativeDQ.load_npz(
        str(repo_root / "artifacts" / "example.decodingQuantities.npz"))
    dq = pdec.DecodingQuantities(native)
    out = tmp_path / "model"
    dq.save_intervals(str(out))
    assert (tmp_path / "model.intervalsInfo").read_text().count("\n") == 69
    assert dq.states == 69  # passthrough
    assert asmc_mod.preparedecoding is pdec


# ---------------------------------------------------------------------------
# round 2: full pybind surface (Data / DecodingQuantities members / HMM /
# Individual / PairObservations / ctor overloads, pybind.cpp:89-230)
# ---------------------------------------------------------------------------

N300 = "/root/reference/FILES/EXAMPLE/exampleFile.n300.array"


@pytest.fixture(scope="module")
def compat_params(asmc_mod, repo_root):
    return asmc_mod.DecodingParams(
        N300, str(repo_root / "artifacts" / "n300.array.decodingQuantities.npz"),
        "/tmp/compat_hmm", doPosteriorSums=True)


@pytest.fixture(scope="module")
def compat_data(asmc_mod, compat_params):
    return asmc_mod.Data(compat_params)


def test_decoding_params_pybind_ctor(asmc_mod):
    # positional per the reference 18-arg ctor order (pybind.cpp:121-141)
    p = asmc_mod.DecodingParams("in", "dq", "out", 4, 2, "array")
    assert p.inFileRoot == "in" and p.jobs == 4 and p.jobInd == 2
    # mixing keywords
    p2 = asmc_mod.DecodingParams("in", "dq", doPosteriorSums=True,
                                 withinOnly=True)
    assert p2.doPosteriorSums and p2.withinOnly
    with pytest.raises(TypeError):
        asmc_mod.DecodingParams("in", "dq", bogusArgument=1)
    # FastSMC overload requires the flag (DecodingParams.cpp:65-70)
    with pytest.raises(RuntimeError):
        asmc_mod.DecodingParams(in_dir="a", decoding_quants="b",
                                out_dir="c", FastSMC=False)


def test_individual_set_genotype(asmc_mod):
    ind = asmc_mod.Individual(8)
    ind.setGenotype(1, 3, True)
    ind.setGenotype(2, 5, 1)
    assert ind.genotype1[3] and ind.genotype2[5]
    assert not ind.genotype1[5] and not ind.genotype2[3]
    with pytest.raises(ValueError):
        ind.setGenotype(3, 0, True)


def test_data_surface(asmc_mod, compat_data, n300_data):
    d = compat_data
    assert d.sites == n300_data.sites
    assert d.sampleSize == n300_data.sample_size
    assert d.haploidSampleSize == n300_data.n_haps
    assert len(d.FamIDList) == len(d.IIDList) == n300_data.n_ind
    assert d.famAndIndNameList[0] == \
        f"{d.FamIDList[0]}\t{d.IIDList[0]}"
    np.testing.assert_array_equal(d.geneticPositions,
                                  n300_data.genetic_positions)
    np.testing.assert_array_equal(d.physicalPositions,
                                  n300_data.physical_positions)
    ind0 = d.individuals[0]
    np.testing.assert_array_equal(ind0.genotype1,
                                  n300_data.hap_bits[0].astype(bool))
    np.testing.assert_array_equal(ind0.genotype2,
                                  n300_data.hap_bits[1].astype(bool))
    assert asmc_mod.Data.countHapLines(N300) == n300_data.sites


def test_decoding_quantities_member_views(asmc_mod, repo_root):
    dq = asmc_mod.DecodingQuantities(
        str(repo_root / "artifacts" / "n300.array.decodingQuantities.npz"))
    n = dq._native
    assert dq.CSFSSamples == n.csfs_samples
    assert len(dq.initialStateProb) == dq.states
    assert len(dq.expectedTimes) == dq.states
    assert len(dq.columnRatios) == dq.states
    assert dq.classicEmissionTable.shape == (2, dq.states)
    dv = dq.Dvectors
    assert len(dv) == len(n.gen_dists)
    key = float(n.gen_dists[3])
    np.testing.assert_array_equal(dv[key], n.D[3])
    np.testing.assert_array_equal(dq.Bvectors[key], n.B[3])
    np.testing.assert_array_equal(dq.Uvectors[key], n.U[3])
    np.testing.assert_array_equal(dq.rowRatioVectors[key], n.RR[3])
    hm = dq.homozygousEmissionMap
    pk = int(n.phys_dists[1])
    np.testing.assert_array_equal(hm[pk], n.homozygous_emissions[1])
    assert dq.CSFSmap.shape[1:] == (3, dq.states)
    assert dq.foldedCSFSmap.shape[1:] == (2, dq.states)


@pytest.fixture(scope="module")
def hmm(asmc_mod, compat_data, compat_params):
    return asmc_mod.HMM(compat_data, compat_params)


def test_hmm_make_pair_obs_and_decode(hmm, n300_ctx):
    obs = hmm.makePairObs(1, 0, 2, 3)       # haps 0 and 7
    want_obs, want_hom = n300_ctx.pair_observations(0, 7)
    np.testing.assert_array_equal(obs.obsBits, want_obs)
    np.testing.assert_array_equal(obs.homMinorBits, want_hom)

    from fastsmc_tpu.engine.oracle import decode_pair
    post = hmm.decode(obs, 1000, 1128)                 # [K, 128]
    ref = decode_pair(n300_ctx, 0, 7, 1000, 1128)      # [K, 128]
    np.testing.assert_allclose(post, ref, atol=2e-4)

    pmap, pmean = hmm.decodeSummarize(obs)
    assert pmap.shape == pmean.shape == (hmm._data.sites,)
    assert np.all(pmean > 0)


def test_hmm_batched_pair_decoding(asmc_mod, compat_data, compat_params):
    hmm = asmc_mod.HMM(compat_data, compat_params)
    hmm.decodePairs([0, 2], [1, 2])
    # 0!=1 contributes 4 hap combos; 2==2 contributes 1 (HMM.cpp:413-440)
    assert len(hmm.getBatchBuffer()) == 5
    hmm.finishDecoding()
    assert len(hmm.getBatchBuffer()) == 0
    rv = hmm.getDecodingReturnValues()
    sums = np.asarray(rv.sumOverPairs)
    # 5 normalized posteriors summed -> each row sums to ~5
    np.testing.assert_allclose(sums.sum(axis=1), 5.0, atol=1e-3)
    assert rv.sites == compat_data.sites


def test_hmm_state_threshold(hmm):
    t = hmm.getStateThreshold()
    disc = hmm._dq.discretization
    assert disc[t] >= hmm._params.time
    assert t == 0 or disc[t - 1] < hmm._params.time
