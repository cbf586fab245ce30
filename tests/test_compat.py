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
