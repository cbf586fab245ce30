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
