import math

import pytest

from fastsmc_tpu.config import ConfigError, DecodingParams, valid_job_counts


def test_valid_job_counts():
    counts = valid_job_counts()
    assert counts[:6] == [1, 4, 9, 16, 25, 36]


def test_fastsmc_profile_defaults():
    p = DecodingParams.fastsmc_defaults("/tmp/in", "/tmp/dq", "/tmp/out")
    # reference DecodingParams.cpp:56-63
    assert p.min_m == 1.5
    assert p.time == 50
    assert p.batch_size == 32
    assert p.no_conditional_age_estimates
    assert p.hashing and p.fastsmc
    assert p.do_per_pair_posterior_mean and p.do_per_pair_map
    assert p.fold_data and not p.decoding_sequence


def test_fastsmc_cli_profile_defaults():
    p = DecodingParams.fastsmc_cli_defaults("/tmp/in", "/tmp/out")
    # reference DecodingParams.cpp:186-235
    assert p.min_m == 1.0
    assert p.time == 100
    assert not p.no_conditional_age_estimates
    assert p.skip_csfs_distance == 0.0  # NaN resolved to 0


def test_invalid_jobs_rejected():
    with pytest.raises(ConfigError):
        DecodingParams.fastsmc_defaults("/i", "/d", "/o", jobs=5, job_ind=1)
    # valid triangular count
    p = DecodingParams.fastsmc_defaults("/i", "/d", "/o", jobs=9, job_ind=7)
    assert p.jobs == 9


def test_batch_size_multiple_of_8():
    with pytest.raises(ConfigError):
        DecodingParams.fastsmc_defaults("/i", "/d", "/o", batch_size=12)


def test_compress_skipcsfs_coupling():
    p = DecodingParams.asmc("/i", "/d", compress=True,
                            skip_csfs_distance=float("nan"))
    assert p.skip_csfs_distance == float("inf")
    with pytest.raises(ConfigError):
        DecodingParams.asmc("/i", "/d", compress=True, use_ancestral=True)


def test_mode_matrix():
    # {sequence, array} x {folded, unfolded} (DecodingParams.cpp:330-352)
    p = DecodingParams.asmc("/i", "/d", decoding_mode="sequence")
    assert p.decoding_sequence and p.fold_data
    p = DecodingParams.asmc("/i", "/d", decoding_mode="sequence",
                            use_ancestral=True)
    assert p.decoding_sequence and not p.fold_data
    p = DecodingParams.asmc("/i", "/d", decoding_mode="array")
    assert not p.decoding_sequence and p.fold_data
    with pytest.raises(ConfigError):
        DecodingParams.asmc("/i", "/d", decoding_mode="bogus")


def test_output_path_convention():
    p = DecodingParams.fastsmc_defaults("/i", "/d", "/o", jobs=4, job_ind=2)
    assert p.ibd_output_path() == "/o.2.4.FastSMC.ibd.gz"
    p.bin_out = True
    assert p.ibd_output_path().endswith(".bibd.gz")
