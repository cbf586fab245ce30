"""Test configuration: force CPU JAX with an 8-device virtual mesh.

The TPU hardware path is exercised separately (bench.py and the
*_tpu-marked tests, which are skipped on CPU).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session default (axon)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# keep the compilation cache out of unit tests
os.environ.setdefault("FASTSMC_TPU_NO_CACHE", "1")

import pathlib
import sys

import jax

# the axon sitecustomize pins the platform regardless of JAX_PLATFORMS;
# force the CPU backend explicitly for unit tests
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def repo_root() -> pathlib.Path:
    return REPO


@pytest.fixture(scope="session")
def reference_root() -> pathlib.Path:
    return REF


@pytest.fixture(scope="session")
def n300_dq():
    from fastsmc_tpu.io.decoding_quantities import DecodingQuantities
    return DecodingQuantities.load_npz(
        str(REPO / "artifacts" / "n300.array.decodingQuantities.npz"))


@pytest.fixture(scope="session")
def n300_params():
    from fastsmc_tpu.config import DecodingParams
    return DecodingParams.asmc(
        str(REF / "FILES" / "EXAMPLE" / "exampleFile.n300.array"),
        str(REPO / "artifacts" / "n300.array.decodingQuantities.npz"),
        out_file_root="/tmp/fastsmc_tpu_test_out",
        do_posterior_sums=True, use_known_seed=True)


@pytest.fixture(scope="session")
def n300_data(n300_params):
    from fastsmc_tpu.io.haps import load_data
    return load_data(n300_params)


@pytest.fixture(scope="session")
def n300_ctx(n300_params, n300_data, n300_dq):
    from fastsmc_tpu.engine.oracle import DecodeContext
    return DecodeContext.build(n300_params, n300_data, n300_dq)
