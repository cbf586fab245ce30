"""Test configuration: force CPU JAX with an 8-device virtual mesh.

The TPU hardware path is exercised separately (bench.py and the
*_tpu-marked tests, which are skipped on CPU).
"""

import os

_ON_TPU = os.environ.get("FASTSMC_TEST_TPU", "") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # override the session default
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # keep the compilation cache out of unit tests
    os.environ.setdefault("FASTSMC_TPU_NO_CACHE", "1")

import pathlib
import sys

import jax

if not _ON_TPU:
    # the axon sitecustomize pins the platform regardless of JAX_PLATFORMS;
    # force the CPU backend explicitly for unit tests.
    # FASTSMC_TEST_TPU=1 keeps the hardware backend so the tpu-marked
    # golden regressions run on the chip: 
    #   FASTSMC_TEST_TPU=1 pytest tests/ -m tpu -q
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = pathlib.Path("/root/reference")


def pytest_collection_modifyitems(config, items):
    """slow-marked tests (Pallas interpret mode is ~minutes on CPU) only run
    with FASTSMC_RUN_SLOW=1; the same numerics are covered by the oracle/XLA
    cross-checks and the tpu-marked on-chip goldens."""
    if os.environ.get("FASTSMC_RUN_SLOW", "") == "1":
        return
    skip = pytest.mark.skip(reason="slow; set FASTSMC_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


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


@pytest.fixture(scope="session")
def synthetic_panel_root(tmp_path_factory):
    """150-sample synthetic panel with planted IBD (reference file formats),
    plus the n300 decoding-quantities artifact path and a scratch dir."""
    import gzip

    d = tmp_path_factory.mktemp("mh_panel")
    rng = np.random.default_rng(123)
    n_ind, sites = 150, 640
    freqs = rng.uniform(0.05, 0.5, sites)
    bits = (rng.random((2 * n_ind, sites)) < freqs).astype(np.uint8)
    for (a, b, s, e) in [(4, 31, 64, 512), (100, 205, 128, 576),
                         (7, 8, 0, 448)]:
        bits[b, s:e] = bits[a, s:e]
    bp = (np.arange(sites) + 1) * 5000
    cm = np.linspace(0.0, 8.0, sites)
    root = str(d / "panel")
    with gzip.open(root + ".hap.gz", "wt") as f:
        for s in range(sites):
            f.write(f"1 SNP_{s} {bp[s]} A G "
                    + " ".join(str(int(x)) for x in bits[:, s]) + "\n")
    with open(root + ".samples", "w") as f:
        f.write("ID_1 ID_2 missing\n0 0 0\n")
        for i in range(n_ind):
            f.write(f"fam{i} ind{i} 0\n")
    with gzip.open(root + ".map.gz", "wt") as f:
        f.write("pos rate cm\n")
        for s in range(sites):
            f.write(f"{bp[s]}\t0\t{cm[s]}\n")
    dq_path = str(REPO / "artifacts" / "n300.array.decodingQuantities.npz")
    return root, dq_path, d
