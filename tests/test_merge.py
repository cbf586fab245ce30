import gzip

import numpy as np
import pytest

from fastsmc_tpu.pipelines.merge import PosteriorMerger, _read_matrix


def _write_mat(path, m):
    with gzip.open(path, "wt") as f:
        for row in m:
            f.write("\t".join(str(float(v)) for v in row) + "\n")


@pytest.fixture
def job_outputs(tmp_path):
    rng = np.random.default_rng(0)
    rows, cols, jobs = 20, 5, 4
    mats = {}
    for tag in ("00", "01", "11"):
        mats[tag] = rng.random((jobs, rows, cols)).astype(np.float32)
        for j in range(jobs):
            _write_mat(str(tmp_path / f"r.{j + 1}-{jobs}.{tag}"
                           f".sumOverPairs.gz"), mats[tag][j])
    return tmp_path, mats, jobs


def test_merge_by_job_indices(job_outputs, tmp_path):
    d, mats, jobs = job_outputs
    m = PosteriorMerger.from_job_indices(str(d / "r"), jobs)
    np.testing.assert_allclose(m.sum00, mats["00"].sum(axis=0), rtol=1e-6)
    np.testing.assert_allclose(
        m.sum_all,
        (mats["00"] + mats["01"] + mats["11"]).sum(axis=0), rtol=1e-6)
    m.write(str(d / "out"))
    back = _read_matrix(str(d / "out.merged.sumOverPairs.gz"))
    np.testing.assert_allclose(back, m.sum_all, rtol=1e-6)


def test_merge_normalized(job_outputs):
    d, mats, jobs = job_outputs
    m = PosteriorMerger.from_job_indices(str(d / "r"), jobs, normalize=True)
    np.testing.assert_allclose(m.sum_all.sum(axis=1), 1.0, atol=1e-5)


def test_merge_expected_coal_times(job_outputs, tmp_path):
    d, mats, jobs = job_outputs
    m = PosteriorMerger.from_job_indices(str(d / "r"), jobs, normalize=True)
    info = tmp_path / "info"
    means = np.array([10.0, 50.0, 200.0, 1000.0, 5000.0])
    with open(info, "w") as f:
        for mu in means:
            f.write(f"0\t{mu}\t0\n")
    m.compute_coalescent_times(str(info))
    np.testing.assert_allclose(m.exp_times["all"], m.sum_all @
                               means.astype(np.float32), rtol=1e-5)


def test_merge_by_file_list_map_intersection(tmp_path):
    """Roots with different maps: only intersecting SNPs are merged
    (PosteriorMerger.java:43-118)."""
    rng = np.random.default_rng(1)
    cols = 4

    def write_root(name, snps, mat):
        with gzip.open(tmp_path / f"{name}.map.gz", "wt") as f:
            for s in snps:
                f.write(f"1\tSNP_{s}\t{s / 100}\t{s * 1000}\n")
        for tag in ("00", "01", "11"):
            _write_mat(str(tmp_path / f"{name}.{tag}.sumOverPairs.gz"), mat)

    snps_a = [1, 2, 3, 4, 5]
    snps_b = [2, 3, 4, 5, 6]
    ma = rng.random((5, cols)).astype(np.float32)
    mb = rng.random((5, cols)).astype(np.float32)
    write_root("a", snps_a, ma)
    write_root("b", snps_b, mb)

    m = PosteriorMerger.from_file_list(
        [str(tmp_path / "a"), str(tmp_path / "b")])
    assert m.sum00.shape == (4, cols)     # intersection = SNPs 2..5
    np.testing.assert_allclose(m.sum00, ma[1:] + mb[:4], rtol=1e-6)
    m.write(str(tmp_path / "out"))
    with gzip.open(tmp_path / "out.merged.map.gz", "rt") as f:
        lines = f.read().splitlines()
    assert len(lines) == 4 and "SNP_2" in lines[0]
