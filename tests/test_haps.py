import numpy as np
import pytest

from fastsmc_tpu.io.haps import JobWindows, pack_hap_words


def test_n300_panel_loads(n300_data):
    d = n300_data
    assert d.sites == 6760
    assert d.sample_size == 150
    assert d.n_ind == 150          # jobs=1: all samples
    assert d.n_haps == 300
    assert d.chr_number == 1
    # folding invariant: derived counts never exceed half
    assert (d.derived_allele_counts <= d.total_samples_count // 2).all()
    # genetic positions are Morgans, non-decreasing
    assert (np.diff(d.genetic_positions) >= 0).all()


def test_undistinguished_counts_deterministic(n300_data):
    und = n300_data.calculate_undistinguished_counts(300)
    assert und.shape == (6760, 3)
    # folded: sample + distinguished <= csfs/2 bound applied
    assert und.max() <= 150
    # cached object returns identical array
    assert und is n300_data.calculate_undistinguished_counts(300)


def test_job_windows_math():
    # N=150 samples, jobs=9 (reference Data.cpp:62-80)
    w = JobWindows.compute(150, 9, 7)
    n = 150.0
    import math
    expect_ws = math.ceil(math.sqrt((2 * n * n - n) * 2 / 9))
    if expect_ws % 2:
        expect_ws += 1
    assert w.window_size == expect_ws
    # jobs partition: every job selects a valid window pair
    for job in range(1, 10):
        w = JobWindows.compute(150, 9, job)
        assert 1 <= w.w_j <= w.w_i


def test_job_windows_trivial():
    w = JobWindows.compute(150, 1, 1)
    assert all(w.sample_in_job(d) for d in range(150))


def test_pack_hap_words_bit_order():
    bits = np.zeros((1, 130), dtype=np.uint8)
    bits[0, 0] = 1     # word 0, bit 0
    bits[0, 65] = 1    # word 1, bit 1
    bits[0, 128] = 1   # word 2, bit 0
    w = pack_hap_words(bits)
    assert w.shape == (1, 3)
    assert w[0, 0] == 1
    assert w[0, 1] == 2
    assert w[0, 2] == 1
