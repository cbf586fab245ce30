import gzip

import numpy as np
import pytest

from fastsmc_tpu.io.writers import (BinaryDataReader, IbdBinaryWriter,
                                    IbdRecord, IbdTextWriter, fmt_float,
                                    write_sum_over_pairs,
                                    write_major_minor_sums)


def test_fmt_float_matches_cxx_setprecision7():
    # values from the reference golden file (regression_output.ibd.gz)
    assert fmt_float(np.float32(1.869621)) == "1.869621"
    assert fmt_float(0.4075357) == "0.4075357"
    assert fmt_float(np.float32(148.8378)) == "148.8378"
    assert fmt_float(np.float32(24.99993)) == "24.99993"
    assert fmt_float(np.float32(0.008774921)) == "0.008774921"
    assert fmt_float(np.float32(15968.97)) == "15968.97"
    assert fmt_float(0.0) == "0"


RECORDS = [
    IbdRecord(0, 1, 3, 2, 1000, 50000, 1.25, 0.875, 150.5, 33.25),
    IbdRecord(2, 2, 1, 1, 777, 888, 0.015625, 0.25, 1e4, 2.5),
]


def test_text_writer(tmp_path):
    path = str(tmp_path / "x.ibd.gz")
    w = IbdTextWriter(path, ["f0", "f1", "f2", "f3"],
                      ["s0", "s1", "s2", "s3"], 7)
    for r in RECORDS:
        w.write(r)
    w.close()
    lines = gzip.open(path, "rt").read().splitlines()
    assert lines[0] == "f0\ts0\t1\tf3\ts3\t2\t7\t1000\t50000\t1.25\t0.875" \
                       "\t150.5\t33.25"
    assert len(lines) == 2


def test_binary_roundtrip(tmp_path):
    path = str(tmp_path / "x.bibd.gz")
    fams = ["fam_a", "fb", "fam_c", "f"]
    iids = ["i1", "ind_2", "x", "yy"]
    w = IbdBinaryWriter(path, fams, iids, 13, True, True, True)
    for r in RECORDS:
        w.write(r)
    w.close()
    rd = BinaryDataReader(path)
    assert rd.chr_number == 13
    assert rd.fam_ids == fams and rd.iids == iids
    lines = list(rd)
    assert len(lines) == 2
    l0 = lines[0]
    assert (l0.ind1_fam_id, l0.ind1_id, l0.ind1_hap) == ("fam_a", "i1", 1)
    assert (l0.ind2_fam_id, l0.ind2_hap) == ("f", 2)
    assert (l0.ibd_start, l0.ibd_end) == (1000, 50000)
    assert abs(l0.length_cm - 1.25) < 1e-6
    assert abs(l0.score - 0.875) < 1e-6
    assert abs(l0.post_est - 150.5) < 1e-4
    assert abs(l0.map_est - 33.25) < 1e-6
    # convertBinary-style text
    assert l0.to_string().startswith("fam_a\ti1\t1\tf\tyy\t2\t13\t1000")


def test_binary_optional_fields(tmp_path):
    path = str(tmp_path / "y.bibd.gz")
    w = IbdBinaryWriter(path, ["a"], ["b"], 1, False, False, False)
    w.write(IbdRecord(0, 1, 0, 2, 5, 10, None, 0.5, None, None))
    w.close()
    rd = BinaryDataReader(path)
    (line,) = list(rd)
    assert line.length_cm == -1.0 and line.post_est == -1.0
    assert abs(line.score - 0.5) < 1e-7


def test_sum_over_pairs_writers(tmp_path):
    m = np.arange(12, dtype=np.float32).reshape(4, 3)
    p = str(tmp_path / "s.gz")
    write_sum_over_pairs(p, m)
    rows = [l.split("\t") for l in gzip.open(p, "rt").read().splitlines()]
    assert len(rows) == 4 and len(rows[0]) == 3
    back = np.array([[float(x) for x in r] for r in rows])
    np.testing.assert_allclose(back, m)

    flipped = np.array([False, True, False, False])
    s00 = np.ones((4, 3), np.float32)
    s11 = np.full((4, 3), 2.0, np.float32)
    write_major_minor_sums(str(tmp_path / "mm"), s00, s00 * 0 + 3, s11,
                           flipped)
    r00 = np.loadtxt(str(tmp_path / "mm") + ".00.sumOverPairs.gz")
    assert r00[0, 0] == 1.0 and r00[1, 0] == 2.0  # flipped row swapped


def test_write_block_matches_per_record(tmp_path):
    """Bulk write_block (native C formatter when available, Python
    fallback otherwise) must produce byte-identical output to the
    per-record write() path."""
    import gzip

    import numpy as np

    from fastsmc_tpu.io import writers

    fam = [f"f{i}" for i in range(8)]
    iid = [f"s{i}" for i in range(8)]
    rng = np.random.default_rng(3)
    n = 200
    ind1 = rng.integers(0, 8, n).astype(np.int32)
    ind2 = rng.integers(0, 8, n).astype(np.int32)
    hap1 = (1 + rng.integers(0, 2, n)).astype(np.int32)
    hap2 = (1 + rng.integers(0, 2, n)).astype(np.int32)
    ps = rng.integers(0, 1 << 40, n).astype(np.int64)
    pe = ps + rng.integers(1, 1 << 20, n).astype(np.int64)
    length = (rng.random(n) * 30).astype(np.float32)
    score = rng.random(n).astype(np.float64) * 1.5

    for use_len in (True, False):
        a = str(tmp_path / f"a{use_len}.ibd.gz")
        b = str(tmp_path / f"b{use_len}.ibd.gz")
        w = writers.IbdTextWriter(a, fam, iid, 7)
        for j in range(n):
            w.write(writers.IbdRecord(
                ind1=int(ind1[j]), hap1=int(hap1[j]), ind2=int(ind2[j]),
                hap2=int(hap2[j]), pos_start=int(ps[j]), pos_end=int(pe[j]),
                length_cm=length[j] if use_len else None,
                score=float(score[j]), post_est=None, map_est=None))
        w.close()
        w = writers.IbdTextWriter(b, fam, iid, 7)
        w.write_block(ind1, hap1, ind2, hap2, ps, pe,
                      length if use_len else None, score)
        w.close()
        assert gzip.open(a, "rb").read() == gzip.open(b, "rb").read()


def test_write_block_oversized_ids(tmp_path):
    """Sample ids longer than the native formatter's fixed per-record
    headroom must not silently truncate output (ADVICE r3): the cap is
    sized from the longest id pair and the C side reports truncation,
    so bulk and per-record output stay byte-identical even with 500-byte
    ids."""
    import gzip

    import numpy as np

    from fastsmc_tpu.io import writers

    fam = ["F" * 500, "g"]
    iid = ["I" * 400, "h"]
    n = 16
    rng = np.random.default_rng(5)
    ind1 = rng.integers(0, 2, n).astype(np.int32)
    ind2 = rng.integers(0, 2, n).astype(np.int32)
    hap1 = (1 + rng.integers(0, 2, n)).astype(np.int32)
    hap2 = (1 + rng.integers(0, 2, n)).astype(np.int32)
    ps = rng.integers(0, 1 << 30, n).astype(np.int64)
    pe = ps + rng.integers(1, 1 << 20, n).astype(np.int64)
    score = rng.random(n).astype(np.float64)

    a = str(tmp_path / "a.ibd.gz")
    b = str(tmp_path / "b.ibd.gz")
    w = writers.IbdTextWriter(a, fam, iid, 7)
    for j in range(n):
        w.write(writers.IbdRecord(
            ind1=int(ind1[j]), hap1=int(hap1[j]), ind2=int(ind2[j]),
            hap2=int(hap2[j]), pos_start=int(ps[j]), pos_end=int(pe[j]),
            length_cm=None, score=float(score[j]), post_est=None,
            map_est=None))
    w.close()
    w = writers.IbdTextWriter(b, fam, iid, 7)
    w.write_block(ind1, hap1, ind2, hap2, ps, pe, None, score)
    w.close()
    assert gzip.open(a, "rb").read() == gzip.open(b, "rb").read()


def test_binary_write_block_matches_per_record(tmp_path):
    """IbdBinaryWriter.write_block must produce byte-identical output to
    per-record write() for every optional-column combination."""
    import gzip

    import numpy as np

    from fastsmc_tpu.io import writers

    fam = [f"f{i}" for i in range(8)]
    iid = [f"s{i}" for i in range(8)]
    rng = np.random.default_rng(9)
    n = 150
    ind1 = rng.integers(0, 8, n).astype(np.int32)
    ind2 = rng.integers(0, 8, n).astype(np.int32)
    hap1 = (1 + rng.integers(0, 2, n)).astype(np.int32)
    hap2 = (1 + rng.integers(0, 2, n)).astype(np.int32)
    ps = rng.integers(0, 1 << 31 - 1, n).astype(np.int64)
    pe = ps
    length = (rng.random(n) * 30).astype(np.float32)
    score = rng.random(n).astype(np.float64)
    post = (rng.random(n) * 1e4).astype(np.float32)
    mape = (rng.random(n) * 1e4).astype(np.float32)

    for has_len in (True, False):
        for has_post in (True, False):
            for has_map in (True, False):
                a = str(tmp_path / f"a{has_len}{has_post}{has_map}.bibd.gz")
                b = str(tmp_path / f"b{has_len}{has_post}{has_map}.bibd.gz")
                w = writers.IbdBinaryWriter(a, fam, iid, 7, has_len,
                                            has_post, has_map)
                for j in range(n):
                    w.write(writers.IbdRecord(
                        ind1=int(ind1[j]), hap1=int(hap1[j]),
                        ind2=int(ind2[j]), hap2=int(hap2[j]),
                        pos_start=int(ps[j]), pos_end=int(pe[j]),
                        length_cm=length[j] if has_len else None,
                        score=float(score[j]),
                        post_est=post[j] if has_post else None,
                        map_est=mape[j] if has_map else None))
                w.close()
                w = writers.IbdBinaryWriter(b, fam, iid, 7, has_len,
                                            has_post, has_map)
                w.write_block(ind1, hap1, ind2, hap2, ps, pe,
                              length if has_len else None, score,
                              post if has_post else None,
                              mape if has_map else None)
                w.close()
                assert gzip.open(a, "rb").read() == gzip.open(b, "rb").read()


def test_text_write_block_ages_matches_per_record(tmp_path):
    """Text write_block with post/map columns (native formatter + Python
    fallback) must match per-record write() byte-for-byte."""
    import gzip

    import numpy as np

    from fastsmc_tpu.io import writers

    fam = [f"f{i}" for i in range(8)]
    iid = [f"s{i}" for i in range(8)]
    rng = np.random.default_rng(13)
    n = 150
    ind1 = rng.integers(0, 8, n).astype(np.int32)
    ind2 = rng.integers(0, 8, n).astype(np.int32)
    hap1 = (1 + rng.integers(0, 2, n)).astype(np.int32)
    hap2 = (1 + rng.integers(0, 2, n)).astype(np.int32)
    ps = rng.integers(0, 1 << 40, n).astype(np.int64)
    pe = ps + rng.integers(1, 1 << 20, n).astype(np.int64)
    length = (rng.random(n) * 30).astype(np.float32)
    score = rng.random(n).astype(np.float64)
    post = (rng.random(n) * 1e4).astype(np.float32)
    mape = (rng.random(n) * 1e4).astype(np.float32)

    a = str(tmp_path / "a.ibd.gz")
    b = str(tmp_path / "b.ibd.gz")
    w = writers.IbdTextWriter(a, fam, iid, 7)
    for j in range(n):
        w.write(writers.IbdRecord(
            ind1=int(ind1[j]), hap1=int(hap1[j]), ind2=int(ind2[j]),
            hap2=int(hap2[j]), pos_start=int(ps[j]), pos_end=int(pe[j]),
            length_cm=length[j], score=float(score[j]),
            post_est=post[j], map_est=mape[j]))
    w.close()
    w = writers.IbdTextWriter(b, fam, iid, 7)
    w.write_block(ind1, hap1, ind2, hap2, ps, pe, length, score, post, mape)
    w.close()
    assert gzip.open(a, "rb").read() == gzip.open(b, "rb").read()
