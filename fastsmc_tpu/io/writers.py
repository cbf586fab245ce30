"""Output codecs: IBD text/binary writers, posterior-sum writers, binary reader.

Byte-compatible with the reference formats:
  * text ``.ibd.gz`` records (HMM.cpp:1110-1144), float columns printed with
    ``setprecision(digits10+1 == 7)`` default-float formatting (== ``%.7g``)
  * binary ``.bibd.gz``: header (3 option bools, chr, id table —
    HMM.cpp:383-401) + packed records (HMM.cpp:1146-1176)
  * reader mirroring BinaryDataReader.hpp:64-185 (used by the
    ``convert-binary`` CLI)
  * ``.sumOverPairs.gz`` matrices in Eigen tab format (main.cpp:119-167)
    including the major/minor fold-flip
"""

from __future__ import annotations

import dataclasses
import gzip
import struct
from typing import IO, List, Optional

import numpy as np


def fmt_float(x) -> str:
    """C++ ostream default-float with precision 7 (== printf %.7g)."""
    return "%.7g" % float(x)


@dataclasses.dataclass
class IbdRecord:
    ind1: int
    hap1: int       # 1 or 2
    ind2: int
    hap2: int
    pos_start: int  # physical bp
    pos_end: int
    length_cm: Optional[float]
    score: float
    post_est: Optional[float]
    map_est: Optional[float]


class IbdTextWriter:
    """Streaming text IBD writer (HMM.cpp:1114-1144).

    Bulk writes deflate on a background thread (``threaded=True``): at
    ~15 MB/s zlib-6 on this host, a biobank run's deflate is seconds of
    MAIN-thread time that the grouped pipeline needs for dispatch/drain;
    zlib releases the GIL, so a dedicated writer thread overlaps it with
    the device work the main thread is waiting on. Byte order is
    preserved (single FIFO queue; direct text writes and close() drain
    the queue first)."""

    def __init__(self, path: str, fam_ids: List[str], iids: List[str],
                 chr_number: int, append: bool = False,
                 threaded: bool = True):
        # compresslevel 6 = the zlib default the reference's gzofstream uses
        # (Python's gzip defaults to 9, ~3x slower deflate — it was ~7 s
        # of the 98k-hap e2e output phase for a 2% size difference)
        self._f = gzip.open(path, "at" if append else "wt", compresslevel=6)
        self.fam = fam_ids
        self.iid = iids
        self.chr = chr_number
        self.n_written = 0
        self._id_blob = None          # lazy native-formatter id table
        self._id_off = None
        self._text_dirty = False      # text-wrapper bytes pending flush
        # per-resource accounting for the host roofline (ROOFLINE.md):
        # formatter CPU vs gzip-deflate CPU inside write_block
        self.fmt_s = 0.0
        self.deflate_s = 0.0
        self._q = None
        self._thr = None
        self._thr_err = None
        if threaded:
            import queue
            import threading
            self._q = queue.Queue(maxsize=64)
            self._thr = threading.Thread(target=self._deflate_loop,
                                         name="fastsmc-deflate",
                                         daemon=True)
            self._thr.start()

    def _deflate_loop(self):
        import time as _time
        from ..native import format_ibd
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                if isinstance(item, tuple):
                    # deferred bulk format: the native %.7g formatter is
                    # ~2 us/record of MAIN-thread time (18 s per 98k-hap
                    # ages run) — ctypes releases the GIL, so formatting
                    # joins deflate on this thread instead
                    (i1, h1, i2, h2, ps, pe, lcm, sc, pest, mest) = item
                    t0 = _time.perf_counter()
                    buf = format_ibd(self._id_blob, self._id_off, i1, h1,
                                     i2, h2, ps, pe, lcm, sc,
                                     str(self.chr), pest, mest)
                    self.fmt_s += _time.perf_counter() - t0
                else:
                    buf = item
                t0 = _time.perf_counter()
                self._f.buffer.write(buf)
                self.deflate_s += _time.perf_counter() - t0
            except BaseException as e:      # surfaced on the main thread
                self._thr_err = e
                return
            finally:
                self._q.task_done()

    def _sync_q(self):
        """Drain queued bulk writes (ordering barrier before any direct
        text write, flush, or close)."""
        if self._q is not None:
            self._q.join()
            if self._thr_err is not None:
                raise self._thr_err

    def write(self, r: IbdRecord) -> None:
        self._sync_q()
        parts = [self.fam[r.ind1], self.iid[r.ind1], str(r.hap1),
                 self.fam[r.ind2], self.iid[r.ind2], str(r.hap2),
                 str(self.chr), str(r.pos_start), str(r.pos_end)]
        if r.length_cm is not None:
            parts.append(fmt_float(np.float32(r.length_cm)))
        parts.append(fmt_float(r.score))
        if r.post_est is not None:
            parts.append(fmt_float(np.float32(r.post_est)))
        if r.map_est is not None:
            parts.append(fmt_float(np.float32(r.map_est)))
        self._f.write("\t".join(parts) + "\n")
        self.n_written += 1
        self._text_dirty = True

    def write_block(self, ind1, hap1, ind2, hap2, pos_start, pos_end,
                    length_cm, score, post_est=None, map_est=None) -> None:
        """Bulk write from column arrays — byte-identical to per-record
        :meth:`write` without the dataclass/dispatch overhead (a biobank
        run emits ~1e5-1e6 records; the per-record path is ~10 us each).
        Uses the native C formatter when available (same "%.7g" printf).
        ``length_cm`` / ``post_est`` / ``map_est`` may be None (column
        omitted) or float32 arrays; ``score`` is float64 (matching the
        per-record float division)."""
        import time as _time
        n = len(ind1)
        if n == 0:
            return
        from ..native import format_ibd, get_lib
        if get_lib() is not None:
            if self._id_blob is None:
                off = [0]
                blob = bytearray()
                for f_, i_ in zip(self.fam, self.iid):
                    blob += f"{f_}\t{i_}".encode() + b"\0"
                    off.append(len(blob))
                self._id_blob = bytes(blob)
                self._id_off = np.asarray(off, np.int32)
            if self._text_dirty:
                # order text-wrapper bytes before ours; skipping the flush
                # when clean avoids a Z_SYNC_FLUSH per flushed batch
                self._f.flush()
                self._text_dirty = False
            if self._q is not None:
                # format AND deflate on the writer thread (both release
                # the GIL); the column arrays are never mutated after
                # emit, so referencing them is safe. FIFO order with
                # direct writes is preserved by _sync_q.
                if self._thr_err is not None:
                    raise self._thr_err
                self._q.put((ind1, hap1, ind2, hap2, pos_start, pos_end,
                             length_cm, score, post_est, map_est))
                self.n_written += n
                return
            _t0 = _time.perf_counter()
            buf = format_ibd(self._id_blob, self._id_off, ind1, hap1,
                             ind2, hap2, pos_start, pos_end, length_cm,
                             score, str(self.chr), post_est, map_est)
            self.fmt_s += _time.perf_counter() - _t0
            _t0 = _time.perf_counter()
            self._f.buffer.write(buf)
            self.deflate_s += _time.perf_counter() - _t0
            self.n_written += n
            return
        fam, iid, ch = self.fam, self.iid, str(self.chr)
        out = []
        has_len = length_cm is not None
        for j in range(n):
            i1 = ind1[j]
            i2 = ind2[j]
            parts = [fam[i1], iid[i1], str(hap1[j]), fam[i2], iid[i2],
                     str(hap2[j]), ch, str(pos_start[j]), str(pos_end[j])]
            if has_len:
                parts.append("%.7g" % length_cm[j])
            parts.append("%.7g" % score[j])
            if post_est is not None:
                parts.append("%.7g" % post_est[j])
            if map_est is not None:
                parts.append("%.7g" % map_est[j])
            out.append("\t".join(parts))
        self._sync_q()
        self._f.write("\n".join(out) + "\n")
        self.n_written += len(out)
        self._text_dirty = True

    def close(self):
        if self._q is not None:
            self._sync_q()
            self._q.put(None)
            self._thr.join()
            self._q = None
        self._f.close()


class IbdBinaryWriter:
    """Binary ``.bibd.gz`` writer (HMM.cpp:383-401, 1146-1176)."""

    def __init__(self, path: str, fam_ids: List[str], iids: List[str],
                 chr_number: int, has_length: bool, has_post: bool,
                 has_map: bool, append: bool = False):
        self._f = gzip.open(path, "ab" if append else "wb",
                            compresslevel=6)
        self.has_length = has_length
        self.has_post = has_post
        self.has_map = has_map
        self.n_written = 0
        if append:
            return  # header was written by the original run
        f = self._f
        f.write(struct.pack("<???i", has_length, has_post, has_map,
                            chr_number))
        f.write(struct.pack("<I", len(fam_ids)))
        for fam, iid in zip(fam_ids, iids):
            fb = fam.encode()
            ib = iid.encode()
            f.write(struct.pack("<I", len(fb)))
            f.write(fb)
            f.write(struct.pack("<I", len(ib)))
            f.write(ib)

    def write(self, r: IbdRecord) -> None:
        f = self._f
        f.write(struct.pack("<IBIBii", r.ind1, r.hap1, r.ind2, r.hap2,
                            r.pos_start, r.pos_end))
        if self.has_length:
            f.write(struct.pack("<f", np.float32(r.length_cm)))
        f.write(struct.pack("<f", np.float32(r.score)))
        if self.has_post:
            f.write(struct.pack("<f", np.float32(r.post_est)))
        if self.has_map:
            f.write(struct.pack("<f", np.float32(r.map_est)))
        self.n_written += 1

    def write_block(self, ind1, hap1, ind2, hap2, pos_start, pos_end,
                    length_cm, score, post_est=None, map_est=None) -> None:
        """Bulk write from column arrays — byte-identical to per-record
        :meth:`write` (one packed numpy record dtype, no per-record
        struct.pack calls)."""
        n = len(ind1)
        if n == 0:
            return
        fields = [("i1", "<u4"), ("h1", "u1"), ("i2", "<u4"), ("h2", "u1"),
                  ("s", "<i4"), ("e", "<i4")]
        if self.has_length:
            fields.append(("len", "<f4"))
        fields.append(("score", "<f4"))
        if self.has_post:
            fields.append(("post", "<f4"))
        if self.has_map:
            fields.append(("map", "<f4"))
        rec = np.empty(n, np.dtype(fields))   # list-of-tuples dtype = packed
        rec["i1"] = ind1
        rec["h1"] = hap1
        rec["i2"] = ind2
        rec["h2"] = hap2
        rec["s"] = pos_start
        rec["e"] = pos_end
        if self.has_length:
            rec["len"] = np.asarray(length_cm, np.float32)
        rec["score"] = np.asarray(score, np.float32)
        if self.has_post:
            rec["post"] = np.asarray(post_est, np.float32)
        if self.has_map:
            rec["map"] = np.asarray(map_est, np.float32)
        self._f.write(rec.tobytes())
        self.n_written += n

    def close(self):
        self._f.close()


@dataclasses.dataclass
class IbdPairDataLine:
    """Mirror of BinaryDataReader.hpp:18-61."""
    ind1_fam_id: str
    ind1_id: str
    ind1_hap: int
    ind2_fam_id: str
    ind2_id: str
    ind2_hap: int
    chromosome: int
    ibd_start: int
    ibd_end: int
    length_cm: float = -1.0
    score: float = -1.0
    post_est: float = -1.0
    map_est: float = -1.0

    def to_string(self) -> str:
        parts = [self.ind1_fam_id, self.ind1_id, str(self.ind1_hap),
                 self.ind2_fam_id, self.ind2_id, str(self.ind2_hap),
                 str(self.chromosome), str(self.ibd_start), str(self.ibd_end)]
        if self.length_cm != -1.0:
            parts.append(fmt_float(self.length_cm))
        parts.append(fmt_float(self.score))
        if self.post_est != -1.0:
            parts.append(fmt_float(self.post_est))
        if self.map_est != -1.0:
            parts.append(fmt_float(self.map_est))
        return "\t".join(parts)


class BinaryDataReader:
    """Reader for ``.bibd.gz`` (BinaryDataReader.hpp:64-185)."""

    def __init__(self, path: str):
        self._f = gzip.open(path, "rb")
        hdr = self._f.read(3 + 4)
        self.has_length, self.has_post, self.has_map = (
            bool(hdr[0]), bool(hdr[1]), bool(hdr[2]))
        self.chr_number = struct.unpack("<i", hdr[3:7])[0]
        (n_ids,) = struct.unpack("<I", self._f.read(4))
        self.fam_ids = []
        self.iids = []
        for _ in range(n_ids):
            (lf,) = struct.unpack("<I", self._f.read(4))
            self.fam_ids.append(self._f.read(lf).decode())
            (li,) = struct.unpack("<I", self._f.read(4))
            self.iids.append(self._f.read(li).decode())

    def __iter__(self):
        while True:
            head = self._f.read(4)
            if len(head) < 4:
                return
            (ind1,) = struct.unpack("<I", head)
            hap1, = struct.unpack("<B", self._f.read(1))
            ind2, = struct.unpack("<I", self._f.read(4))
            hap2, = struct.unpack("<B", self._f.read(1))
            start, end = struct.unpack("<ii", self._f.read(8))
            line = IbdPairDataLine(
                ind1_fam_id=self.fam_ids[ind1], ind1_id=self.iids[ind1],
                ind1_hap=hap1,
                ind2_fam_id=self.fam_ids[ind2], ind2_id=self.iids[ind2],
                ind2_hap=hap2,
                chromosome=self.chr_number, ibd_start=start, ibd_end=end)
            if self.has_length:
                (line.length_cm,) = struct.unpack("<f", self._f.read(4))
            (line.score,) = struct.unpack("<f", self._f.read(4))
            if self.has_post:
                (line.post_est,) = struct.unpack("<f", self._f.read(4))
            if self.has_map:
                (line.map_est,) = struct.unpack("<f", self._f.read(4))
            yield line

    def close(self):
        self._f.close()


# ---------------------------------------------------------------------------
# posterior sum matrices (main.cpp:119-167)
# ---------------------------------------------------------------------------

def read_expected_times_from_intervals_file(path: str) -> np.ndarray:
    """Parse an ``.intervalsInfo``-style file into expected coalescent times.

    Mirrors ``readExpectedTimesFromIntervalsFile`` (HMM.cpp:40-61): each line
    is "intervalStart expectedCoalescentTime intervalEnd"; the middle column
    is kept (float32).
    """
    opener = gzip.open if path.endswith(".gz") else open
    times = []
    with opener(path, "rt") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if len(parts) != 3:
                raise ValueError(
                    f"{path} should have \"intervalStart\t"
                    f"expectedCoalescentTime\tintervalEnd\" at each line.")
            times.append(np.float32(parts[1]))
    return np.asarray(times, np.float32)


class PerPairStreamWriter:
    """Streaming gzip writer for ``.perPairPosteriorMeans.gz`` /
    ``.perPairMAP.gz`` (HMM.cpp:258-271, 1414-1419).

    One row per decoded pair, space-separated, Eigen FullPrecision float
    formatting (max_digits10 == 9 for float). The reference's Eigen format
    uses "\\n" as the row separator with no terminator, which concatenates
    the last row of one batch with the first row of the next; we terminate
    every row (deliberate, documented fix — files stay line-parseable).
    """

    def __init__(self, path: str, integers: bool = False):
        self._f = gzip.open(path, "wt")
        self._int = integers

    def write_rows(self, mat: np.ndarray) -> None:
        for row in mat:
            if self._int:
                self._f.write(" ".join(str(int(v)) for v in row))
            else:
                self._f.write(" ".join("%.9g" % float(v) for v in row))
            self._f.write("\n")

    def close(self) -> None:
        self._f.close()


def _eigen_tab_format(mat: np.ndarray) -> str:
    # Eigen StreamPrecision default-float (like %g with precision 6... Eigen
    # StreamPrecision uses the stream default precision 6); reference uses
    # the stream's default operator<< on floats.
    lines = []
    for row in mat:
        lines.append("\t".join("%.6g" % float(v) for v in row))
    return "\n".join(lines)


def write_sum_over_pairs(path: str, mat: np.ndarray) -> None:
    with gzip.open(path, "wt") as f:
        f.write(_eigen_tab_format(mat))
        f.write("\n")


def write_major_minor_sums(out_root: str, sums00: np.ndarray,
                           sums01: np.ndarray, sums11: np.ndarray,
                           flipped: np.ndarray) -> None:
    """main.cpp:126-165: 00/11 matrices swap rows where the site was flipped
    during minor-allele folding."""
    sites = sums00.shape[0]
    m00 = np.where(flipped[:, None], sums11, sums00)
    m11 = np.where(flipped[:, None], sums00, sums11)
    write_sum_over_pairs(out_root + ".00.sumOverPairs.gz", m00)
    write_sum_over_pairs(out_root + ".01.sumOverPairs.gz", sums01)
    write_sum_over_pairs(out_root + ".11.sumOverPairs.gz", m11)
