"""IBD segment extraction: the 4-level threshold state machine.

Vectorised mirror of ``HMM::writePerPairOutputFastSMC`` (reference
HMM.cpp:1179-1357).  The reference walks positions per pair keeping four
"recall level" flags (isIBD / isIBD1 / isIBD2 / isIBD3); a segment is a
maximal run of constant level, emitted with

  * score   = (sum over run of the below-threshold posterior mass)
              / run length in positions              (HMM.cpp:1130)
  * age estimates from the per-state posterior summed over the run
    (posterior mean HMM.cpp:1087-1097; MAP HMM.cpp:1099-1107)

Levels (HMM.cpp:1226/1254/1281/1308):
  level 0: sum >= 1000 * probabilityThreshold
  level 1: sum >=  100 * probabilityThreshold
  level 2: sum >=   10 * probabilityThreshold
  level 3: sum >=        probabilityThreshold
  else: no IBD

The run/emission structure here is equivalent to the reference's flag
machine: entering a different level ends the previous run, a drop below all
thresholds ends it, and the window end flushes the active run.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class Segment:
    pair: int          # batch index
    start: int         # position index (absolute)
    end: int           # position index (absolute, inclusive)
    score_sum: float   # cumulative posterior (before dividing by length)
    pps: Optional[np.ndarray]  # per-state posterior sums [age_threshold]


def state_threshold(discretization: np.ndarray, time: int, states: int) -> int:
    """HMM::getStateThreshold (HMM.cpp:504-513)."""
    r = 0
    while r < states and discretization[r] < float(time):
        r += 1
    return r


def probability_threshold(initial_state_prob: np.ndarray, st: int) -> float:
    """HMM.cpp:96-99: cumulative initial-state mass below the threshold
    (sequential float32 sum like the reference)."""
    s = np.float32(0.0)
    for x in initial_state_prob[:st]:
        s = np.float32(s + np.float32(x))
    return float(s)


def levels_from_sums(sums: np.ndarray, prob_threshold: float) -> np.ndarray:
    """sums [T, P] -> level [T, P] uint8 (0..3 active, 4 = none)."""
    p = np.float32(prob_threshold)
    lvl = np.full(sums.shape, 4, dtype=np.uint8)
    lvl[sums >= p] = 3
    lvl[sums >= np.float32(10.0) * p] = 2
    lvl[sums >= np.float32(100.0) * p] = 1
    lvl[sums >= np.float32(1000.0) * p] = 0
    return lvl


def extract_runs(sums: np.ndarray, prob_threshold: float
                 ) -> tuple:
    """Vectorised run detection over the whole batch at once.

    ``sums`` is the device-reduced [T, P] threshold-sum matrix; no per-pair
    Python loop — boundaries come from one boolean diff over the batch
    (the cumsum-over-break-flags formulation, cf. hashing/vectorized.py).

    Returns (pair, start, end, score) arrays, ordered pair-major then by
    start (the reference's emission order, HMM.cpp:1179-1357); runs at
    level 4 (below every threshold) are dropped.
    """
    T, P = sums.shape
    lvl = levels_from_sums(sums, prob_threshold)
    lv = lvl.T                                         # [P, T]
    chg = np.empty((P, T), dtype=bool)
    chg[:, 0] = True
    np.not_equal(lv[:, 1:], lv[:, :-1], out=chg[:, 1:])
    flat = np.flatnonzero(chg.reshape(-1))
    pair = flat // T
    a = flat % T
    b = np.empty_like(a)
    if len(a):
        b[:-1] = np.where(pair[1:] == pair[:-1], a[1:] - 1, T - 1)
        b[-1] = T - 1
    keep = lv[pair, a] != 4
    pair, a, b = pair[keep], a[keep], b[keep]
    # run scores via prefix sums (float64: differencing error ~1e-13 on
    # posteriors <= 1, far below the float32 data)
    cs = np.empty((T + 1, P), np.float64)
    cs[0] = 0.0
    np.cumsum(sums, axis=0, dtype=np.float64, out=cs[1:])
    score = cs[b + 1, pair] - cs[a, pair]
    return pair, a, b, score


def extract_segments(
        sums: np.ndarray,                     # [T, P] threshold sums
        prob_threshold: float,
        from_pos: int,                        # absolute start of window
        posterior: Optional[np.ndarray] = None,   # [T, K, P] if ages wanted
        age_threshold: int = 0,
        ) -> List[Segment]:
    """Extract segments for a batch window.  Positions in the output are
    absolute (``from_pos`` added)."""
    pair, a, b, score = extract_runs(sums, prob_threshold)
    want_pps = posterior is not None
    out: List[Segment] = []
    for i in range(len(pair)):
        pps = None
        if want_pps:
            pps = posterior[a[i]:b[i] + 1, :age_threshold,
                            pair[i]].sum(axis=0)
        out.append(Segment(pair=int(pair[i]), start=from_pos + int(a[i]),
                           end=from_pos + int(b[i]),
                           score_sum=float(score[i]), pps=pps))
    return out


def posterior_mean_from_pps(pps: np.ndarray, expected_times: np.ndarray
                            ) -> float:
    """HMM::getPosteriorMean (HMM.cpp:1087-1097)."""
    norm = 1.0 / float(np.float32(pps.sum()))
    return float(np.float32(np.sum(
        np.float32(norm) * pps * expected_times[:len(pps)])))


def map_from_pps(pps: np.ndarray, initial_state_prob: np.ndarray,
                 expected_times: np.ndarray) -> float:
    """HMM::getMAP (HMM.cpp:1099-1107)."""
    ratio = pps / initial_state_prob[:len(pps)]
    return float(expected_times[int(np.argmax(ratio))])
