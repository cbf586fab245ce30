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


def extract_segments(
        sums: np.ndarray,                     # [T, P] threshold sums
        prob_threshold: float,
        from_pos: int,                        # absolute start of window
        posterior: Optional[np.ndarray] = None,   # [T, K, P] if ages wanted
        age_threshold: int = 0,
        ) -> List[Segment]:
    """Extract segments for a batch window.  Positions in the output are
    absolute (``from_pos`` added)."""
    T, P = sums.shape
    lvl = levels_from_sums(sums, prob_threshold)
    out: List[Segment] = []
    want_pps = posterior is not None
    for p in range(P):
        col = lvl[:, p]
        # run boundaries
        change = np.flatnonzero(col[1:] != col[:-1]) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change - 1, [T - 1]])
        for a, b in zip(starts, ends):
            if col[a] == 4:
                continue
            score = float(sums[a:b + 1, p].sum(dtype=np.float64))
            pps = None
            if want_pps:
                pps = posterior[a:b + 1, :age_threshold, p].sum(axis=0)
            out.append(Segment(pair=p, start=from_pos + int(a),
                               end=from_pos + int(b), score_sum=score,
                               pps=pps))
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
