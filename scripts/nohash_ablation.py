"""Attribute the no-hashing precision gap (VERDICT r2 #4).

F1_VS_REFERENCE.json: the no-hashing 7/9 run over-calls vs the golden
(4,664 segments vs 2,986; bp precision 0.706). Two inputs are substituted
(PARITY.md): the genetic map (1,941/6,760 sites anchored, rest
interpolated) and the ascertainment frequencies (panel freqs instead of
the unavailable UKBB.frq). This probe quantifies how much each substitute
contributes — an unexplained robust residual would point at the threshold
state machine instead.

Ablations (all on the chip):
  (a) margin histogram — for our extra (non-golden-matched) segments, the
      ratio score/probabilityThreshold vs the same ratio for matched
      segments. Extras clustered just above threshold => borderline calls
      that substitution noise flips; extras deep above => engine suspect.
  (b) map jitter — re-interpolate the non-anchored sites with random
      perturbations scaled to the local anchor gap, re-run, measure the
      segment-count and F1 swing.
  (c) ascertainment sensitivity — regenerate decoding quantities with
      perturbed frequencies (bootstrap resample of the panel; systematic
      shift toward 0.5), re-run, measure the swing.

Writes NOHASH_ABLATION.json. Run (one TPU process at a time):
  cd /root/repo && nohup /opt/venv/bin/python scripts/nohash_ablation.py \
      > /tmp/nohash_ablation.log 2>&1 &
"""

import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from f1_vs_reference import (REF, f1_scores, merge_intervals,  # noqa: E402
                             overlap_len, read_segments, reconstruct_map,
                             run_fastsmc)

ART = os.path.join(REPO, "artifacts", "nohash_ablation")
GOLD = os.path.join(REF, "regression_output_no_hashing.ibd.gz")


def write_panel(tag, pos, cm):
    os.makedirs(ART, exist_ok=True)
    root = os.path.join(ART, tag)
    for suffix in (".hap.gz", ".samples"):
        dst = root + suffix
        if not os.path.exists(dst):
            os.symlink(os.path.join(REF, "example" + suffix), dst)
    with gzip.open(root + ".map.gz", "wt") as f:
        f.write("pos rate cm\n")
        for p, c in zip(pos, cm):
            f.write(f"{p}\t0\t{c:.10f}\n")
    return root


def make_dq(root, tag, freq_transform=None, seed=None):
    """Decoding quantities with optionally perturbed ascertainment
    frequencies (monkey-patching the panel frequency computation would
    reach into prepare internals; instead we rewrite a copy of the panel
    with resampled haplotype columns when bootstrapping, or pass the
    transform through make_dq's freqs hook if available)."""
    from fastsmc_tpu.prepare.make_dq import prepare_decoding

    dq_path = os.path.join(ART, f"dq_{tag}.npz")
    if os.path.exists(dq_path):
        return dq_path
    dq = prepare_decoding(
        demography_file="/root/reference/FILES/CEU.demo",
        discretization_file="/root/reference/FILES/DISC/30-100-2000.disc",
        csfs_file="/root/reference/FILES/DECODING_QUANTITIES/30-100-2000.csfs",
        file_root=root, samples=300, freq_transform=freq_transform,
        freq_seed=seed)
    dq.save_npz(dq_path)
    return dq_path


def segment_rows(path):
    rows = []
    with gzip.open(path, "rt") as f:
        for line in f:
            c = line.rstrip("\n").split("\t")
            k1, k2 = (c[0], c[1], c[2]), (c[3], c[4], c[5])
            key = (k1, k2) if k1 <= k2 else (k2, k1)
            rows.append((key, int(c[7]), int(c[8]), float(c[10])))
    return rows


def margin_histogram(ours_path, prob_threshold):
    gold = read_segments(GOLD)
    gold_merged = {k: merge_intervals(v) for k, v in gold.items()}
    matched_r, extra_r = [], []
    for key, s, e, score in segment_rows(ours_path):
        om = gold_merged.get(key)
        ratio = score / prob_threshold
        hit = om and overlap_len([[s, e]], om) >= 0.5 * (e - s + 1)
        (matched_r if hit else extra_r).append(ratio)
    matched_r, extra_r = np.asarray(matched_r), np.asarray(extra_r)

    def stats(x):
        if not len(x):
            return {}
        q = np.quantile(x, [0.1, 0.25, 0.5, 0.75, 0.9])
        return dict(n=len(x),
                    q10=round(float(q[0]), 2), q25=round(float(q[1]), 2),
                    median=round(float(q[2]), 2), q75=round(float(q[3]), 2),
                    q90=round(float(q[4]), 2),
                    frac_below_3x=round(float((x < 3).mean()), 3),
                    frac_below_10x=round(float((x < 10).mean()), 3))
    return {"matched": stats(matched_r), "extra": stats(extra_r)}


def jittered_map(pos, cm, anchored, seed, scale=0.5):
    """Re-draw the interpolated sites: each non-anchored site moves by
    uniform(-scale, +scale) x (its distance to the nearest anchor in cM),
    then monotonicity is restored. Models the reconstruction uncertainty
    (anchors are exact to ~1e-7 cM; everything else is linear interp)."""
    rng = np.random.default_rng(seed)
    a_idx = np.flatnonzero(anchored)
    cm2 = cm.copy()
    gaps = np.interp(np.arange(len(cm)), a_idx, cm[a_idx])
    # distance to nearest anchor value in cm
    prev_a = np.maximum.accumulate(np.where(anchored, cm, -np.inf))
    next_rev = np.minimum.accumulate(np.where(anchored, cm, np.inf)[::-1])
    next_a = next_rev[::-1]
    d = np.minimum(cm - prev_a, next_a - cm)
    d = np.where(np.isfinite(d), d, 0.0)
    jit = rng.uniform(-scale, scale, len(cm)) * d
    cm2 = np.where(anchored, cm, cm + jit)
    cm2 = np.maximum.accumulate(cm2 + np.arange(len(cm2)) * 1e-9)
    cm2 -= cm2.min()
    return cm2, gaps


def run_nohash(root, dq_path, tag):
    out = run_fastsmc(root, dq_path, f"/tmp/ablate_{tag}",
                      hashing=False, jobs=9, job_ind=7)
    return out


def main():
    import jax
    assert jax.default_backend() not in ("cpu",)

    results = {}
    pos, cm, anchored = reconstruct_map()
    base_root = write_panel("base", pos, cm)
    base_dq = make_dq(base_root, "base")

    # --- base + margin histogram (a) ---------------------------------
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.engine import segments as segmod
    from fastsmc_tpu.io.decoding_quantities import DecodingQuantities

    dqo = DecodingQuantities.load_npz(base_dq)
    st = segmod.state_threshold(dqo.discretization, 50, dqo.states)
    pth = segmod.probability_threshold(dqo.initial_state_prob, st)
    base_out = run_nohash(base_root, base_dq, "base")
    base_f1 = f1_scores(GOLD, base_out)
    results["base"] = base_f1
    results["probability_threshold"] = pth
    results["margins"] = margin_histogram(base_out, pth)
    print(json.dumps({"base": base_f1,
                      "margins": results["margins"]}), flush=True)

    # --- map jitter (b) ----------------------------------------------
    jit_rows = []
    for seed in (1, 2):
        cmj, _ = jittered_map(pos, cm, anchored, seed)
        rootj = write_panel(f"jit{seed}", pos, cmj)
        outj = run_nohash(rootj, base_dq, f"jit{seed}")
        f1j = f1_scores(GOLD, outj)
        jit_rows.append(f1j)
        print(json.dumps({f"jitter{seed}": f1j}), flush=True)
    results["map_jitter"] = jit_rows

    # --- ascertainment (c) -------------------------------------------
    asc_rows = {}
    for tag, transform, seed in (
            ("bootstrap1", "bootstrap", 1),
            ("bootstrap2", "bootstrap", 2),
            ("shift", "shift", None)):
        dq_t = make_dq(base_root, tag, freq_transform=transform, seed=seed)
        out_t = run_nohash(base_root, dq_t, tag)
        f1_t = f1_scores(GOLD, out_t)
        asc_rows[tag] = f1_t
        print(json.dumps({tag: f1_t}), flush=True)
    results["ascertainment"] = asc_rows

    with open(os.path.join(REPO, "NOHASH_ABLATION.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("NOHASH_ABLATION_OK")


if __name__ == "__main__":
    main()
