"""IBD segment F1 vs the shipped FastSMC v1.0 golden outputs.

The north-star accuracy metric (BASELINE.json): how close is this engine's
end-to-end FastSMC output to the reference's, on the reference's own
example (`FILES/FASTSMC_EXAMPLE`, test_fastsmc_regression.cpp:32-161)?

Byte parity is impossible from the public snapshot — two inputs are missing
(PARITY.md): the panel's genetic map and UKBB.frq (the array-ascertainment
frequencies behind example.decodingQuantities.gz). This script gets as
close as the data allows:

  1. **Map reconstruction.** Every golden IBD record carries
     `length_cm = cm[end] - cm[start]` (float32, %.7g). The 4,510 records
     give pairwise cM *differences* between 2,422 SNP positions; the
     largest connected component (1,941 sites) is solved exactly by least
     squares (residual ~1e-7 cM, monotone), and the remaining sites are
     interpolated between anchors (mean rate extrapolation at the ends).
  2. **Decoding quantities** regenerated from CEU.demo + 30-100-2000.disc
     + the shipped n=300 CSFS, ascertained with the panel's own allele
     frequencies (UKBB.frq being unavailable).
  3. Run FastSMC with the exact regression-test parameter sets
     (hashing job 1/1; no-hashing job 7/9) and score against
     regression_output.ibd.gz (1,524 segments) /
     regression_output_no_hashing.ibd.gz (2,986 segments).

Metrics (per golden file): base-pair-level precision/recall/F1 over
per-pair merged intervals, plus segment-level P/R/F1 at >=50% overlap.

Run on TPU (one process at a time):
  cd /root/repo && nohup /opt/venv/bin/python scripts/f1_vs_reference.py \
      > /tmp/f1_vs_reference.log 2>&1 &
CPU fallback: add --cpu (slow: the 7/9 no-hashing job decodes ~5k pairs).
"""

import gzip
import json
import os
import sys
import time
from collections import Counter, defaultdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF = "/root/reference/FILES/FASTSMC_EXAMPLE"
ART = os.path.join(REPO, "artifacts", "fastsmc_example")


# ---------------------------------------------------------------------------
# 1. map reconstruction from golden length_cm columns
# ---------------------------------------------------------------------------

def panel_positions():
    pos = []
    with gzip.open(os.path.join(REF, "example.hap.gz"), "rt") as f:
        for line in f:
            pos.append(int(line.split(maxsplit=3)[2]))
    return np.asarray(pos, np.int64)


def golden_edges():
    edges = []
    for fn in ("regression_output.ibd.gz",
               "regression_output_no_hashing.ibd.gz"):
        with gzip.open(os.path.join(REF, fn), "rt") as f:
            for line in f:
                c = line.split("\t")
                a, b, L = int(c[7]), int(c[8]), float(c[9])
                if a != b:
                    edges.append((a, b, L))
    return edges


def reconstruct_map(verbose=True):
    """Returns (pos [L], cm [L], anchored_mask [L])."""
    import scipy.sparse as sp
    from scipy.sparse.linalg import lsqr

    pos = panel_positions()
    edges = golden_edges()
    eps = np.unique([e[0] for e in edges] + [e[1] for e in edges])
    idx = {p: i for i, p in enumerate(eps)}

    parent = list(range(len(eps)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in edges:
        ra, rb = find(idx[a]), find(idx[b])
        if ra != rb:
            parent[ra] = rb
    comp = Counter(find(i) for i in range(len(eps)))
    giant_root = comp.most_common(1)[0][0]
    giant = np.array([i for i in range(len(eps)) if find(i) == giant_root])
    gset = set(giant.tolist())
    gidx = {i: j for j, i in enumerate(giant)}

    rows, cols, vals, rhs = [], [], [], []
    r = 0
    for a, b, L in edges:
        ia, ib = idx[a], idx[b]
        if ia in gset and ib in gset:
            rows += [r, r]
            cols += [gidx[ib], gidx[ia]]
            vals += [1.0, -1.0]
            rhs.append(L)
            r += 1
    rows += [r]
    cols += [0]
    vals += [1.0]
    rhs.append(0.0)
    r += 1
    A = sp.csr_matrix((vals, (rows, cols)), shape=(r, len(giant)))
    sol = lsqr(A, np.array(rhs), atol=1e-12, btol=1e-12, iter_lim=20000)
    cmg = sol[0]
    res = A @ cmg - np.array(rhs)

    gp = eps[giant].astype(np.float64)
    order = np.argsort(gp)
    gps, cms = gp[order], cmg[order]
    cms -= cms[0]
    assert np.all(np.diff(cms) > 0), "reconstructed map not monotone"
    if verbose:
        print(f"[map] {len(giant)} anchored sites, {r - 1} constraints, "
              f"max residual {np.abs(res).max():.2e} cM, span "
              f"{cms[-1]:.2f} cM")

    # interpolate remaining sites; extrapolate with the mean anchored rate
    rate = (cms[-1] - cms[0]) / (gps[-1] - gps[0])
    cm = np.interp(pos.astype(np.float64), gps, cms,
                   left=np.nan, right=np.nan)
    lo = pos < gps[0]
    hi = pos > gps[-1]
    cm[lo] = cms[0] - (gps[0] - pos[lo]) * rate
    cm[hi] = cms[-1] + (pos[hi] - gps[-1]) * rate
    cm -= cm.min()
    anchored = np.isin(pos, eps[giant])
    assert np.all(np.diff(cm) >= 0)
    # strictly increasing for interpolation safety downstream
    cm = np.maximum.accumulate(cm + np.arange(len(cm)) * 1e-9)
    return pos, cm, anchored


def write_panel_dir(pos, cm):
    """Build the run directory: symlinked haps/samples + reconstructed map
    (FastSMC 3-column format, Data.cpp:98-141)."""
    os.makedirs(ART, exist_ok=True)
    root = os.path.join(ART, "example")
    for suffix in (".hap.gz", ".samples"):
        dst = root + suffix
        if not os.path.exists(dst):
            os.symlink(os.path.join(REF, "example" + suffix), dst)
    with gzip.open(root + ".map.gz", "wt") as f:
        f.write("pos rate cm\n")
        for p, c in zip(pos, cm):
            f.write(f"{p}\t0\t{c:.10f}\n")
    return root


# ---------------------------------------------------------------------------
# 2. decoding quantities (panel-frequency ascertainment)
# ---------------------------------------------------------------------------

def ensure_dq(root):
    dq_path = os.path.join(ART, "example.decodingQuantities.npz")
    if os.path.exists(dq_path):
        return dq_path
    from fastsmc_tpu.prepare.make_dq import prepare_decoding
    print("[dq] regenerating decoding quantities (panel-frequency "
          "ascertainment; UKBB.frq unavailable) ...")
    dq = prepare_decoding(
        demography_file="/root/reference/FILES/CEU.demo",
        discretization_file="/root/reference/FILES/DISC/30-100-2000.disc",
        csfs_file="/root/reference/FILES/DECODING_QUANTITIES/30-100-2000.csfs",
        file_root=root, samples=300)
    dq.save_npz(dq_path)
    return dq_path


# ---------------------------------------------------------------------------
# 3. run FastSMC with the regression-test parameter sets
# ---------------------------------------------------------------------------

def run_fastsmc(root, dq_path, out_root, hashing, jobs=1, job_ind=1,
                cpu=False, permissive=False):
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    params = DecodingParams.fastsmc_defaults(
        root, dq_path, out_root,
        hashing=hashing, jobs=jobs, job_ind=job_ind,
        use_known_seed=True, batch_size=32,
        output_ibd_segment_length=True,
        permissive_window=permissive)
    # exact test_fastsmc_regression.cpp:34-53 settings
    assert params.min_m == 1.5 and params.time == 50
    assert params.no_conditional_age_estimates
    assert params.do_per_pair_posterior_mean and params.do_per_pair_map
    t0 = time.time()
    # permissive = reproduce the reference's batch-union flow exactly
    # (arrival order, union windows, batch 32); default = the production
    # canonical-window semantics
    kw = dict(bucket_sites=0) if permissive else {}
    f = FastSMC(params, use_pallas=None if not cpu else False, **kw)
    path = f.run(verbose=False)
    print(f"[run] {os.path.basename(out_root)}: {f.n_segments} segments "
          f"({f._cpt} candidates) in {time.time() - t0:.1f}s")
    return path


# ---------------------------------------------------------------------------
# 4. interval F1
# ---------------------------------------------------------------------------

def read_segments(path):
    """{pair_key: [(start, end bp)]} with pair key orientation-normalized."""
    out = defaultdict(list)
    with gzip.open(path, "rt") as f:
        for line in f:
            c = line.rstrip("\n").split("\t")
            k1 = (c[0], c[1], c[2])
            k2 = (c[3], c[4], c[5])
            key = (k1, k2) if k1 <= k2 else (k2, k1)
            out[key].append((int(c[7]), int(c[8])))
    return out


def merge_intervals(iv):
    iv = sorted(iv)
    out = [list(iv[0])]
    for s, e in iv[1:]:
        if s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return out


def overlap_len(a, b):
    """Total intersection of two merged interval lists."""
    i = j = tot = 0
    while i < len(a) and j < len(b):
        s = max(a[i][0], b[j][0])
        e = min(a[i][1], b[j][1])
        if s <= e:
            tot += e - s + 1
        if a[i][1] < b[j][1]:
            i += 1
        else:
            j += 1
    return tot


def f1_scores(golden_path, ours_path):
    gold = read_segments(golden_path)
    ours = read_segments(ours_path)

    # base-pair level over merged per-pair intervals
    g_tot = o_tot = inter = 0
    for key in set(gold) | set(ours):
        gm = merge_intervals(gold[key]) if key in gold else []
        om = merge_intervals(ours[key]) if key in ours else []
        g_tot += sum(e - s + 1 for s, e in gm)
        o_tot += sum(e - s + 1 for s, e in om)
        if gm and om:
            inter += overlap_len(gm, om)
    bp_p = inter / o_tot if o_tot else 0.0
    bp_r = inter / g_tot if g_tot else 0.0
    bp_f1 = 2 * bp_p * bp_r / (bp_p + bp_r) if bp_p + bp_r else 0.0

    # segment level: matched iff some segment of the same pair covers >=50%
    def matched(segs_a, segs_b):
        n = 0
        for key, lst in segs_a.items():
            other = segs_b.get(key)
            if not other:
                continue
            om = merge_intervals(other)
            for s, e in lst:
                if overlap_len([[s, e]], om) >= 0.5 * (e - s + 1):
                    n += 1
        return n

    n_gold = sum(len(v) for v in gold.values())
    n_ours = sum(len(v) for v in ours.values())
    seg_r = matched(gold, ours) / n_gold if n_gold else 0.0
    seg_p = matched(ours, gold) / n_ours if n_ours else 0.0
    seg_f1 = 2 * seg_p * seg_r / (seg_p + seg_r) if seg_p + seg_r else 0.0
    return {
        "golden_segments": n_gold, "our_segments": n_ours,
        "bp_precision": round(bp_p, 4), "bp_recall": round(bp_r, 4),
        "bp_f1": round(bp_f1, 4),
        "seg_precision": round(seg_p, 4), "seg_recall": round(seg_r, 4),
        "seg_f1": round(seg_f1, 4),
    }


def main():
    cpu = "--cpu" in sys.argv
    if cpu:
        # the axon sitecustomize pins the platform; env vars alone do not
        # switch to CPU (CLAUDE.md) — must be set before any jax use
        import jax
        jax.config.update("jax_platforms", "cpu")
    pos, cm, anchored = reconstruct_map()
    root = write_panel_dir(pos, cm)
    dq_path = ensure_dq(root)

    out_hash = run_fastsmc(root, dq_path, "/tmp/f1_hashing",
                           hashing=True, cpu=cpu, permissive=True)
    res_hash = f1_scores(os.path.join(REF, "regression_output.ibd.gz"),
                         out_hash)
    print("[f1] hashing 1/1 (permissive, reference semantics):",
          json.dumps(res_hash))

    out_hash_c = run_fastsmc(root, dq_path, "/tmp/f1_hashing_canon",
                             hashing=True, cpu=cpu, permissive=False)
    res_hash_c = f1_scores(os.path.join(REF, "regression_output.ibd.gz"),
                           out_hash_c)
    print("[f1] hashing 1/1 (canonical windows, production default):",
          json.dumps(res_hash_c))

    out_nh = run_fastsmc(root, dq_path, "/tmp/f1_nohash",
                         hashing=False, jobs=9, job_ind=7, cpu=cpu)
    res_nh = f1_scores(
        os.path.join(REF, "regression_output_no_hashing.ibd.gz"), out_nh)
    print("[f1] no-hashing 7/9:", json.dumps(res_nh))

    result = {
        "metric": "ibd_f1_vs_reference_goldens",
        "map_anchored_sites": int(anchored.sum()),
        "map_total_sites": int(len(pos)),
        "hashing": res_hash,
        "hashing_canonical_windows": res_hash_c,
        "no_hashing_7_9": res_nh,
        "caveats": "reconstructed genetic map (1,941/6,760 sites exactly "
                   "anchored from golden cM lengths, rest interpolated); "
                   "panel-frequency ascertainment instead of the "
                   "unavailable UKBB.frq",
    }
    with open(os.path.join(REPO, "F1_VS_REFERENCE.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    print("F1_VS_REFERENCE_OK")


if __name__ == "__main__":
    main()
