"""End-to-end walkthrough (the reference's notebooks/fastsmc.ipynb flow).

Builds every model artifact from raw inputs, runs both pipelines, and
touches the analysis APIs — a copy-paste starting point for new users.

Run from the repo root:  /opt/venv/bin/python examples/walkthrough.py
(CPU-safe; on a TPU host the decode runs on the chip automatically.)
"""

import gzip
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("WALKTHROUGH_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

OUT = "/tmp/fastsmc_tpu_walkthrough"
os.makedirs(OUT, exist_ok=True)
PANEL = "/root/reference/FILES/EXAMPLE/exampleFile.n300.array"

# ---------------------------------------------------------------------------
# 1. Prepare decoding quantities (TOOLS/PREPARE_DECODING equivalent).
#    No smcpp needed: the CSFS is computed from the demography when no
#    .csfs file is supplied. n=30 keeps this demo fast; production uses 300.
# ---------------------------------------------------------------------------
from fastsmc_tpu.prepare.make_dq import prepare_decoding, write_intervals_info

dq = prepare_decoding(
    demography_file="/root/reference/FILES/CEU.demo",
    discretization_file="/root/reference/FILES/DISC/30-100-2000.disc",
    csfs_file=None,                    # computed from the demography
    file_root=PANEL, samples=30)
dq_path = f"{OUT}/model.decodingQuantities.npz"
dq.save_npz(dq_path)
write_intervals_info(dq, f"{OUT}/model.intervalsInfo")
print(f"[1] decoding quantities: {dq.states} states -> {dq_path}")

# ---------------------------------------------------------------------------
# 2. ASMC: all-pairs posterior sums for one job of a flat pair split.
# ---------------------------------------------------------------------------
from fastsmc_tpu import DecodingParams
from fastsmc_tpu.pipelines.asmc import ASMC

params = DecodingParams.asmc(
    PANEL, dq_path, out_file_root=f"{OUT}/asmc",
    do_posterior_sums=True, use_known_seed=True, jobs=400, job_ind=7)
asmc = ASMC(params)
res = asmc.decode_all_in_job(verbose=False)
asmc.write_outputs(res)
print(f"[2] ASMC sums {res.sum_over_pairs.shape} "
      f"-> {OUT}/asmc.sumOverPairs.gz")

# ---------------------------------------------------------------------------
# 3. Targeted pair decoding (the python decodePairs API). decodePairs
#    indexes the full panel, so use a jobs-free ASMC instance (jobbing
#    window-subsets the loaded samples, as in the reference).
# ---------------------------------------------------------------------------
asmc_full = ASMC(DecodingParams.asmc(
    PANEL, dq_path, out_file_root=f"{OUT}/asmc_full",
    do_posterior_sums=True, use_known_seed=True))
pairs = asmc_full.decode_pairs([0, 3, 11], [7, 40, 200],
                               per_pair_posteriors=True,
                               per_pair_posterior_means=True,
                               per_pair_maps=True)
print(f"[3] decodePairs posteriors {pairs.per_pair_posteriors.shape}; "
      f"first pair mean TMRCA at site 0: "
      f"{pairs.per_pair_posterior_means[0, 0]:.1f} generations")

# ---------------------------------------------------------------------------
# 4. FastSMC: two-stage IBD detection on a synthetic panel with planted
#    segments (the shipped example panels lack a FastSMC-valid map).
# ---------------------------------------------------------------------------
from fastsmc_tpu.pipelines.fastsmc import FastSMC

rng = np.random.default_rng(0)
n_ind, sites = 120, 640
bits = (rng.random((2 * n_ind, sites))
        < rng.uniform(0.05, 0.5, sites)).astype(np.uint8)
planted = [(0, 31, 64, 512), (50, 101, 128, 576)]
for a, b, s, e in planted:
    bits[b, s:e] = bits[a, s:e]
bp = (np.arange(sites) + 1) * 5000
root = f"{OUT}/panel"
with gzip.open(root + ".hap.gz", "wt") as f:
    for s in range(sites):
        f.write(f"1 SNP_{s} {bp[s]} A G "
                + " ".join(str(int(x)) for x in bits[:, s]) + "\n")
with open(root + ".samples", "w") as f:
    f.write("ID_1 ID_2 missing\n0 0 0\n")
    for i in range(n_ind):
        f.write(f"fam{i} ind{i} 0\n")
with open(root + ".map", "w") as f:
    for s, cm in enumerate(np.linspace(0.0, 8.0, sites)):
        f.write(f"{bp[s]}\t0\t{cm}\n")

fp = DecodingParams.fastsmc_defaults(
    root, dq_path, f"{OUT}/ibd", use_known_seed=True, min_m=0.5)
path = FastSMC(fp, hashing_backend="device").run(verbose=False)
with gzip.open(path, "rt") as fh:
    segs = fh.read().splitlines()
print(f"[4] FastSMC: {len(segs)} IBD segments -> {path}")
print("    first:", segs[0][:100])

# ---------------------------------------------------------------------------
# 5. Posterior heat map (TOOLS/PLOT_POSTERIORS equivalent).
# ---------------------------------------------------------------------------
try:
    from fastsmc_tpu.pipelines.plot import plot_posterior_heatmap
    plot_posterior_heatmap(f"{OUT}/asmc.sumOverPairs.gz",
                           f"{OUT}/model.intervalsInfo",
                           f"{OUT}/heatmap.png")
    print(f"[5] heat map -> {OUT}/heatmap.png")
except Exception as e:  # matplotlib optional
    print(f"[5] plotting skipped: {e}")

print("walkthrough complete")
