"""Segment-level accuracy of the fast/turbo decode profiles vs exact.

The "exact" profile reproduces the reference NO_SSE numerics; "fast"
(bf16 alpha + bf16x3 matmuls) and "turbo" (pure-bf16 single-pass matmuls)
trade posterior precision for throughput. The posterior errors (~6e-3 /
~1e-2) are documented, but what users care about is the IBD *output*:
does the 4-level threshold state machine (HMM.cpp:1179-1357) emit the
same segments?

This probe runs the full FastSMC pipeline on the in-repo example panel
once per profile and reports, per profile vs exact:
  * identical output lines (byte-level) fraction,
  * bp-level precision/recall/F1 and segment-level F1
    (same interval-overlap metrics as scripts/f1_vs_reference.py),
  * max |posterior - exact| over a sample decode window.

Writes PROFILE_ACCURACY.json. Run on the TPU backend (one process at a
time):
  cd /root/repo && nohup /opt/venv/bin/python \
      scripts/profile_accuracy_probe.py > /tmp/profile_acc.log 2>&1 &
"""

import gzip
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from f1_vs_reference import f1_scores  # noqa: E402 (sibling script)

PROFILES = ("exact", "fast", "turbo")


def run_pipeline(profile: str, tmp: str) -> str:
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    params = DecodingParams.fastsmc_defaults(
        os.path.join(REPO, "artifacts", "panels", "example_array", "example"),
        os.path.join(REPO, "artifacts", "n300.array.decodingQuantities.npz"),
        os.path.join(tmp, profile), use_known_seed=True, batch_size=512)
    return FastSMC(params, use_pallas=True,
                   decode_profile=profile).run(verbose=False)


def posterior_err(profile: str) -> float:
    """max |posterior - exact| over a 2048-site window, 256 pairs."""
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.engine.kernels import BwdOutputs, PallasDecoder
    from fastsmc_tpu.engine.oracle import DecodeContext
    from fastsmc_tpu.io.decoding_quantities import DecodingQuantities
    from fastsmc_tpu.io.haps import load_data
    from fastsmc_tpu.pipelines.asmc import _profile_kwargs

    params = DecodingParams.asmc(
        "/root/reference/FILES/EXAMPLE/exampleFile.n300.array",
        os.path.join(REPO, "artifacts", "n300.array.decodingQuantities.npz"),
        out_file_root="/tmp/profile_acc", do_posterior_sums=True,
        use_known_seed=True)
    data = load_data(params)
    dq = DecodingQuantities.load_npz(params.decoding_quant_file)
    ctx = DecodeContext.build(params, data, dq)
    rng = np.random.default_rng(3)
    pa = rng.integers(0, data.n_haps, 256).astype(np.int32)
    pb = (pa + 3) % data.n_haps
    outs = BwdOutputs(posterior=True)

    def post(prof):
        dec = PallasDecoder(ctx, **_profile_kwargs(prof))
        r = dec.decode_pairs(pa, pb, 1024, 2048, outs, 0)
        return np.asarray(r["posterior"], np.float32)

    ref = post("exact")
    if profile == "exact":
        return 0.0
    return float(np.max(np.abs(post(profile) - ref)))


def main():
    import jax
    assert jax.default_backend() not in ("cpu",), "needs the TPU backend"

    tmp = tempfile.mkdtemp(prefix="profile_acc_")
    paths = {p: run_pipeline(p, tmp) for p in PROFILES}
    lines = {p: gzip.open(paths[p], "rt").read().splitlines()
             for p in PROFILES}

    out = {"panel": "example_array (6760 sites, 152 diploids)",
           "exact_segments": len(lines["exact"])}
    for p in ("fast", "turbo"):
        ident = sum(1 for a, b in zip(lines[p], lines["exact"]) if a == b)
        scores = f1_scores(paths["exact"], paths[p])
        out[p] = {
            "segments": len(lines[p]),
            "identical_lines_vs_exact": round(
                ident / max(len(lines["exact"]), 1), 4),
            "bp_f1_vs_exact": scores["bp_f1"],
            "seg_f1_vs_exact": scores["seg_f1"],
            "max_posterior_abs_err": round(posterior_err(p), 6),
        }
        print(json.dumps({p: out[p]}), flush=True)

    with open(os.path.join(REPO, "PROFILE_ACCURACY.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("PROFILE_ACCURACY_OK")


if __name__ == "__main__":
    main()
