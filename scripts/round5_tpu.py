"""Round-5 TPU evidence session (one process, phases sequential).

Closes VERDICT r4 items on hardware:
  #1  production-speed mesh pipeline: FastSMC(mesh=make_mesh(1),
      use_pallas=True) through the SAME fused grouped flow, byte-equal to
      meshless at <= 1.2x its wall (was 13.3x on the bypass path);
  #2  exact-profile ages-agreement control (same-batching, exact profile);
  #3  ages-tax reduction: bounded-chunk extraction + fused redos — new
      16k/98k x fast/exact x ages on/off steady rows (median of >= 3);
  #4  host/link roofline terms recorded per run (roofline dict in rows);
  #5  sequence-mode pipeline e2e on hardware + committed golden hash;
  #8  medians with min/max in every row (e2e_probe runs=4).

Usage (ONE TPU process at a time):
  nohup /opt/venv/bin/python scripts/round5_tpu.py all > /tmp/r5tpu.log 2>&1 &
Phases: goldens agree mesh1 seq_e2e steady16 steady98  (or "all").
Results merge into BIOBANK_PROBE.json / artifacts/.
"""

import gzip
import hashlib
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from biobank_probe import e2e_probe, make_panel, merge_result  # noqa: E402


def log(msg):
    print(f"[r5tpu {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _intervals(path):
    with gzip.open(path, "rt") as fh:
        return {tuple(l.split("\t")[:9]) for l in fh.read().splitlines()}


def phase_goldens():
    """Regenerate the TPU self-goldens: the fused program set changed
    (ages-off extraction now fuses into the decode program; run-score
    chunk loops are count-bounded) — values are equal in math but XLA
    reschedules, so fast-profile bytes may shift by ulps."""
    import make_tpu_goldens
    sys.argv = [sys.argv[0], "--all"]
    make_tpu_goldens.main()


def phase_agree():
    """VERDICT r4 #2: the ages-agreement control on the EXACT profile
    (the parity profile), same batching (equal split budgets). The fast
    profile's residual flip rate is re-measured alongside for the
    documented contract."""
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    data = make_panel(16_384)
    dq_path = os.path.join(REPO, "artifacts",
                           "n300.array.decodingQuantities.npz")
    dq = None
    for profile in ("exact", "fast"):
        ivs = {}
        for ages in (False, True):
            params = DecodingParams(
                fastsmc=True, hashing=True, batch_size=8192,
                in_file_root="/x", out_file_root=f"/tmp/agree5_{ages}",
                decoding_quant_file=dq_path, min_m=1.5, use_known_seed=True,
                output_ibd_segment_length=ages,
                do_per_pair_posterior_mean=ages, do_per_pair_map=ages)
            f = FastSMC(params, data=data, dq=dq, use_pallas=True,
                        decode_profile=profile, sort_batches=32)
            dq = f.dq
            f._alpha_budget = f._post_budget   # identical split schedule
            path = f.run(verbose=False)
            ivs[ages] = _intervals(path)
            os.remove(path)
        both = {k[:9] for k in ivs[True]} & {k[:9] for k in ivs[False]}
        report = dict(
            profile=profile, n_off=len(ivs[False]), n_on=len(ivs[True]),
            interval_jaccard=round(
                len(both) / max(len(ivs[True] | ivs[False]), 1), 6))
        log(f"same-batching ages agreement [{profile}]: "
            f"{json.dumps(report)}")
        merge_result(f"e2e_16384_r5_ages_agreement_{profile}", report)


def phase_mesh1():
    """VERDICT r4 #1 'done' check: on-chip mesh=1 pipeline through the
    fused grouped flow — byte-equal to meshless at <= 1.2x its wall."""
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.parallel.sharding import make_mesh
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    data = make_panel(16_384)
    dq_path = os.path.join(REPO, "artifacts",
                           "n300.array.decodingQuantities.npz")
    outputs, stats = {}, {}
    dq = None
    for tag, kw in (("meshless", dict()),
                    ("mesh1", dict(mesh=make_mesh(1)))):
        walls = []
        for rep in range(3):        # median of 3 (rep 0 pays compiles)
            params = DecodingParams(
                fastsmc=True, hashing=True, batch_size=8192,
                in_file_root="/x", out_file_root=f"/tmp/mesh5_{tag}",
                decoding_quant_file=dq_path, min_m=1.5, use_known_seed=True)
            f = FastSMC(params, data=data, dq=dq, use_pallas=True,
                        decode_profile="fast", **kw)
            dq = f.dq
            t0 = time.time()
            path = f.run(verbose=False)
            walls.append(time.time() - t0)
        with gzip.open(path, "rt") as fh:
            outputs[tag] = fh.read().splitlines()
        stats[tag] = dict(wall_s=round(float(np.median(walls[1:])), 1),
                          cold_wall_s=round(walls[0], 1),
                          walls=[round(w, 1) for w in walls],
                          segments=f.n_segments, candidates=f._cpt)
        log(f"{tag}: {stats[tag]}")
        os.remove(path)

    byte_equal = outputs["meshless"] == outputs["mesh1"]
    ratio = stats["mesh1"]["wall_s"] / max(stats["meshless"]["wall_s"], 1e-9)
    report = dict(**{f"{k}_{kk}": vv for k, v in stats.items()
                     for kk, vv in v.items()},
                  byte_equal=byte_equal,
                  wall_ratio=round(ratio, 2),
                  n_records=len(outputs["meshless"]),
                  note="mesh=1 through the fused grouped flow (round-5 "
                       "ShardedDecoder.decode_extract_packed)")
    log(json.dumps(report))
    merge_result("mesh1_pipeline_r5", report)
    with open(os.path.join(REPO, "artifacts", "mesh_pipeline_probe.log"),
              "a") as fh:
        fh.write(json.dumps(report, indent=2) + "\n")
    assert byte_equal, "mesh=1 fused pipeline output != meshless"


def phase_seq_e2e():
    """VERDICT r4 #5: a sequence-mode pipeline run wall-to-wall on
    hardware — ASMC decodeAllInJob with posterior sums on the n300
    SEQUENCE panel (97k sites, real map), chunked windows, exact profile.
    Commits the sumOverPairs sha256 as the self-golden the -m tpu
    regression asserts against."""
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.asmc import ASMC

    params = DecodingParams.asmc(
        "/root/reference/FILES/EXAMPLE/exampleFile.n300",
        os.path.join(REPO, "artifacts",
                     "n300.array.decodingQuantities.npz"),
        out_file_root="/tmp/seq_e2e", decoding_mode="sequence",
        do_posterior_sums=True, use_known_seed=True, jobs=25, job_ind=13,
        batch_size=1024)
    t0 = time.time()
    a = ASMC(params, use_pallas=True, decode_profile="exact")
    res = a.decode_all_in_job(verbose=True, chunk_sites=8192)
    wall = time.time() - t0
    start, end = a._job_pair_range()
    sums = np.asarray(res.sum_over_pairs, np.float32)
    digest = hashlib.sha256(sums.tobytes()).hexdigest()
    report = dict(mode="sequence", profile="exact", jobs=25, job_ind=13,
                  sites=int(sums.shape[0]), states=int(sums.shape[1]),
                  wall_s=round(wall, 1), pairs=int(end - start),
                  chunk_sites=8192, batch_size=1024,
                  sum_sha256=digest,
                  sum_total=float(np.float64(sums.sum())))
    log(json.dumps(report))
    merge_result("sequence_e2e", report)
    np.savez_compressed(
        os.path.join(REPO, "tests", "fixtures", "sequence_e2e.golden.npz"),
        sums=sums)


def phase_steady(n):
    """Headline e2e rows: fast/exact x ages on/off at the production
    defaults, runs=4 (cold + median of 3 steady)."""
    e2e_probe(n, 8192, "fast", (0,), key=f"e2e_{n}_r5_fast",
              ages=False, runs=4)
    e2e_probe(n, 8192, "fast", (0,), key=f"e2e_{n}_r5_fast_ages",
              ages=True, runs=4)
    e2e_probe(n, 8192, "exact", (0,), key=f"e2e_{n}_r5_exact_ages",
              ages=True, runs=4)


def phase_buckets():
    """VERDICT r4 #7 ordering A/B on the fixed panel: canonical-window
    batching (production default) vs legacy arrival-order unions vs the
    round-4 sort buffer — wall, waste and overlap behaviour. (Canonical
    also changes SEMANTICS — deterministic candidate-set function — so
    this is a perf A/B, not an output A/B; see PARITY.md.)"""
    for n in (16_384, 98_304):
        e2e_probe(n, 8192, "fast", (0,),
                  key=f"e2e_{n}_r5_fast_arrival",
                  ages=False, runs=3, bucket_sites=0)
        e2e_probe(n, 8192, "fast", (32,),
                  key=f"e2e_{n}_r5_fast_sort32",
                  ages=False, runs=3, bucket_sites=0)


def main():
    import jax
    log(f"backend: {jax.default_backend()}")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    phases = dict(goldens=phase_goldens, agree=phase_agree,
                  mesh1=phase_mesh1, seq_e2e=phase_seq_e2e,
                  steady16=lambda: phase_steady(16_384),
                  steady98=lambda: phase_steady(98_304),
                  buckets=phase_buckets)
    names = list(phases) if which == "all" else which.split(",")
    for name in names:
        log(f"=== phase {name} ===")
        t0 = time.time()
        phases[name]()
        log(f"=== phase {name} done in {time.time() - t0:.0f}s ===")
    print("ROUND5_TPU_OK", flush=True)


if __name__ == "__main__":
    main()
