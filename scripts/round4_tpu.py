"""Round-4 TPU evidence session (one process, phases sequential).

Closes VERDICT r3 items on hardware:
  #2  biobank e2e with the reference DEFAULT output (ages on) and the
      exact profile, at 16k and 98k haplotypes;
  #4  decode-window waste with the length-class candidate sort;
  #5  sequence-mode on-TPU golden regen (t_hi removal changed the traced
      program) — plus a decodes/s number;
  #6  full pipeline on-chip with Pallas under shard_map (mesh=1), output
      equality vs the meshless Pallas run.

Usage (ONE TPU process at a time):
  nohup /opt/venv/bin/python scripts/round4_tpu.py all > /tmp/r4tpu.log 2>&1 &
Phases: goldens seq mesh e2e16 e2e98 device  (or "all").
Results merge into BIOBANK_PROBE.json / artifacts/.
"""

import gzip
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
    print(f"[r4tpu {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def phase_goldens():
    """Regenerate the two TPU self-goldens in-process (one TPU process at
    a time; the t_hi removal changed the traced program — scheduling may
    shift numerics by ulps)."""
    import make_tpu_goldens
    sys.argv = [sys.argv[0], "--all"]
    make_tpu_goldens.main()


def phase_seq():
    """Sequence-mode decodes/s on the chip (VERDICT r3 missing #3)."""
    import jax
    import jax.numpy as jnp

    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.engine.kernels import BwdOutputs, PallasDecoder
    from fastsmc_tpu.engine.oracle import DecodeContext
    from fastsmc_tpu.io.decoding_quantities import DecodingQuantities
    from fastsmc_tpu.io.haps import load_data
    from fastsmc_tpu.utils.sync import measure_throughput

    params = DecodingParams.asmc(
        "/root/reference/FILES/EXAMPLE/exampleFile.n300",
        os.path.join(REPO, "artifacts", "n300.array.decodingQuantities.npz"),
        out_file_root="/tmp/seq_bench", decoding_mode="sequence",
        do_posterior_sums=True, use_known_seed=True)
    data = load_data(params)
    dq = DecodingQuantities.load_npz(params.decoding_quant_file)
    ctx = DecodeContext.build(params, data, dq)
    # the 97k-site sequence panel cannot decode in one window (alpha would
    # be ~86 GB); production decodes it chunked (decode_all_in_job
    # chunk_sites). Bench one 8192-site window and report both the window
    # rate and the full-panel-equivalent rate.
    T = 8192
    rng = np.random.default_rng(0)
    rows = []
    for profile, P, kwargs in (
            ("fast", 4096, dict(alpha_dtype=jnp.bfloat16, precision="fast")),
            ("exact", 2048, {})):
        # sequence mode = 2 half-steps/site; alpha cost doubles vs array
        dec = PallasDecoder(ctx, **kwargs)
        outs = BwdOutputs(posterior=False, posterior_sums=True)
        pa = rng.integers(0, data.n_haps, P).astype(np.int32)
        pb = (pa + 1 + rng.integers(0, data.n_haps - 1, P)).astype(np.int32) \
            % data.n_haps
        rate = measure_throughput(
            lambda: dec.decode_pairs(pa, pb, 0, T, outs, 0), P)
        row = dict(mode="sequence", profile=profile, batch_pairs=P,
                   window_sites=T, panel_sites=int(data.sites),
                   states=int(dq.states),
                   window_decodes_per_sec=round(rate, 1),
                   full_panel_equiv_decodes_per_sec=round(
                       rate * T / data.sites, 1))
        rows.append(row)
        log(json.dumps(row))
    merge_result("sequence_decode", rows)


def phase_mesh():
    """Full FastSMC pipeline on-chip with Pallas under shard_map (mesh=1)
    vs the meshless Pallas pipeline: same candidate stream, same IBD pair
    set, scores equal to float tolerance (VERDICT r3 missing #5)."""
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.parallel.sharding import make_mesh
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    data = make_panel(16_384)
    dq_path = os.path.join(REPO, "artifacts",
                           "n300.array.decodingQuantities.npz")
    outputs = {}
    stats = {}
    dq = None
    for tag, kw in (("meshless", dict()),
                    ("mesh1", dict(mesh=make_mesh(1)))):
        params = DecodingParams(
            fastsmc=True, hashing=True, batch_size=8192,
            in_file_root="/x", out_file_root=f"/tmp/mesh_pipe_{tag}",
            decoding_quant_file=dq_path, min_m=1.5, use_known_seed=True)
        f = FastSMC(params, data=data, dq=dq, use_pallas=True,
                    decode_profile="fast", **kw)
        dq = f.dq
        t0 = time.time()
        path = f.run(verbose=False)
        wall = time.time() - t0
        with gzip.open(path, "rt") as fh:
            outputs[tag] = fh.read().splitlines()
        stats[tag] = dict(wall_s=round(wall, 1), segments=f.n_segments,
                          candidates=f._cpt)
        log(f"{tag}: {stats[tag]}")
        os.remove(path)

    def keyed(lines):
        return {tuple(l.split("\t")[:6]): float(l.split("\t")[-1])
                for l in lines}

    km, k1 = keyed(outputs["meshless"]), keyed(outputs["mesh1"])
    same_pairs = set(km) == set(k1)
    byte_equal = outputs["meshless"] == outputs["mesh1"]
    max_d = max((abs(km[k] - k1[k]) / max(abs(km[k]), 1e-30)
                 for k in km if k in k1), default=0.0)
    report = dict(**{f"{k}_{kk}": vv for k, v in stats.items()
                     for kk, vv in v.items()},
                  same_pair_set=same_pairs, byte_equal=byte_equal,
                  max_rel_score_diff=float(f"{max_d:.3g}"),
                  n_records=len(outputs["meshless"]))
    log(json.dumps(report))
    with open(os.path.join(REPO, "artifacts", "mesh_pipeline_probe.log"),
              "w") as fh:
        fh.write(json.dumps(report, indent=2) + "\n")
    merge_result("mesh1_pipeline", report)
    assert same_pairs, "mesh=1 pipeline changed the IBD pair set"


def _intervals(path):
    with gzip.open(path, "rt") as fh:
        return {tuple(l.split("\t")[:9]) for l in fh.read().splitlines()}


def phase_e2e(n_haps: int):
    """e2e sweep: fast ages-off (sort 0/8/32 for the waste question),
    fast ages-on, exact ages-on; interval agreement ages-on vs -off."""
    paths_off = e2e_probe(n_haps, 8192, "fast", (0, 8, 32),
                          key=f"e2e_{n_haps}_r4_fast", ages=False,
                          keep_output=True)
    paths_on = e2e_probe(n_haps, 8192, "fast", (32,),
                         key=f"e2e_{n_haps}_r4_fast_ages", ages=True,
                         keep_output=True)
    # ages-on must carry the same intervals as ages-off at the same sort
    # (the 13-column output adds columns, not segments)
    iv_off = _intervals(paths_off[-1])
    iv_on = {k[:9] for k in
             (tuple(l.split("\t")[:9]) for l in
              gzip.open(paths_on[0], "rt").read().splitlines())}
    iv_on_pairs = {k[:6] for k in iv_on}
    iv_off_pairs = {k[:6] for k in iv_off}
    agree = dict(
        n_off=len(iv_off), n_on=len(iv_on),
        interval_jaccard=round(len(iv_off & iv_on)
                               / max(len(iv_off | iv_on), 1), 6),
        pair_set_equal=iv_on_pairs == iv_off_pairs)
    log(f"ages on/off interval agreement @{n_haps}: {json.dumps(agree)}")
    merge_result(f"e2e_{n_haps}_r4_ages_agreement", agree)
    for p in paths_off + paths_on:
        if os.path.exists(p):
            os.remove(p)
    try:
        e2e_probe(n_haps, 8192, "exact", (32,),
                  key=f"e2e_{n_haps}_r4_exact_ages", ages=True)
    except Exception as e:          # exact @ batch 8192 may not fit HBM
        log(f"exact batch 8192 failed ({e}); retrying at 4096")
        e2e_probe(n_haps, 4096, "exact", (32,),
                  key=f"e2e_{n_haps}_r4_exact_ages", ages=True)


def phase_device():
    """Device (sort-based XLA) hashing scan on the chip at 16k/98k."""
    from biobank_probe import scan_sweep
    scan_sweep(device=True)


def phase_agree():
    """Apples-to-apples ages-on vs ages-off: force the ages posterior
    budget onto the ages-off run so BOTH runs split identically — then
    the 13-column output must carry the same intervals (the earlier
    jaccard-0.93 gap was batching, not ages: the posterior guard splits
    only ages runs by default, changing unions)."""
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    data = make_panel(16_384)
    dq_path = os.path.join(REPO, "artifacts",
                           "n300.array.decodingQuantities.npz")
    ivs = {}
    dq = None
    for ages in (False, True):
        params = DecodingParams(
            fastsmc=True, hashing=True, batch_size=8192,
            in_file_root="/x", out_file_root=f"/tmp/agree_{ages}",
            decoding_quant_file=dq_path, min_m=1.5, use_known_seed=True,
            output_ibd_segment_length=ages,
            do_per_pair_posterior_mean=ages, do_per_pair_map=ages)
        f = FastSMC(params, data=data, dq=dq, use_pallas=True,
                    decode_profile="fast", sort_batches=32)
        dq = f.dq
        f._alpha_budget = f._post_budget   # identical split schedule
        path = f.run(verbose=False)
        ivs[ages] = _intervals(path)
        os.remove(path)
    both = {k[:9] for k in ivs[True]} & {k[:9] for k in ivs[False]}
    report = dict(
        n_off=len(ivs[False]), n_on=len(ivs[True]),
        interval_jaccard=round(
            len(both) / max(len(ivs[True] | ivs[False]), 1), 6))
    log(f"same-batching ages agreement: {json.dumps(report)}")
    merge_result("e2e_16384_r4_ages_agreement_samebatching", report)


def phase_final():
    """Final round-4 re-pin at the production defaults (extraction cap
    4096, arrival order, overlap on), plus the overlap on/off A/B."""
    for n in (16_384, 98_304):
        e2e_probe(n, 8192, "fast", (0,), key=f"e2e_{n}_r4_fast",
                  ages=False, runs=2)
        os.environ["FASTSMC_NO_OVERLAP"] = "1"
        try:
            e2e_probe(n, 8192, "fast", (0,),
                      key=f"e2e_{n}_r4_fast_no_overlap", ages=False,
                      runs=2)
        finally:
            os.environ.pop("FASTSMC_NO_OVERLAP", None)
        e2e_probe(n, 8192, "fast", (0,), key=f"e2e_{n}_r4_fast_ages",
                  ages=True, runs=2)
        e2e_probe(n, 8192, "exact", (0,), key=f"e2e_{n}_r4_exact_ages",
                  ages=True, runs=2)


def phase_steady():
    """Steady-state reruns of the headline e2e configs (runs=2, report
    the second run — warm jit/disk cache, quiet host). Overwrites the
    r4 keys with clean numbers."""
    for n in (16_384, 98_304):
        e2e_probe(n, 8192, "fast", (0, 32), key=f"e2e_{n}_r4_fast",
                  ages=False, runs=2)
        e2e_probe(n, 8192, "fast", (32,), key=f"e2e_{n}_r4_fast_ages",
                  ages=True, runs=2)
        e2e_probe(n, 8192, "exact", (32,), key=f"e2e_{n}_r4_exact_ages",
                  ages=True, runs=2)


def main():
    import jax
    log(f"backend: {jax.default_backend()}")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    phases = dict(goldens=phase_goldens, seq=phase_seq, mesh=phase_mesh,
                  e2e16=lambda: phase_e2e(16_384),
                  e2e98=lambda: phase_e2e(98_304),
                  device=phase_device, steady=phase_steady, final=phase_final,
                  agree=phase_agree)
    names = list(phases) if which == "all" else which.split(",")
    for name in names:
        log(f"=== phase {name} ===")
        t0 = time.time()
        phases[name]()
        log(f"=== phase {name} done in {time.time() - t0:.0f}s ===")
    print("ROUND4_TPU_OK", flush=True)


if __name__ == "__main__":
    main()
