"""Biobank-scale probe: hashing + decoding at ~100k haplotypes.

BASELINE.json's largest config ("~100k simulated haplotypes, genome-sharded
seeding + pod-parallel pair decoding") has no measured numbers. This probe
generates a coalescent-flavoured synthetic panel at that scale and measures:

  1. host (native C++) GERMLINE2 scan wall time + candidate count,
  2. chunked device (sort-based) scan wall time  -> device/host crossover,
  3. chunked pair decoding throughput at realistic batch sizes
     (Pallas fused threshold-sum kernel, exact + fast profiles),
  4. peak host RSS.

Panel model: founder-mosaic haplotypes (each hap is a mosaic of F founder
haplotypes with geometric switch distance + per-site mutation noise). This
gives GERMLINE-realistic word-collision rates, unlike iid random bits where
64-site words almost never collide (reference seeding: SeedHash.hpp:56-129).

Usage (one TPU process at a time; host phase is CPU-safe):
  /opt/venv/bin/python scripts/biobank_probe.py host   # native scan sweep
  /opt/venv/bin/python scripts/biobank_probe.py device # device scan sweep
  /opt/venv/bin/python scripts/biobank_probe.py decode # TPU decode at scale
Results are merged into BIOBANK_PROBE.json.
"""

import json
import os
import resource
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_JSON = os.path.join(REPO, "BIOBANK_PROBE.json")
WORDS = 100                      # 6,400 sites, ~200 cM (example-panel scale)
SITES = 64 * WORDS
SWEEP = (16_384, 49_152, 98_304)  # haplotype counts (biobank top = ~100k)


def make_panel(n_haps: int, seed: int = 0):
    """Founder-mosaic panel: realistic word-collision structure for GERMLINE.

    founders = n_haps//8 keeps expected sharing per founder-chunk at ~8
    haps; with ~1.2% mutation noise and min_m=1.5 cM (~48 sites) the
    candidate rate lands at O(10) candidates/hap — the sparse-but-nonzero
    regime the reference targets at biobank scale.
    """
    from fastsmc_tpu.io.haps import Data

    rng = np.random.default_rng(seed)
    n_f = max(512, n_haps // 8)
    founders = (rng.random((n_f, SITES)) <
                rng.uniform(0.05, 0.5, SITES)).astype(np.uint8)
    bits = np.empty((n_haps, SITES), np.uint8)
    block = 8192
    for lo in range(0, n_haps, block):
        hi = min(lo + block, n_haps)
        b = hi - lo
        # geometric founder switches, mean distance ~400 sites (~12.5 cM)
        switch = rng.random((b, SITES)) < (1.0 / 400)
        switch[:, 0] = True
        seg = np.cumsum(switch, axis=1) - 1
        fid = rng.integers(0, n_f, (b, seg.max() + 1))
        rows = fid[np.arange(b)[:, None], seg]
        bits[lo:hi] = founders[rows, np.arange(SITES)[None, :]]
        noise = rng.random((b, SITES)) < 0.012
        bits[lo:hi] ^= noise.astype(np.uint8)
    n_ind = n_haps // 2
    # minor-allele folding, exactly like the file loader (Data.cpp:365-366,
    # 472-473). Round-4 skipped it (fold_to_minor=False on unfolded bits),
    # which sent out-of-support rows into the FOLDED CSFS table: ~3% of
    # sites got an all-zero emission row, and any decode window containing
    # such a site for a pair observing that class went NaN — silently
    # deleting segments, with the loss pattern depending on batch unions.
    # The hashing stage reconstructs raw alleles as folded ^ flipped, so
    # the candidate stream is unchanged by the fix; only validation
    # (emissions) is repaired.
    dac = bits.sum(axis=0).astype(np.int32)
    flip = dac > n_haps - dac
    bits = bits ^ flip[None, :].astype(np.uint8)
    dac = np.where(flip, n_haps - dac, dac).astype(np.int32)
    return Data(
        sites=SITES, sample_size=n_ind,
        fam_id_list=[f"f{i}" for i in range(n_ind)],
        iid_list=[f"s{i}" for i in range(n_ind)],
        hap_bits=bits,
        genetic_positions=np.linspace(0, 2.0, SITES),   # 200 cM in Morgans
        physical_positions=np.arange(SITES, dtype=np.int64) * 1000,
        rec_rate_at_marker=np.zeros(SITES),
        snp_ids=[f"snp{i}" for i in range(SITES)],
        derived_allele_counts=dac,
        total_samples_count=np.full(SITES, n_haps, np.int32),
        site_was_flipped=flip,
        chr_number=1, windows=None,
        fold_to_minor=True, decoding_uses_csfs=True, use_known_seed=True)


def params_for(n_haps: int):
    from fastsmc_tpu.config import DecodingParams
    return DecodingParams(fastsmc=True, hashing=True, batch_size=64,
                          in_file_root="/x", decoding_quant_file="/x",
                          out_file_root="/x", min_m=1.5)


def peak_rss_gb() -> float:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20,
                 2)


def merge_result(key: str, value):
    res = {}
    if os.path.exists(OUT_JSON):
        with open(OUT_JSON) as f:
            res = json.load(f)
    res[key] = value
    with open(OUT_JSON, "w") as f:
        json.dump(res, f, indent=2)


def scan_sweep(device: bool):
    from fastsmc_tpu.hashing.germline import HashingScan
    from fastsmc_tpu.hashing.vectorized import VectorizedHashingScan

    rows = []
    for n_haps in SWEEP:
        t0 = time.time()
        data = make_panel(n_haps)
        gen_s = time.time() - t0
        p = params_for(n_haps)
        count = [0]
        cm_sum = [0.0]
        gpos = data.genetic_positions

        def cb(a, b, fr, to):
            count[0] += 1
            cm_sum[0] += 100.0 * (gpos[min(to, SITES - 1)] - gpos[fr])

        if device:
            scan = VectorizedHashingScan(p, data, cb, capacity=1 << 22)
        else:
            scan = HashingScan(p, data, cb)
        t0 = time.time()
        scan.run(verbose=False)
        dt = time.time() - t0
        row = dict(n_haps=n_haps, sites=SITES, panel_gen_s=round(gen_s, 1),
                   scan_s=round(dt, 2), candidates=count[0],
                   mean_cand_cm=round(cm_sum[0] / max(count[0], 1), 2),
                   words_per_sec=round(WORDS / dt, 2),
                   peak_rss_gb=peak_rss_gb())
        rows.append(row)
        print(json.dumps(row), flush=True)
        del data, scan
    merge_result("device_scan" if device else "host_scan", rows)


def decode_probe():
    """Chunked pair decoding at biobank batch sizes on the TPU chip."""
    import jax
    import jax.numpy as jnp

    from fastsmc_tpu.engine.hmm import bucket_len
    from fastsmc_tpu.engine.kernels import BwdOutputs, PallasDecoder
    from fastsmc_tpu.engine.oracle import DecodeContext
    from fastsmc_tpu.io.decoding_quantities import DecodingQuantities

    n_haps = SWEEP[-1]
    data = make_panel(n_haps)
    p = params_for(n_haps)
    dq = DecodingQuantities.load_npz(os.path.join(
        REPO, "artifacts", "n300.array.decodingQuantities.npz"))
    ctx = DecodeContext.build(p, data, dq)
    T = bucket_len(SITES)
    rng = np.random.default_rng(1)
    rows = []
    for profile, P in (("fast", 8192), ("fast", 4096), ("exact", 4096)):
        kwargs = (dict(alpha_dtype=jnp.bfloat16, precision="fast")
                  if profile == "fast" else {})
        dec = PallasDecoder(ctx, **kwargs)
        outs = BwdOutputs(posterior=False, threshold_sums=True)
        pa = rng.integers(0, n_haps, P).astype(np.int32)
        pb = (pa + 1 + rng.integers(0, n_haps - 1, P)).astype(np.int32) \
            % n_haps

        from fastsmc_tpu.utils.sync import measure_throughput
        rate = measure_throughput(
            lambda: dec.decode_pairs(pa, pb, 0, T, outs, 10), P)
        row = dict(profile=profile, batch_pairs=P, sites=SITES,
                   n_haps=n_haps, pair_decodes_per_sec=round(rate, 1))
        rows.append(row)
        print(json.dumps(row), flush=True)
    merge_result("decode", rows)


def e2e_probe(n_haps: int = SWEEP[-1], batch_size: int = 8192,
              profile: str = "fast", sort_list=(0, 8),
              key: str = "e2e", ages: bool = False,
              keep_output: bool = False, runs: int = 1,
              bucket_sites=None):
    """Full FastSMC pipeline wall-to-wall on the chip: host-native scan ->
    batched Pallas validation -> device segment extraction -> IBD writer.
    The VERDICT r2 #1 measurement: sustained end-to-end candidates/s with
    the PhaseTimer breakdown, at >= 795k candidates. Runs every
    sort_batches variant in one process (shared panel + jit cache).

    ``ages=True`` switches on the reference's DEFAULT FastSMC output
    profile (segment length + perPairPosteriorMeans + perPairMAP,
    DecodingParams.cpp:56-63 -> 13-column records, HMM.cpp:1179-1357)."""
    import jax

    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.io.decoding_quantities import DecodingQuantities
    from fastsmc_tpu.pipelines.fastsmc import FastSMC

    print(json.dumps({"backend": jax.default_backend(),
                      "n_haps": n_haps, "batch": batch_size,
                      "profile": profile, "sort_list": list(sort_list),
                      "ages": ages}),
          flush=True)
    t0 = time.time()
    data = make_panel(n_haps)
    gen_s = time.time() - t0
    dq = DecodingQuantities.load_npz(os.path.join(
        REPO, "artifacts", "n300.array.decodingQuantities.npz"))
    rows = []
    paths = []
    for sort_batches in sort_list:
        out_root = (f"/tmp/biobank_e2e_{n_haps}_{profile}_{sort_batches}"
                    + ("_ages" if ages else ""))
        params = DecodingParams(
            fastsmc=True, hashing=True, batch_size=batch_size,
            in_file_root="/x", out_file_root=out_root,
            decoding_quant_file=os.path.join(
                REPO, "artifacts", "n300.array.decodingQuantities.npz"),
            min_m=1.5, use_known_seed=True,
            output_ibd_segment_length=ages,
            do_per_pair_posterior_mean=ages, do_per_pair_map=ages)
        walls = []
        cpu_util = 0.0
        for _ in range(runs):
            f = FastSMC(params, data=data, dq=dq, use_pallas=True,
                        decode_profile=profile, sort_batches=sort_batches,
                        bucket_sites=bucket_sites)
            ru0 = resource.getrusage(resource.RUSAGE_SELF)
            t0 = time.time()
            path = f.run(verbose=True)
            walls.append(time.time() - t0)
            ru1 = resource.getrusage(resource.RUSAGE_SELF)
            # cores busy during the run (2-core box): the host-saturation
            # measurement VERDICT r3 do #3 asks for
            cpu_util = round(((ru1.ru_utime - ru0.ru_utime)
                              + (ru1.ru_stime - ru0.ru_stime))
                             / max(walls[-1], 1e-9), 2)
        # variance-controlled reporting (VERDICT r4 #8): wall = median of
        # the steady (post-compile) runs, min/max recorded; the first run
        # pays jit compiles/cache loads and is reported as cold_wall_s
        steady = walls[1:] if runs > 1 else walls
        wall = float(np.median(steady))
        st = f.stats
        row = dict(
            n_haps=n_haps, sites=SITES, panel_gen_s=round(gen_s, 1),
            batch_size=batch_size, profile=profile, ages=ages,
            sort_batches=sort_batches, bucket_sites=bucket_sites,
            candidates=f._cpt, segments=f.n_segments,
            wall_s=round(wall, 1),
            wall_min_max_s=[round(min(steady), 1), round(max(steady), 1)],
            n_steady_runs=len(steady),
            cold_wall_s=round(walls[0], 1),
            candidates_per_sec=round(f._cpt / wall, 1),
            roofline=f.roofline(),
            phase_s={k: round(v, 1) for k, v in f.timer.totals().items()},
            waste_decoded_over_cand=round(
                st["decoded_site_pairs"] / max(st["cand_site_pairs"], 1), 2),
            waste_union_over_cand=round(
                st["union_site_pairs"] / max(st["cand_site_pairs"], 1), 2),
            flushes=st["flushes"],
            overflow_redos=st.get("overflow_redos", 0),
            cpu_cores_busy=cpu_util,
            peak_rss_gb=peak_rss_gb())
        rows.append(row)
        print(json.dumps(row), flush=True)
        paths.append(path)
        if not keep_output:
            os.remove(path)
    merge_result(key, rows)
    return paths


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "host"
    if which in ("host", "device"):
        if which == "device":
            import jax
            print(json.dumps({"backend": jax.default_backend()}), flush=True)
        scan_sweep(device=(which == "device"))
    elif which == "decode":
        decode_probe()
    elif which == "e2e":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else SWEEP[-1]
        bs = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
        prof = sys.argv[4] if len(sys.argv) > 4 else "fast"
        sorts = tuple(int(x) for x in sys.argv[5].split(",")) \
            if len(sys.argv) > 5 else (0, 8)
        key = sys.argv[6] if len(sys.argv) > 6 else f"e2e_{n}"
        ages = len(sys.argv) > 7 and sys.argv[7] == "ages"
        e2e_probe(n, bs, prof, sorts, key, ages=ages)
    else:
        raise SystemExit(f"unknown phase {which}")
    print("BIOBANK_PROBE_OK")


if __name__ == "__main__":
    main()
