"""Identification-stage scaling probe: device (XLA) scan vs host scans.

Builds synthetic panels of growing haplotype count and times one full
identification pass per backend. Run on a TPU host to exercise the
device sort path at scale; CPU works too (XLA CPU backend).

Usage: /opt/venv/bin/python scripts/hashing_scale_probe.py [device|host|both]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_data(n_haps, words, planted_frac=0.001, seed=0):
    from fastsmc_tpu.io.haps import Data
    rng = np.random.default_rng(seed)
    sites = 64 * words
    freqs = rng.uniform(0.05, 0.5, sites)
    bits = (rng.random((n_haps, sites)) < freqs).astype(np.uint8)
    n_planted = max(2, int(planted_frac * n_haps))
    for _ in range(n_planted):
        a, b = rng.choice(n_haps, 2, replace=False)
        lo = 64 * int(rng.integers(0, words - 3))
        hi = lo + 64 * int(rng.integers(2, min(8, words - lo // 64) + 1))
        bits[b, lo:hi] = bits[a, lo:hi]
    n_ind = n_haps // 2
    return Data(
        sites=sites, sample_size=n_ind,
        fam_id_list=[f"f{i}" for i in range(n_ind)],
        iid_list=[f"s{i}" for i in range(n_ind)],
        hap_bits=bits,
        genetic_positions=np.linspace(0, 2.0, sites),  # 200 cM
        physical_positions=np.arange(sites, dtype=np.int64) * 1000,
        rec_rate_at_marker=np.zeros(sites),
        snp_ids=[f"snp{i}" for i in range(sites)],
        derived_allele_counts=bits.sum(axis=0).astype(np.int32),
        total_samples_count=np.full(sites, n_haps, np.int32),
        site_was_flipped=np.zeros(sites, bool),
        chr_number=1, windows=None,
        fold_to_minor=False, decoding_uses_csfs=False, use_known_seed=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    import jax

    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.hashing.germline import HashingScan
    from fastsmc_tpu.hashing.vectorized import VectorizedHashingScan
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    words = 100                      # 6,400 sites
    for n_haps in (1024, 4096, 16384, 65536):
        data = make_data(n_haps, words)
        p = DecodingParams(fastsmc=True, hashing=True, batch_size=8,
                           in_file_root="/x", decoding_quant_file="/x",
                           out_file_root="/x", min_m=1.0)
        res = {}
        for name in ("device", "host"):
            if which not in (name, "both"):
                continue
            if name == "host" and n_haps > 16384:
                continue             # python/native host scan gets slow
            out = []
            cb = lambda a, b, f, t: out.append(1)
            scan = (VectorizedHashingScan(p, data, cb, capacity=1 << 20)
                    if name == "device" else HashingScan(p, data, cb))
            t0 = time.time()
            scan.run(verbose=False)
            dt = time.time() - t0
            res[name] = dict(seconds=round(dt, 2), segments=len(out))
        print(json.dumps({"n_haps": n_haps, "words": words, **res}),
              flush=True)


if __name__ == "__main__":
    main()
