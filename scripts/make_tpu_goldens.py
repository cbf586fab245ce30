"""Regenerate the TPU self-golden fixtures (run on the axon/TPU backend).

Two fixtures are produced under tests/fixtures/:

  * example_array.golden.FastSMC.ibd.gz — full FastSMC pipeline output on
    the in-repo example_array panel (array mode; already exists, rewritten
    only with --all so an accidental numerics change is caught, not hidden).
  * sequence_n300.golden.npz — sequence-mode Pallas decode golden
    (VERDICT r1 #8): posterior sums + threshold sums + per-pair mean/MAP
    for a fixed pair set on exampleFile.n300 (sequence variant,
    reference HMM.cpp:760-770/915-925 two-half-step semantics), pinned
    byte-exact on hardware by tests/test_regression.py.

Usage (one TPU process at a time):
  cd /root/repo && nohup /opt/venv/bin/python scripts/make_tpu_goldens.py \
      [--all] > /tmp/make_goldens.log 2>&1 &
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURES = os.path.join(REPO, "tests", "fixtures")

# fixed pair set for the sequence golden (hap indices into n300 = 600 haps)
SEQ_PAIRS_A = np.array([1, 5, 9, 13, 21, 33, 41, 57, 65, 73, 81, 99,
                        105, 121, 140, 161] * 8, np.int32)
SEQ_PAIRS_B = np.array([2, 6, 10, 14, 22, 34, 42, 58, 66, 74, 82, 100,
                        106, 122, 141, 162] * 8, np.int32)
SEQ_FROM = 0
SEQ_LEN = 2048            # window [0, 2048) of the n300 sequence panel


def sequence_decode():
    """The exact computation test_sequence_mode_tpu_golden reruns."""
    import jax
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.engine.kernels import BwdOutputs, PallasDecoder
    from fastsmc_tpu.engine.oracle import DecodeContext
    from fastsmc_tpu.io.decoding_quantities import DecodingQuantities
    from fastsmc_tpu.io.haps import load_data

    params = DecodingParams.asmc(
        "/root/reference/FILES/EXAMPLE/exampleFile.n300",
        os.path.join(REPO, "artifacts", "n300.array.decodingQuantities.npz"),
        out_file_root="/tmp/seq_golden",
        decoding_mode="sequence", do_posterior_sums=True,
        use_known_seed=True)
    data = load_data(params)
    dq = DecodingQuantities.load_npz(params.decoding_quant_file)
    ctx = DecodeContext.build(params, data, dq)
    dec = PallasDecoder(ctx)
    outs = BwdOutputs(posterior=False, posterior_sums=True,
                      per_pair_mean=True, per_pair_map=True,
                      threshold_sums=True)
    r = dec.decode_pairs(SEQ_PAIRS_A, SEQ_PAIRS_B, SEQ_FROM, SEQ_LEN,
                         outs, 10)
    jax.block_until_ready(r)
    return {k: np.asarray(v) for k, v in r.items() if v is not None}


def main():
    import jax
    assert jax.default_backend() not in ("cpu",), \
        "goldens must be generated on the TPU backend"

    r = sequence_decode()
    path = os.path.join(FIXTURES, "sequence_n300.golden.npz")
    np.savez_compressed(path, **r)
    print(f"wrote {path}: " +
          ", ".join(f"{k}{v.shape}" for k, v in r.items()))

    if "--all" in sys.argv:
        import gzip
        import tempfile
        from fastsmc_tpu.config import DecodingParams
        from fastsmc_tpu.pipelines.fastsmc import FastSMC

        tmp = tempfile.mkdtemp(prefix="golden_")
        params = DecodingParams.fastsmc_defaults(
            os.path.join(REPO, "artifacts", "panels", "example_array",
                         "example"),
            os.path.join(REPO, "artifacts",
                         "n300.array.decodingQuantities.npz"),
            os.path.join(tmp, "out"), use_known_seed=True)
        out = FastSMC(params).run(verbose=False)
        dst = os.path.join(FIXTURES, "example_array.golden.FastSMC.ibd.gz")
        old = gzip.open(dst, "rb").read() if os.path.exists(dst) else None
        new = gzip.open(out, "rb").read()
        if old is not None and old != new:
            print("WARNING: array-mode golden CHANGED — review before "
                  "committing")
        with open(out, "rb") as s, open(dst, "wb") as d:
            d.write(s.read())
        print(f"wrote {dst} ({len(new)} bytes uncompressed)")
    print("MAKE_TPU_GOLDENS_OK")


if __name__ == "__main__":
    main()
