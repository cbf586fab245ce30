"""Timing harness for the ASMC all-pairs regression workload.

Mirror of the reference's time_regression.py (which repeats the
[HMM_regression] Catch test — the full n300-array all-pairs decode,
179,700 pair decodes — and reports a median; reference baseline comment:
~51.97 s on a CI-class CPU).

Here the same workload runs through the production engine on whatever
backend is active. On the TPU it completes in a few seconds; use
--repeats to get a median like the reference harness.

Usage: /opt/venv/bin/python scripts/time_regression.py [--repeats N]
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once():
    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.pipelines.asmc import ASMC
    params = DecodingParams.asmc(
        "/root/reference/FILES/EXAMPLE/exampleFile.n300.array",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "artifacts",
            "n300.array.decodingQuantities.npz"),
        out_file_root="/tmp/time_regression_out",
        do_posterior_sums=True, use_known_seed=True)
    a = ASMC(params, batch_size=4096)
    t0 = time.time()
    a.decode_all_in_job(verbose=False)
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()
    times = []
    for i in range(args.repeats):
        dt = run_once()
        times.append(dt)
        print(f"run {i + 1}/{args.repeats}: {dt:.2f}s", flush=True)
    print(f"median: {statistics.median(times):.2f}s over {args.repeats} "
          f"runs (reference CPU baseline: ~51.97s)")


if __name__ == "__main__":
    main()
