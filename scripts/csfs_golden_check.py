"""Full n=300 CSFS golden comparison vs the shipped smcpp output.

Runs ConditionedSFS on the CEU demography / 30-100-2000 discretization and
compares every interval matrix against
/root/reference/FILES/DECODING_QUANTITIES/30-100-2000.csfs.
Takes ~20 minutes on CPU. Last validated result: worst relative error
1.45e-9 over all 69 intervals x 3 x 299 entries.

Usage: /opt/venv/bin/python scripts/csfs_golden_check.py
(or: FASTSMC_RUN_CSFS_GOLDEN=1 pytest tests/test_conditioned_sfs.py)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastsmc_tpu.prepare.conditioned_sfs import ConditionedSFS  # noqa: E402
from fastsmc_tpu.prepare.csfs import CSFS  # noqa: E402


def main():
    demo = np.loadtxt("/root/reference/FILES/CEU.demo")
    disc = np.loadtxt("/root/reference/FILES/DISC/30-100-2000.disc")
    golden = CSFS.load(
        "/root/reference/FILES/DECODING_QUANTITIES/30-100-2000.csfs")
    t0 = time.time()
    c = ConditionedSFS(demo[:, 0], demo[:, 1], disc, golden.samples,
                       mu=1.65e-8)
    mats = c.compute()
    print(f"computed in {time.time() - t0:.1f}s")
    rels = []
    for i, k in enumerate(golden.keys()):
        g = golden.entries[k].csfs
        m = np.asarray(mats[i])
        mask = np.abs(g) > 1e-10
        rels.append(np.max(np.abs(m[mask] - g[mask]) / np.abs(g[mask])))
    print(f"worst rel err: {max(rels):.3e}  median: {np.median(rels):.3e}")
    assert max(rels) < 1e-6


if __name__ == "__main__":
    main()
