"""Worker process for the 2-process multihost simulation test.

Run as:  python tests/multihost_worker.py <process_id> <num_processes>
                 <port> <panel_root> <dq_path> <out_dir>

Each process initializes JAX distributed (CPU backend, 2 virtual local
devices), takes its triangular job tiles via
``parallel.multihost.job_tiles_for_process``, runs them through the real
FastSMC pipeline sharded over its *local* mesh, and writes the per-tile
output files — the reference's multi-process contract
(FastSMC_example_multiple_jobs.sh:9-44) with jax.distributed coordination.
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    panel_root, dq_path, out_dir = sys.argv[4:7]

    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.parallel import multihost
    from fastsmc_tpu.parallel.sharding import make_mesh

    idx = multihost.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert idx == pid and jax.process_count() == nproc

    params = DecodingParams.fastsmc_defaults(
        panel_root, dq_path, os.path.join(out_dir, "mh"),
        use_known_seed=True, min_m=0.5, batch_size=16)
    mesh = make_mesh(devices=jax.local_devices())
    paths = multihost.run_fastsmc_multihost(
        params, use_pallas=False, mesh=mesh)
    print(json.dumps({"process": pid, "paths": paths,
                      "global_devices": len(jax.devices())}), flush=True)


if __name__ == "__main__":
    main()
