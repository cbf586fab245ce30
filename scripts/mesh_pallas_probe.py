"""TPU probe: ShardedDecoder wrapping the production Pallas kernels.

Runs the fused decode under shard_map on a mesh of the available TPU
device(s) and cross-checks every output against the direct PallasDecoder
call. With one chip this validates the composition (shard_map + Pallas +
psum) that the multi-chip path uses; on a real pod slice the same code
spans the mesh.

Run (one TPU process at a time):
  cd /root/repo && nohup /opt/venv/bin/python scripts/mesh_pallas_probe.py \
      > /tmp/mesh_pallas_probe.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastsmc_tpu.utils.sync import measure_throughput, sync  # noqa: E402


def main():
    import jax

    from fastsmc_tpu.config import DecodingParams
    from fastsmc_tpu.engine.kernels import BwdOutputs, PallasDecoder
    from fastsmc_tpu.engine.oracle import DecodeContext
    from fastsmc_tpu.io.decoding_quantities import DecodingQuantities
    from fastsmc_tpu.io.haps import load_data
    from fastsmc_tpu.parallel.sharding import ShardedDecoder, make_mesh

    assert jax.default_backend() not in ("cpu",), "needs the TPU backend"
    n_dev = len(jax.devices())
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params = DecodingParams.asmc(
        "/root/reference/FILES/EXAMPLE/exampleFile.n300.array",
        os.path.join(repo, "artifacts", "n300.array.decodingQuantities.npz"),
        out_file_root="/tmp/mesh_probe_out",
        do_posterior_sums=True, use_known_seed=True)
    data = load_data(params)
    dq = DecodingQuantities.load_npz(params.decoding_quant_file)
    ctx = DecodeContext.build(params, data, dq)

    mesh = make_mesh(n_dev)
    sd = ShardedDecoder(ctx, mesh, use_pallas=True)
    direct = PallasDecoder(ctx)

    P = 256 * n_dev
    rng = np.random.default_rng(0)
    ha = rng.integers(0, data.n_haps, P).astype(np.int32)
    hb = (ha + 7) % data.n_haps
    T = 1024
    outs = BwdOutputs(posterior=False, posterior_sums=True,
                      per_pair_mean=True, per_pair_map=True,
                      threshold_sums=True, major_minor_sums=True)

    t0 = time.time()
    r_mesh = sd.decode_pairs(ha, hb, 0, T, outs, 10)
    sync(r_mesh)
    print(f"sharded decode compiled+ran in {time.time() - t0:.1f}s "
          f"(mesh size {n_dev})")

    r_dir = direct.decode_pairs(ha, hb, 0, T, outs, 10)
    sync(r_dir)

    for name in ("posterior_sums", "per_pair_mean", "threshold_sums",
                 "major_minor_sums"):
        a, b = np.asarray(r_mesh[name]), np.asarray(r_dir[name])
        err = np.max(np.abs(a - b) / (np.abs(b) + 1e-6))
        print(f"{name}: max rel err vs direct Pallas = {err:.2e}")
        assert err < 1e-4, name
    mism = (np.asarray(r_mesh["per_pair_map"])
            != np.asarray(r_dir["per_pair_map"])).mean()
    print(f"per_pair_map mismatch fraction = {mism:.2e}")
    assert mism < 1e-3

    # steady-state throughput through the sharded path vs direct
    thr_mesh = measure_throughput(
        lambda: sd.decode_pairs(ha, hb, 0, T, outs, 10), P, min_s=4.0)
    thr_dir = measure_throughput(
        lambda: direct.decode_pairs(ha, hb, 0, T, outs, 10), P, min_s=4.0)
    print(f"throughput (1024-site windows): sharded {thr_mesh:.0f} pairs/s, "
          f"direct {thr_dir:.0f} pairs/s, overhead "
          f"{100 * (1 - thr_mesh / thr_dir):.1f}%")
    print("MESH_PALLAS_PROBE_OK")


if __name__ == "__main__":
    main()
