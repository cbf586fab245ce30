"""Multi-host scale-out.

The reference scales out by launching independent OS processes over a
triangular tiling of the pair matrix and merging output files
(cpp_example/FastSMC_example_multiple_jobs.sh:9-44, Data.cpp:62-80,
SURVEY.md §2.3). The TPU-native equivalent keeps that deterministic tiling
as the cross-host work partition — each JAX process (host) takes one or
more ``(job_ind, jobs)`` tiles — while within a host the pair stream is
data-parallel over the local device mesh (parallel/sharding.py). Only the
final result merge crosses hosts, over the filesystem exactly like the
reference (IBD record streams concatenate; posterior-sum matrices add via
pipelines/merge.py), so no DCN collectives are on the hot path.
"""

from __future__ import annotations

import shutil
from typing import List, Optional, Sequence

from ..config import DecodingParams, valid_job_counts


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> int:
    """Initialize JAX distributed (multi-host) and return this process's
    index. Safe to call on a single host (returns 0 without initializing)."""
    import jax
    if num_processes in (None, 1) and coordinator_address is None:
        return 0
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index()


def job_tiles_for_process(process_id: int, num_processes: int,
                          tiles_per_process: int = 1):
    """Deterministic assignment of triangular job tiles to processes.

    The total tile count is the smallest valid triangular ``jobs`` value
    (1, 4, 9, 16, ... — DecodingParams.cpp:376-395) that is at least
    ``num_processes * tiles_per_process``; process p gets tiles
    p+1, p+1+P, p+1+2P, ... (1-based job indices, strided so the heavier
    diagonal tiles spread across hosts).
    """
    want = max(num_processes * tiles_per_process, 1)
    jobs = next(c for c in valid_job_counts(want + 2) if c >= want)
    return [j for j in range(process_id + 1, jobs + 1, num_processes)], jobs


def run_fastsmc_multihost(params: DecodingParams,
                          process_id: Optional[int] = None,
                          num_processes: Optional[int] = None,
                          tiles_per_process: int = 1,
                          **fastsmc_kwargs) -> List[str]:
    """Run this host's share of a multi-host FastSMC job.

    Each host runs its assigned triangular tiles sequentially (one output
    file per tile, named ``<root>.<jobInd>.<jobs>.FastSMC.ibd.gz`` like the
    reference); concatenate with :func:`merge_ibd_outputs` afterwards.
    Returns the output paths written by this host.
    """
    import jax
    from ..pipelines.fastsmc import FastSMC
    if process_id is None:
        process_id = jax.process_index()
    if num_processes is None:
        num_processes = jax.process_count()
    tiles, jobs = job_tiles_for_process(process_id, num_processes,
                                        tiles_per_process)
    paths = []
    for job_ind in tiles:
        import dataclasses
        p = dataclasses.replace(params, jobs=jobs, job_ind=job_ind)
        p.finalize()
        paths.append(FastSMC(p, **fastsmc_kwargs).run(verbose=False))
    return paths


def merge_ibd_outputs(paths: Sequence[str], out_path: str) -> str:
    """Concatenate per-job ``.ibd.gz``/``.bibd.gz`` outputs.

    gzip streams concatenate byte-wise into a valid multi-member stream,
    which is exactly how the reference's shell drivers merge job outputs
    (FastSMC_example_multiple_jobs.sh: ``cat`` of per-job files)."""
    with open(out_path, "wb") as out:
        for p in paths:
            with open(p, "rb") as f:
                shutil.copyfileobj(f, out)
    return out_path
