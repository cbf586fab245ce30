"""fastsmc_tpu: TPU-native IBD detection framework (FastSMC/ASMC capabilities).

A from-scratch JAX/XLA/Pallas implementation of the two-stage FastSMC method
(GERMLINE2-style hash identification + ASMC posterior validation), designed
for TPU hardware. See SURVEY.md for the blueprint and reference citations.
"""

import os


def enable_compilation_cache(path: str = None) -> None:
    """Enable JAX's persistent compilation cache (the decode kernels compile
    once per window-length bucket; caching makes reruns start instantly)."""
    import jax
    path = path or os.environ.get(
        "FASTSMC_TPU_CACHE", os.path.expanduser("~/.cache/fastsmc_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


if os.environ.get("FASTSMC_TPU_NO_CACHE", "") != "1":
    try:
        enable_compilation_cache()
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from .config import DecodingParams  # noqa: E402,F401

__version__ = "0.1.0"
