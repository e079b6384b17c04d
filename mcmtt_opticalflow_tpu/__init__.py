"""mcmtt_opticalflow_tpu — TPU-native multi-camera multi-target tracking engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
MCMTT_OPTICALFLOW ("PSN_Where") system: per-camera 2D tracklet generation via
pyramidal Lucas-Kanade optical flow, cross-camera 3D reconstruction and MHT
association, K-best global hypothesis selection via a maximum-weight-clique
solver, Savitzky-Golay trajectory smoothing, and CLEAR-MOT evaluation.

Design stance (TPU-first, not a port):
  * struct-of-arrays state with fixed capacities + validity masks
    (replaces the reference's pointer-linked std::list/deque data model,
    psn_where/PSNWhere_Types.h:258-469)
  * batched / vmapped device kernels for every hot loop
    (LK pyramids, pairwise gating, track scoring, clique search)
  * host-side Python only for variable-topology bookkeeping
    (track-tree tables, id allocation, dataset I/O)
  * pjit/shard_map over a (cam, block) device mesh for multi-chip scale-out
"""

__version__ = "0.1.0"

# persistent XLA compilation cache: the engine's device programs (the LK
# Pallas kernel, the BLS solver while-loop) are expensive to compile; cache
# them across processes.  Safe no-op when the directory is unavailable.
def _setup_compile_cache() -> None:
    import os

    if os.environ.get("JAX_PLATFORMS", "").lower().startswith("cpu"):
        # CPU runs (tests, virtual meshes) must not share the cache with
        # remote-TPU compiles: XLA:CPU AOT entries are machine-specific
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "MCMTT_JAX_CACHE", os.path.expanduser("~/.cache/mcmtt_jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_compile_cache()

from mcmtt_opticalflow_tpu.config import (  # noqa: F401
    EngineConfig,
    Tracker2DConfig,
    Associator3DConfig,
    SolverConfig,
    EvalConfig,
)
