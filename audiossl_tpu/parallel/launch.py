"""Multi-host initialization (DCN) — the reference's launcher equivalents.

The reference spawns per-GPU processes with NCCL TCP/file rendezvous or
SLURM env (SURVEY.md §2.3: multiprocessing.py:9-62, utils.py:77-101). On
TPU pods, one process drives all local chips and hosts meet over DCN via
`jax.distributed.initialize`; the same data mesh then spans every chip.

Call `maybe_init_distributed()` once before building the mesh. It
auto-detects: TPU pod metadata, SLURM (`SLURM_PROCID`/`SLURM_NTASKS` +
coordinator from the node list), or explicit env
(AUDIOSSL_COORDINATOR, AUDIOSSL_NUM_PROCESSES, AUDIOSSL_PROCESS_ID).
"""
from __future__ import annotations

import logging
import os

import jax

log = logging.getLogger("audiossl_tpu.launch")


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed if a multi-host launch is detected."""
    if os.environ.get("AUDIOSSL_COORDINATOR"):
        jax.distributed.initialize(
            coordinator_address=os.environ["AUDIOSSL_COORDINATOR"],
            num_processes=int(os.environ["AUDIOSSL_NUM_PROCESSES"]),
            process_id=int(os.environ["AUDIOSSL_PROCESS_ID"]),
        )
        log.info("jax.distributed initialized from AUDIOSSL_* env")
        return True
    if os.environ.get("SLURM_NTASKS") and int(os.environ["SLURM_NTASKS"]) > 1:
        # SLURM rendezvous (utils.py:77-101 equivalent): first node hosts
        nodelist = os.environ.get("SLURM_JOB_NODELIST", "")
        first = nodelist.split(",")[0].replace("[", "").split("-")[0] if nodelist else "localhost"
        port = int(os.environ.get("AUDIOSSL_PORT", 12357))
        jax.distributed.initialize(
            coordinator_address=f"{first}:{port}",
            num_processes=int(os.environ["SLURM_NTASKS"]),
            process_id=int(os.environ["SLURM_PROCID"]),
        )
        log.info("jax.distributed initialized from SLURM env")
        return True
    if os.environ.get("TPU_WORKER_HOSTNAMES") and "," in os.environ["TPU_WORKER_HOSTNAMES"]:
        jax.distributed.initialize()  # TPU pod auto-config
        log.info("jax.distributed initialized from TPU pod metadata")
        return True
    return False


def process_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()


def setup_compilation_cache(run_cfg: dict | None = None) -> str | None:
    """Enable JAX's persistent compilation cache for fast restarts.

    Cold-start compiles dominate relaunch latency (the MViT family takes
    minutes per shape; this sandbox's remote-compile service 20 s – 2 min).
    The persistent cache keys compiled executables by (HLO, compile options,
    runtime version), so preemption-resume (train/preemption.py) and
    repeated launches of the same config skip straight to execution — the
    TPU answer to the reference's warm CUDA context across SLURM requeues.

    Resolution order: AUDIOSSL_COMPILATION_CACHE env var, then
    run.compilation_cache_dir. Absent/empty leaves JAX's default (off).
    Returns the activated directory, or None when disabled.
    """
    path = os.environ.get("AUDIOSSL_COMPILATION_CACHE")
    if not path and run_cfg:
        path = run_cfg.get("compilation_cache_dir")
    if not path:
        return None
    path = os.path.abspath(os.path.expanduser(str(path)))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every entry: the default 1 s floor would skip the small jitted
    # helpers (aug-state init, window crop) that still pay remote-compile
    # round trips; disk cost is negligible next to the encoder executables
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    log.info("persistent compilation cache at %s", path)
    return path
