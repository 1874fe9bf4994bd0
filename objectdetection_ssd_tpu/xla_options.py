"""PJRT compiler-option helpers (TPU-only; no-ops on CPU backends).

XLA_FLAGS cannot reach the TPU compiler in deployments where the client
process links a CPU-only XLA — it aborts on any ``--xla_tpu_*`` flag
(measured, benchmarks/RESULTS.md "Train-step time breakdown") — but PJRT
``compiler_options`` CAN: both ``jax.jit(..., compiler_options=...)`` and
AOT ``.lower().compile(compiler_options=...)`` deliver options to the
backend compiler wherever it runs.

The one option this framework tunes is the per-fusion scoped-VMEM budget,
and its optimum is direction-dependent (full sweeps in RESULTS.md
"scoped-VMEM compiler option"): the conv-backward-dominated TRAIN step
wants 64 MiB (+1.5-2.9% img/s; `TrainConfig.scoped_vmem_limit_kib`),
while the forward+postprocess INFERENCE graph wants 24 MiB (+1.2%; 64 MiB
costs it 4.2%; `PostprocessConfig.scoped_vmem_limit_kib`).  Each path
carries its own measured default.
"""

from __future__ import annotations

from typing import Optional

import jax


def apply_compilation_cache(path: Optional[str]) -> None:
    """Enable JAX's persistent compilation cache at ``path`` (no-op on None).

    Must run before the first compile of the process.  Thresholds are
    zeroed so every program caches (the defaults skip sub-second
    compiles — on this backend even tiny programs pay a relay RPC).
    Applied from THREE places so `TrainConfig.compilation_cache_dir` is
    never a write-only field: `cli.main` (from ``--compilation-cache``,
    before any subcommand compiles), `Trainer.__init__`, and
    `Detector.__init__` (both from the config, for programmatic users who
    never go through the CLI).  Re-applying the same path is idempotent.
    """
    if not path:
        return
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def scoped_vmem_options(limit_kib: Optional[int]) -> Optional[dict]:
    """``{"xla_tpu_scoped_vmem_limit_kib": N}``, or None.

    None when ``limit_kib`` is falsy (0/None = compiler default) or the
    backend is CPU — the option is TPU-specific and a CPU compile would
    reject the unknown key (the test suite runs on a forced-CPU mesh).
    """
    if not limit_kib:
        return None
    if jax.devices()[0].platform == "cpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": int(limit_kib)}
