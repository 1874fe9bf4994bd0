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
