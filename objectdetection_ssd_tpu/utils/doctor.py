"""Backend health probe (`cli doctor`) — failure *detection* for the runtime.

The reference has no health tooling at all (its failure story is a bare
training script — SURVEY.md §5 "failure detection: none"); this framework
already recovers from mid-train faults (emergency checkpoints,
`train/checkpoint.py`) but until round 5 the *detection* side of a sick
accelerator backend was a manual recipe in the dev notes.  This module
productizes it.

The deployment transport for the TPU chip (a relay) has two observed
degradation modes, both environmental and invisible to in-process code:

1. **hung-init** — ``jax.devices()`` sleeps forever at 0% CPU with no
   error (a nanosleep retry loop inside backend init).  No exception is
   ever raised; any process that touches the backend wedges.
2. **compile-stall / worker-crash** — ``jax.devices()`` answers, but
   compiles stall indefinitely at ~0% CPU, and already-running programs
   die at ``device_get`` with "UNAVAILABLE: TPU worker process crashed
   or restarted".

Because mode 1 wedges the probing process itself, the probe MUST run in a
fresh subprocess under a hard timeout — probing in-process would turn the
doctor into a patient.  The child prints a progress marker after each
stage (import, device enumeration, jitted matmul + ``device_get``); the
parent classifies the outcome from which markers made it out before the
exit/timeout.  This is exactly the diagnostic the two incidents were
triaged with, made a one-command surface.

Usage:
    python -m objectdetection_ssd_tpu.cli doctor [--timeout 120] [--json]

Exit code 0 = healthy, 1 = degraded (the status line says which mode).
"""

from __future__ import annotations

import dataclasses
import json
import subprocess
import sys
from typing import List, Optional

# Printed by the child after each probe stage; classification keys on
# which of these made it to stdout before exit or timeout.
_MARK_DEVICES = "DOCTOR_DEVICES"
_MARK_MATMUL = "DOCTOR_MATMUL"

# 128x128 matrix of 2.0 squared: every output element is 2*2*128.
_EXPECTED_VALUE = 512.0

# The child probe.  argv[1] (optional) is a platform override — it must be
# applied via jax.config, not env: this host's sitecustomize pre-registers
# the TPU backend and JAX_PLATFORMS alone does not win over it (see
# tests/conftest.py, which has the same constraint).
_CHILD_SOURCE = """\
import sys, time
t0 = time.time()
import jax
if len(sys.argv) > 1 and sys.argv[1]:
    jax.config.update("jax_platforms", sys.argv[1])
devs = jax.devices()
t1 = time.time()
print("%s %%d %%s %%.3f" %% (len(devs), devs[0].platform, t1 - t0),
      flush=True)
import jax.numpy as jnp
x = jnp.full((128, 128), 2.0, jnp.float32)
y = jax.jit(lambda a: a @ a)(x)
v = float(jax.device_get(y)[0, 0])
t2 = time.time()
print("%s %%.1f %%.3f" %% (v, t2 - t1), flush=True)
""" % (_MARK_DEVICES, _MARK_MATMUL)


@dataclasses.dataclass(frozen=True)
class ProbeResult:
    """Outcome of one subprocess backend probe.

    ``status`` is one of:
      * ``"healthy"`` — devices enumerated, a jitted matmul compiled, ran,
        and round-tripped through ``device_get`` with the right answer;
      * ``"hung-init"`` — timed out before device enumeration (mode 1);
      * ``"compile-stall"`` — devices enumerated but the matmul never
        completed inside the timeout (mode 2, stall flavor);
      * ``"worker-crashed"`` — the child died with the relay's
        "UNAVAILABLE ... crashed or restarted" signature (mode 2, crash
        flavor);
      * ``"error"`` — any other failure (wrong numerics, import error...).
    """

    status: str
    platform: Optional[str] = None
    device_count: Optional[int] = None
    init_seconds: Optional[float] = None    # import jax -> devices() done
    matmul_seconds: Optional[float] = None  # compile + run + device_get
    detail: str = ""

    @property
    def healthy(self) -> bool:
        return self.status == "healthy"

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


def classify_probe(returncode: Optional[int], timed_out: bool,
                   stdout: str, stderr: str) -> ProbeResult:
    """Classify a finished/killed probe child from its streams.

    Pure function of the child's observable behavior so each degradation
    mode is unit-testable without a sick backend (tests/test_doctor.py
    replays synthetic transcripts of both real incidents).
    """
    devices_line = _find_marker(stdout, _MARK_DEVICES)
    matmul_line = _find_marker(stdout, _MARK_MATMUL)

    platform = None
    device_count = None
    init_seconds = None
    if devices_line is not None:
        parts = devices_line.split()
        # "DOCTOR_DEVICES <count> <platform> <seconds>"
        if len(parts) >= 4:
            device_count = int(parts[1])
            platform = parts[2]
            init_seconds = float(parts[3])

    if timed_out:
        if devices_line is None:
            return ProbeResult(
                status="hung-init",
                detail="backend init (jax.devices()) did not return "
                       "inside the timeout — relay degradation mode 1; "
                       "nothing in-process can recover, retry later")
        return ProbeResult(
            status="compile-stall", platform=platform,
            device_count=device_count, init_seconds=init_seconds,
            detail="devices enumerated but a 128x128 jitted matmul did "
                   "not complete inside the timeout — relay degradation "
                   "mode 2 (stalled compiles)")

    if matmul_line is not None and returncode == 0:
        parts = matmul_line.split()
        value = float(parts[1])
        matmul_seconds = float(parts[2])
        if abs(value - _EXPECTED_VALUE) > 1e-3:
            return ProbeResult(
                status="error", platform=platform,
                device_count=device_count, init_seconds=init_seconds,
                matmul_seconds=matmul_seconds,
                detail="matmul ran but returned %r (expected %r) — "
                       "backend is computing wrong answers"
                       % (value, _EXPECTED_VALUE))
        return ProbeResult(
            status="healthy", platform=platform,
            device_count=device_count, init_seconds=init_seconds,
            matmul_seconds=matmul_seconds,
            detail="devices + jitted matmul + device_get all ok")

    if "UNAVAILABLE" in stderr and ("crashed or restarted" in stderr
                                    or "worker process" in stderr):
        return ProbeResult(
            status="worker-crashed", platform=platform,
            device_count=device_count, init_seconds=init_seconds,
            detail="child died at device_get with the relay's "
                   "worker-crashed signature — relay degradation mode 2")

    tail = stderr.strip().splitlines()[-1] if stderr.strip() else ""
    return ProbeResult(
        status="error", platform=platform, device_count=device_count,
        init_seconds=init_seconds,
        detail="probe child exited rc=%s without completing; last stderr "
               "line: %s" % (returncode, tail or "<empty>"))


def _find_marker(stdout: str, marker: str) -> Optional[str]:
    for line in stdout.splitlines():
        if line.startswith(marker):
            return line
    return None


def probe_backend(timeout_s: float = 120.0,
                  platform: Optional[str] = None,
                  _child_source: Optional[str] = None) -> ProbeResult:
    """Probe the backend in a fresh subprocess under a hard timeout.

    ``platform``: optional jax platform override for the child (e.g.
    ``"cpu"`` — used by the test suite, which must never touch the real
    chip).  ``_child_source`` substitutes the child program in tests that
    exercise the timeout paths without a 2-minute wait.
    """
    cmd = [sys.executable, "-c", _child_source or _CHILD_SOURCE]
    if platform:
        cmd.append(platform)
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired as e:
        return classify_probe(None, True, _as_text(e.stdout),
                              _as_text(e.stderr))
    return classify_probe(proc.returncode, False, proc.stdout, proc.stderr)


def _as_text(stream) -> str:
    if stream is None:
        return ""
    if isinstance(stream, bytes):
        return stream.decode("utf-8", errors="replace")
    return stream


def host_checks(compilation_cache_dir: Optional[str] = None) -> List[str]:
    """Non-fatal host-side checks, returned as human-readable lines.

    Covers the two host dependencies that degrade silently: the native
    C++ data-path helper (falls back to pure Python — correct but slower)
    and the persistent compilation-cache directory (unwritable = every
    fresh process pays the full compile wall again).
    """
    lines = []
    from objectdetection_ssd_tpu import native
    if native.available():
        lines.append("native helper: ok (C++ data-path kernels loaded)")
    else:
        lines.append("native helper: UNAVAILABLE — pure-Python fallback "
                     "active (correct, slower; is g++ installed?)")
    if compilation_cache_dir:
        import os
        import tempfile
        try:
            os.makedirs(compilation_cache_dir, exist_ok=True)
            with tempfile.NamedTemporaryFile(dir=compilation_cache_dir):
                pass
            lines.append("compilation cache: ok (writable: %s)"
                         % compilation_cache_dir)
        except OSError as e:
            lines.append("compilation cache: NOT WRITABLE (%s): %s"
                         % (compilation_cache_dir, e))
    return lines
