"""Backend health probe (`cli doctor`, utils/doctor.py).

The classifier is pure, so both relay degradation modes the dev notes
document (hung-init 2026-08-18, compile-stall/worker-crash 2026-08-20)
are replayed here as synthetic transcripts; the subprocess plumbing is
exercised for real against the CPU backend and against injected children
that hang at each stage.  No reference analog (SURVEY.md §5: the
reference has no failure-detection tooling).
"""

import json

from objectdetection_ssd_tpu.utils import doctor


def test_classify_healthy_transcript():
    out = ("DOCTOR_DEVICES 8 cpu 4.210\n"
           "DOCTOR_MATMUL 512.0 0.350\n")
    r = doctor.classify_probe(0, False, out, "")
    assert r.healthy
    assert r.status == "healthy"
    assert r.platform == "cpu"
    assert r.device_count == 8
    assert r.init_seconds == 4.21
    assert r.matmul_seconds == 0.35


def test_classify_hung_init():
    # Mode 1 (2026-08-18): jax.devices() sleeps forever, no output at all.
    r = doctor.classify_probe(None, True, "", "")
    assert r.status == "hung-init"
    assert not r.healthy
    assert r.platform is None


def test_classify_compile_stall():
    # Mode 2, stall flavor (2026-08-20): devices answer, compiles never do.
    r = doctor.classify_probe(None, True, "DOCTOR_DEVICES 1 axon 2.100\n", "")
    assert r.status == "compile-stall"
    assert r.platform == "axon"
    assert r.device_count == 1


def test_classify_worker_crashed():
    # Mode 2, crash flavor: death at device_get with the relay signature.
    stderr = ("jaxlib.xla_extension.XlaRuntimeError: UNAVAILABLE: "
              "TPU worker process crashed or restarted\n")
    r = doctor.classify_probe(1, False, "DOCTOR_DEVICES 1 axon 2.100\n",
                              stderr)
    assert r.status == "worker-crashed"
    assert not r.healthy


def test_classify_wrong_numerics_is_error():
    out = ("DOCTOR_DEVICES 8 cpu 4.210\n"
           "DOCTOR_MATMUL 13.0 0.350\n")
    r = doctor.classify_probe(0, False, out, "")
    assert r.status == "error"
    assert "wrong answers" in r.detail


def test_classify_plain_failure_is_error():
    r = doctor.classify_probe(1, False, "", "ImportError: no module jax\n")
    assert r.status == "error"
    assert "ImportError" in r.detail


def test_probe_backend_cpu_is_healthy():
    # Real subprocess probe against the CPU backend (the suite must never
    # touch the chip).  Generous wall: a fresh jax import on this loaded
    # 1-core host can take tens of seconds.
    r = doctor.probe_backend(timeout_s=600.0, platform="cpu")
    assert r.healthy, r
    assert r.platform == "cpu"
    assert r.device_count >= 1
    assert r.matmul_seconds is not None


def test_probe_backend_hung_init_path():
    r = doctor.probe_backend(
        timeout_s=15.0, _child_source="import time\ntime.sleep(120)\n")
    assert r.status == "hung-init"


def test_probe_backend_compile_stall_path():
    # The timeout must leave the child comfortable room to start up and
    # print its marker even on a heavily loaded 1-core host — at 2 s this
    # flaked under the full suite (interpreter startup alone exceeded it,
    # misclassifying the run as hung-init).
    child = ('print("DOCTOR_DEVICES 1 axon 0.001", flush=True)\n'
             "import time\ntime.sleep(120)\n")
    r = doctor.probe_backend(timeout_s=15.0, _child_source=child)
    assert r.status == "compile-stall"
    assert r.platform == "axon"


def test_probe_result_json_roundtrip():
    r = doctor.ProbeResult(status="healthy", platform="cpu", device_count=8,
                           init_seconds=1.0, matmul_seconds=0.1, detail="ok")
    payload = json.loads(r.to_json())
    assert payload["status"] == "healthy"
    assert payload["device_count"] == 8


def test_cli_doctor_json_healthy(capsys):
    from objectdetection_ssd_tpu import cli

    rc = cli.main(["doctor", "--platform", "cpu", "--json",
                   "--timeout", "600"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(out)
    assert rc == 0
    assert payload["status"] == "healthy"
    assert payload["platform"] == "cpu"
    assert isinstance(payload["host_checks"], list)
    assert payload["host_checks"]  # native-helper line always present


def test_cli_doctor_degraded_exit_code(monkeypatch, capsys):
    from objectdetection_ssd_tpu import cli

    monkeypatch.setattr(
        doctor, "probe_backend",
        lambda **kw: doctor.ProbeResult(status="hung-init", detail="stub"))
    rc = cli.main(["doctor", "--platform", "cpu"])
    assert rc == 1
    assert "HUNG-INIT" in capsys.readouterr().out


def test_cli_doctor_checks_compilation_cache_dir(tmp_path, monkeypatch,
                                                capsys):
    from objectdetection_ssd_tpu import cli

    monkeypatch.setattr(
        doctor, "probe_backend",
        lambda **kw: doctor.ProbeResult(status="healthy", platform="cpu",
                                        device_count=8, detail="stub"))
    cache = tmp_path / "xla_cache"
    rc = cli.main(["doctor", "--platform", "cpu",
                   "--compilation-cache", str(cache)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "compilation cache: ok" in out
    assert cache.is_dir()


def test_doctor_config_defaults_drive_cli():
    from objectdetection_ssd_tpu import config as config_lib

    cfg = config_lib.Config()
    assert cfg.doctor.timeout_s == 120.0
    assert cfg.doctor.platform is None
