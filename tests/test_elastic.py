"""Elastic supervisor: backend probe + fail-then-resume relaunch.

The reference has no failure-recovery story (SURVEY.md §5); this
subsystem is added capability. These tests run everything on the CPU
platform (conftest), where the probe succeeds immediately.
"""

import os
import subprocess
import sys

import pytest

from chaorec_tpu.elastic import probe_backend, supervise, wait_for_backend

pytestmark = pytest.mark.fast


def test_probe_backend_cpu():
    assert probe_backend(timeout_s=300) == "cpu"


def test_wait_for_backend_accepts_cpu_under_cpu_env():
    # conftest pins JAX_PLATFORMS=cpu, so cpu is a valid answer
    assert wait_for_backend(max_wait_s=600, log=lambda m: None) == "cpu"


def test_wait_for_backend_rejects_cpu_when_accelerator_expected():
    # with accept_cpu=False and a zero budget, the wait must expire and
    # pin the cpu fallback rather than hang or crash
    msgs = []
    got = wait_for_backend(max_wait_s=0, probe_timeout_s=300,
                           accept_cpu=False, log=msgs.append)
    assert got == "cpu"
    assert msgs, "expired wait must explain itself"


def test_supervise_success_first_try(tmp_path):
    rc = supervise([sys.executable, "-c", "print('ok')"], retries=0,
                   log=lambda m: None)
    assert rc == 0


def test_supervise_relaunches_until_success(tmp_path):
    """A child that fails twice then succeeds: the supervisor relaunches
    (the checkpoint/grid-cursor subsystem makes the real CLI resume
    exactly; here the marker file plays the role of the checkpoint)."""
    marker = tmp_path / "attempts"
    child = (
        "import pathlib, sys; p = pathlib.Path(r'%s'); "
        "n = int(p.read_text()) if p.exists() else 0; "
        "p.write_text(str(n + 1)); sys.exit(0 if n >= 2 else 3)" % marker
    )
    msgs = []
    rc = supervise([sys.executable, "-c", child], retries=5,
                   backend_wait_s=5, log=msgs.append)
    assert rc == 0
    assert marker.read_text() == "3"


def test_supervise_gives_up_after_retries(tmp_path):
    rc = supervise([sys.executable, "-c", "import sys; sys.exit(7)"],
                   retries=1, backend_wait_s=1, log=lambda m: None)
    assert rc == 7


def test_supervisor_cli_entry(tmp_path):
    """python -m chaorec_tpu.elastic -- cmd... (the form the quality
    queue uses)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "chaorec_tpu.elastic", "--retries", "0",
         "--", sys.executable, "-c", "print('supervised-ok')"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    assert "supervised-ok" in out.stdout


def test_wait_for_backend_no_pin_leaves_env_alone():
    """The supervisor's variant: an expired wait returns None and does
    NOT poison the environment with a cpu pin (a later attempt must
    still be able to reach the accelerator)."""
    before = os.environ.get("JAX_PLATFORMS")
    got = wait_for_backend(max_wait_s=0, probe_timeout_s=300,
                           accept_cpu=False, pin_cpu_on_expiry=False,
                           log=lambda m: None)
    assert got is None
    assert os.environ.get("JAX_PLATFORMS") == before


def test_bench_pause_resumes_queue_tree(tmp_path):
    """bench.py's queue pause: a watchdog-named process tree is STOPped
    and CONTed; stale pid files and wrong-cmdline processes are left
    alone (pid-recycling safety)."""
    import importlib.util
    import time

    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    script = tmp_path / "fake_watchdog.sh"
    script.write_text("#!/bin/bash\nsleep 60\n")
    proc = subprocess.Popen(["bash", str(script)])
    try:
        pidf = tmp_path / "watchdog.pid"
        pidf.write_text(f"{proc.pid}\n")
        # an innocent process + a dead pid in the list must be ignored
        innocent = subprocess.Popen(["sleep", "60"])
        pidf2 = tmp_path / "quality_r2.pid"
        pidf2.write_text(f"{innocent.pid}\n")
        pidf3 = tmp_path / "stale.pid"
        pidf3.write_text("999999999\n")
        try:
            resume = bench._pause_evidence_queue(
                (str(pidf), str(pidf2), str(pidf3)))
            time.sleep(0.2)

            def state(pid):
                return open(f"/proc/{pid}/stat").read().split(")")[-1].split()[0]

            assert state(proc.pid) == "T"        # watchdog tree stopped
            assert state(innocent.pid) != "T"    # cmdline guard held
            resume()
            time.sleep(0.2)
            assert state(proc.pid) != "T"        # resumed
        finally:
            innocent.kill()
    finally:
        proc.kill()
