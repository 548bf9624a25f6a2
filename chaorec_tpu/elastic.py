"""Elastic failure recovery: backend probing + a process supervisor.

The reference has no failure-detection or recovery story at all (its
trainer dies with the process; SURVEY.md §5). On a TPU fleet the common
failure is environmental — a preempted chip, a dropped coordinator
tunnel, a wedged PJRT client — and a poisoned client generally cannot be
revived in-process, so recovery is PROCESS-level by design:

- :func:`wait_for_backend` probes the accelerator in a **subprocess**
  with a hard timeout (a wedged tunnel hangs ``jax.devices()``
  indefinitely rather than erroring) and retries up to a budget.
- :func:`supervise` / ``python -m chaorec_tpu.elastic -- cmd...`` runs a
  training command, and on a non-zero exit waits for the backend to
  come back and relaunches. Exact continuation is provided by the
  checkpoint/grid-cursor subsystem (``train/checkpoint.py``): a relaunch
  with ``--checkpoint_dir`` resumes mid-grid, mid-run, with early-stop
  state intact.

``bench.py`` uses the same probe so the round's contract artifact can
never be lost to a transient tunnel flap (VERDICT r2 item 1).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from typing import Optional, Sequence

_PROBE = (
    "import jax; d = jax.devices(); assert d; "
    "x = jax.numpy.ones((128, 128)); (x @ x).block_until_ready(); "
    "print(d[0].platform)"
)


def probe_backend(timeout_s: float = 300.0) -> Optional[str]:
    """One subprocess probe: returns the platform name, or None if the
    probe failed or hung past ``timeout_s``."""
    env = dict(os.environ)
    if env.get("JAX_PLATFORMS") == "cpu":
        # cpu is pinned (tests, fallback): the TPU-tunnel plugin's
        # sitecustomize registration is irrelevant here and its network
        # handshake can hang a dead-tunnel process until the timeout —
        # skip it so cpu probes stay hermetic and fast
        env.pop("PALLAS_AXON_POOL_IPS", None)
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE],
            capture_output=True, text=True, timeout=timeout_s, env=env,
        )
    except subprocess.TimeoutExpired:
        return None
    if out.returncode != 0:
        return None
    lines = out.stdout.strip().splitlines()
    return lines[-1] if lines else None


def wait_for_backend(max_wait_s: float = 1800.0, poll_s: float = 30.0,
                     probe_timeout_s: float = 300.0,
                     accept_cpu: Optional[bool] = None,
                     pin_cpu_on_expiry: bool = True,
                     log=print) -> Optional[str]:
    """Bounded wait for a usable backend; returns the platform name.

    ``accept_cpu`` defaults to True only when the environment itself
    pins ``JAX_PLATFORMS`` to cpu (tests, virtual meshes); under an
    accelerator env (set OR plugin-discovered) a cpu answer means the
    plugin failed and is retried.

    On expiry: with ``pin_cpu_on_expiry`` (the bench contract — an
    artifact must still be produced), the cpu fallback is pinned for
    this process AND its children — env var, the tunnel-plugin trigger
    removed (``PALLAS_AXON_POOL_IPS``; sitecustomize's registration can
    otherwise override the env pin / hang child startup), and
    ``jax.config`` if jax is importable — then "cpu" is returned.
    Without it (the training supervisor — a later attempt should still
    reach the accelerator once it returns), nothing is mutated and
    ``None`` is returned.
    """
    if accept_cpu is None:
        accept_cpu = os.environ.get("JAX_PLATFORMS") == "cpu"
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        platform = probe_backend(probe_timeout_s)
        if platform is not None and (platform != "cpu" or accept_cpu):
            return platform
        remaining = deadline - time.time()
        log(f"# elastic: backend probe {attempt} failed "
            f"(got {platform!r}); {remaining:.0f}s left")
        if remaining <= 0:
            if not pin_cpu_on_expiry:
                return None
            os.environ["JAX_PLATFORMS"] = "cpu"
            os.environ.pop("PALLAS_AXON_POOL_IPS", None)
            try:  # in-process callers (bench) may already have jax loaded
                import jax

                jax.config.update("jax_platforms", "cpu")
            except Exception:
                pass
            return "cpu"
        time.sleep(min(poll_s, max(remaining, 1.0)))


def supervise(cmd: Sequence[str], retries: int = 5,
              backend_wait_s: float = 1800.0,
              probe_timeout_s: float = 300.0, log=print) -> int:
    """Run ``cmd``; on failure, wait for the backend and relaunch.

    Returns the final exit code (0 on success). Between attempts the
    backend is re-probed so a relaunch does not burn an attempt on a
    still-dead tunnel. The child is expected to be idempotent-resumable
    (checkpoint_dir + grid cursor make the CLI exactly so).
    """
    import signal
    import threading

    child = {"proc": None}
    in_main = threading.current_thread() is threading.main_thread()

    def _forward(signum, frame):
        # an outer `timeout` TERMs only this supervisor; without
        # forwarding, the training child would orphan and keep burning
        # the chip while the next queue entry starts
        p = child["proc"]
        if p is not None and p.poll() is None:
            p.terminate()
        raise SystemExit(128 + signum)

    old = {}
    if in_main:
        for s in (signal.SIGTERM, signal.SIGINT):
            old[s] = signal.signal(s, _forward)
    try:
        attempt = 0
        while True:
            attempt += 1
            log(f"# elastic: launch attempt {attempt}: {' '.join(cmd)}")
            proc = subprocess.Popen(list(cmd))
            child["proc"] = proc
            rc = proc.wait()
            if rc == 0:
                return 0
            log(f"# elastic: attempt {attempt} exited rc={rc}")
            if attempt > retries:
                log(f"# elastic: giving up after {attempt} attempts")
                return rc
            # No cpu pinning here: a training relaunch must reach the
            # accelerator once it returns — an expired wait relaunches
            # anyway (the attempt budget bounds it) without poisoning
            # the env for every later attempt.
            platform = wait_for_backend(backend_wait_s,
                                        probe_timeout_s=probe_timeout_s,
                                        pin_cpu_on_expiry=False,
                                        log=log)
            if platform is None:
                log("# elastic: wait expired; relaunching anyway")
            else:
                log(f"# elastic: backend back ({platform}); relaunching")
    finally:
        if in_main:
            for s, h in old.items():
                signal.signal(s, h)


def main(argv: Optional[Sequence[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    retries, backend_wait, probe_timeout = 5, 1800.0, 300.0
    while argv and argv[0] != "--":
        if argv[0] == "--retries":
            retries = int(argv[1]); argv = argv[2:]
        elif argv[0] == "--backend-wait":
            backend_wait = float(argv[1]); argv = argv[2:]
        elif argv[0] == "--probe-timeout":
            probe_timeout = float(argv[1]); argv = argv[2:]
        else:
            raise SystemExit(f"unknown supervisor flag {argv[0]!r} "
                             "(flags: --retries N --backend-wait S "
                             "--probe-timeout S -- cmd...)")
    if not argv or argv[0] != "--" or len(argv) < 2:
        raise SystemExit("usage: python -m chaorec_tpu.elastic "
                         "[--retries N] [--backend-wait S] "
                         "[--probe-timeout S] -- cmd arg...")
    return supervise(argv[1:], retries=retries,
                     backend_wait_s=backend_wait,
                     probe_timeout_s=probe_timeout)


if __name__ == "__main__":
    raise SystemExit(main())
