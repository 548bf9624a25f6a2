"""Cross-framework quality oracle: run the REFERENCE's torch code on CPU.

VERDICT r3 item 1: the multimodal half of the zoo has no end-to-end
numerics check against the reference because the snapshot ships no real
v/t features. This harness closes that by running the reference's OWN
training pipeline (main.py -> train_and_evaluate.py, unmodified, via
runpy) on CPU with THIS repo's deterministic synthetic features and the
same seed, then comparing 5-10-epoch loss/metric trajectories with our
CLI at the same combo (scripts/xfw_report.py builds the table).

Mechanics:
- a sandbox root (/tmp/xfw_root/<data>) symlinks the reference Data/
  files and adds our synthetic v_feat.npy/t_feat.npy (identical arrays
  to what our loader generates: data/loading.py _feat);
- a single-combo Model_YAML/<Model>.yaml pins the grid to one point;
- scripts/xfw_shims.py supplies cuda no-ops, torch-1.11
  zero_grad(set_to_none=False) semantics, and PyG/torch_sparse/
  torch_scatter shims;
- the reference writes log/<Model>_<data>.log in its own format; the
  ref child copies it to parity_logs/xfw_<Model>_<data>.ref.log.

Usage:
  python scripts/xfw_oracle.py --Model FREEDOM --data_path baby \
      --num_epoch 6 [--combo '{...}'] [--ref-only | --ours-only]
      [--ours-cpu]

With no --combo the first combo of our shipped Model_YAML grid (which
mirrors the reference's) is used on both sides.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
SANDBOX = Path("/tmp/xfw_root")


def first_combo(model: str) -> dict:
    sys.path.insert(0, str(REPO))
    from chaorec_tpu.config import grid_combinations, load_yaml_config

    yaml_cfg = load_yaml_config(model, str(REPO / "Model_YAML"))
    return next(iter(grid_combinations(yaml_cfg)), {})


def build_sandbox(data_path: str) -> Path:
    root = SANDBOX
    ddir = root / "Data" / data_path
    ddir.mkdir(parents=True, exist_ok=True)
    (root / "log").mkdir(exist_ok=True)
    for f in (REF / "Data" / data_path).iterdir():
        dst = ddir / f.name
        if not dst.exists():
            dst.symlink_to(f)
    # identical synthetic features to our loader's
    need = [n for n in ("v_feat.npy", "t_feat.npy") if not (ddir / n).exists()]
    if need:
        sys.path.insert(0, str(REPO))
        from chaorec_tpu.data.loading import data_load

        ds = data_load(data_path, data_root=str(REF / "Data"),
                       has_v=True, has_t=True)
        for name, arr in (("v_feat.npy", ds.v_feat), ("t_feat.npy", ds.t_feat)):
            if name in need and arr is not None:
                import numpy as np

                np.save(ddir / name, arr)
    return root


def _yval(v) -> str:
    # YAML 1.1 parses `1e-05` (no dot in the mantissa) as a STRING;
    # emit floats with an explicit dot so the reference side gets the
    # same float our grid produced (reference yamls with genuine string
    # values like '1e-5' pass through json.dumps quoted, matching the
    # reference's own float(...) call sites).
    if isinstance(v, float):
        s = repr(v)
        if "e" in s and "." not in s.split("e")[0]:
            mant, exp = s.split("e")
            s = f"{mant}.0e{exp}"
        return s
    return json.dumps(v)


def write_yaml(root: Path, model: str, combo: dict) -> None:
    ydir = root / "Model_YAML"
    ydir.mkdir(exist_ok=True)
    lines = [f"{k}: [{_yval(v)}]" for k, v in combo.items()]
    lines.append("hyper_parameters: [" + ", ".join(combo.keys()) + "]")
    (ydir / f"{model}.yaml").write_text("\n".join(lines) + "\n")


def run_ref(model: str, data_path: str, num_epoch: int, combo: dict,
            timeout: int) -> int:
    root = build_sandbox(data_path)
    write_yaml(root, model, combo)
    child = f"""
import sys, runpy
sys.path.insert(0, {str(REPO / 'scripts')!r})
sys.path.insert(0, {str(REF)!r})
import xfw_shims
xfw_shims.install_all()
sys.argv = ['main.py', '--Model', {model!r}, '--data_path', {data_path!r},
            '--num_epoch', str({num_epoch}), '--num_workers', '0']
runpy.run_path({str(REF / 'main.py')!r}, run_name='__main__')
"""
    out = REPO / "parity_logs" / f"xfw_{model}_{data_path}.ref.stdout"
    with open(out, "w") as fh:
        rc = subprocess.call([sys.executable, "-c", child], cwd=root,
                             stdout=fh, stderr=subprocess.STDOUT,
                             timeout=timeout)
    src = root / "log" / f"{model}_{data_path}.log"
    if src.exists():
        shutil.copy(src, REPO / "parity_logs" /
                    f"xfw_{model}_{data_path}.ref.log")
    return rc


def run_ours(model: str, data_path: str, num_epoch: int, combo: dict,
             timeout: int, cpu: bool, data_root: str | None = None) -> int:
    logdir = Path("/tmp/xfw_ours_logs")
    logdir.mkdir(exist_ok=True)
    force_cpu = ("import jax; jax.config.update('jax_platforms', 'cpu')\n"
                 if cpu else "")
    root = data_root or str(REF / "Data")
    child = f"""
{force_cpu}import sys
sys.path.insert(0, {str(REPO)!r})
sys.argv = ['run_combo.py', '--Model', {model!r}, '--data_path',
            {data_path!r}, '--data_root', {root!r},
            '--num_epoch', str({num_epoch}), '--log_dir', {str(logdir)!r},
            '--combo', {json.dumps(combo)!r}]
import runpy
runpy.run_path({str(REPO / 'scripts' / 'run_combo.py')!r},
               run_name='__main__')
"""
    env = dict(os.environ)
    if cpu:
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
    out = REPO / "parity_logs" / f"xfw_{model}_{data_path}.ours.stdout"
    with open(out, "w") as fh:
        rc = subprocess.call([sys.executable, "-c", child], cwd=REPO,
                             stdout=fh, stderr=subprocess.STDOUT,
                             timeout=timeout, env=env)
    src = logdir / f"{model}_{data_path}.log"
    if src.exists():
        shutil.copy(src, REPO / "parity_logs" /
                    f"xfw_{model}_{data_path}.ours.log")
    return rc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--Model", required=True)
    ap.add_argument("--data_path", default="baby")
    ap.add_argument("--num_epoch", type=int, default=6)
    ap.add_argument("--combo", default=None)
    ap.add_argument("--timeout", type=int, default=5400)
    ap.add_argument("--ref-only", action="store_true")
    ap.add_argument("--ours-only", action="store_true")
    ap.add_argument("--ours-cpu", action="store_true")
    ap.add_argument("--ours-data-root", default=None,
                    help="data_root for our side (e.g. the sandbox Data/ "
                         "so generated aux files like user_graph_dict / "
                         "hyperedges are byte-identical on both sides)")
    args = ap.parse_args()

    combo = json.loads(args.combo) if args.combo else first_combo(args.Model)
    print(f"combo: {combo}", flush=True)
    if not args.ours_only:
        rc = run_ref(args.Model, args.data_path, args.num_epoch, combo,
                     args.timeout)
        print(f"ref side exit {rc}", flush=True)
    if not args.ref_only:
        rc = run_ours(args.Model, args.data_path, args.num_epoch, combo,
                      args.timeout, args.ours_cpu, args.ours_data_root)
        print(f"ours side exit {rc}", flush=True)


if __name__ == "__main__":
    main()
