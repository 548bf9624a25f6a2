"""Print the REFERENCE MMSSL's loss-term values for the first batches.

Counterpart of scripts/probe_mmssl_terms.py (see its docstring): runs
the reference's own torch code on CPU (xfw sandbox + shims), with the
loss sub-methods wrapped to print their returns for the first 3
batches, then exits after epoch 1. No reference code is copied — the
wrappers only observe call results.

Usage: python scripts/probe_mmssl_ref_terms.py [baby]
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

from xfw_oracle import REF, build_sandbox, first_combo, write_yaml  # noqa: E402


def main() -> None:
    data_path = sys.argv[1] if len(sys.argv) > 1 else "baby"
    combo = first_combo("MMSSL")
    root = build_sandbox(data_path)
    write_yaml(root, "MMSSL", combo)
    child = f"""
import sys, runpy
import torch
sys.path.insert(0, {str(REPO / 'scripts')!r})
sys.path.insert(0, {str(REF)!r})
import xfw_shims
xfw_shims.install_all()

from Model.MMSSL import MMSSL

_seen = {{"n": 0}}

def _wrap(name, fn, fmt=None):
    def inner(self, *a, **k):
        out = fn(self, *a, **k)
        if _seen["n"] < 3 * 4:  # 4 wrapped methods x 3 batches
            _seen["n"] += 1
            if fmt is not None:
                print(f"REF {{name}}: {{fmt(out)}}", flush=True)
            else:
                print(f"REF {{name}}: {{float(out):+.6e}}", flush=True)
        return out
    return inner

MMSSL.loss_D = _wrap("loss_D", MMSSL.loss_D)
MMSSL.bpr_loss = _wrap(
    "bpr(mf,emb,reg)", MMSSL.bpr_loss,
    fmt=lambda o: tuple(f"{{float(x):+.6e}}" for x in o))
MMSSL.feat_reg_loss_calculation = _wrap(
    "feat_reg", MMSSL.feat_reg_loss_calculation)
MMSSL.batched_contrastive_loss = _wrap(
    "cl(raw, one modality)", MMSSL.batched_contrastive_loss)

_loss = MMSSL.loss
def loss_print(self, users, pos_items, neg_items, idx):
    out = _loss(self, users, pos_items, neg_items, idx)
    if int(idx) < 3:
        print(f"REF batch_loss[{{int(idx)}}]: {{float(out):+.6e}}", flush=True)
    if int(idx) < 3:
        fwd = self.forward(self.ui_graph, self.iu_graph, self.image_ui_graph,
                           self.image_iu_graph, self.text_ui_graph,
                           self.text_iu_graph)
        names = ["u_g", "i_g", "img_item", "txt_item", "img_user",
                 "txt_user", "user_emb", "_", "img_uid", "txt_uid"]
        with torch.no_grad():
            for n, t in list(zip(names, fwd)):
                if n == "_" or t is None: continue
                t = t.detach().float()
                print(f"REF |{{n}}|: rms={{float((t**2).mean().sqrt()):.4e}} "
                      f"max={{float(t.abs().max()):.4e}}", flush=True)
    if int(idx) == 2:
        print("REF probe complete (3 batches)", flush=True)
        raise SystemExit(0)
    return out
MMSSL.loss = loss_print

sys.argv = ['main.py', '--Model', 'MMSSL', '--data_path', {data_path!r},
            '--num_epoch', '1', '--num_workers', '0']
runpy.run_path({str(REF / 'main.py')!r}, run_name='__main__')
"""
    rc = subprocess.call([sys.executable, "-c", child], cwd=root)
    sys.exit(rc)


if __name__ == "__main__":
    main()
