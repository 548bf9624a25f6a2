"""Checkpoint/resume: a run killed mid-grid continues where it stopped."""

import numpy as np

from chaorec_tpu.config import Config
from chaorec_tpu.models import build_model
from chaorec_tpu.train.loop import Trainer


def _cfg(tmp_path, epochs):
    return Config(
        Model="LightGCN", batch_size=64, num_epoch=epochs, dim_E=16,
        learning_rate=0.05, reg_weight=1e-4, n_layers=2, topk=(5, 10, 20),
        patience=epochs, checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=2,
    )


def test_checkpoint_resume_matches_uninterrupted(tiny_dataset, tmp_path):
    # uninterrupted 6-epoch run
    cfg = _cfg(tmp_path / "full", 6)
    t_full = Trainer(build_model(cfg, tiny_dataset), tiny_dataset, cfg)
    best_full = t_full.run()
    ref = np.asarray(t_full.final_params["user_emb"]
                     if "user_emb" in t_full.final_params
                     else list(t_full.final_params.values())[0])

    # interrupted: 4 epochs (checkpoint at 2 and 4), then resume to 6
    cfg_a = _cfg(tmp_path / "split", 4)
    t_a = Trainer(build_model(cfg_a, tiny_dataset), tiny_dataset, cfg_a)
    t_a.run()

    cfg_b = _cfg(tmp_path / "split", 6)
    t_b = Trainer(build_model(cfg_b, tiny_dataset), tiny_dataset, cfg_b)
    best_b = t_b.run()
    res = np.asarray(t_b.final_params["user_emb"]
                     if "user_emb" in t_b.final_params
                     else list(t_b.final_params.values())[0])

    # same total number of optimizer steps from the same seed/rng stream
    assert np.allclose(ref, res, atol=1e-5), np.abs(ref - res).max()
    assert best_b[20]["recall"] > 0.5


def test_npz_fallback_roundtrip(tmp_path):
    """The no-orbax fallback stores and restores arbitrary pytrees."""
    import jax.numpy as jnp
    import numpy as np

    from chaorec_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    mgr._ocp = None  # force the npz path
    mgr._mgr = None
    tree = {"a": jnp.arange(6.0).reshape(2, 3),
            "b": {"c": jnp.asarray([1, 2, 3], jnp.int32)}}
    for step in (1, 2, 3):
        mgr.save(step, tree, metrics={"20": {"recall": 0.5 + step}})
    assert mgr.latest_step() == 3
    restored, metrics = mgr.restore(3, tree)
    np.testing.assert_array_equal(np.asarray(restored["a"]),
                                  np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(restored["b"]["c"]),
                                  np.asarray(tree["b"]["c"]))
    assert metrics == {"20": {"recall": 3.5}}
    # max_to_keep gc removed step 1
    assert mgr.latest_step() == 3
    import os
    assert not os.path.exists(str(tmp_path / "ck" / "step_1"))


def test_eval_pipeline_equivalence(tiny_dataset, caplog):
    """Pipelined and unpipelined run loops produce identical logs/metrics."""
    import logging

    from chaorec_tpu.config import Config
    from chaorec_tpu.models import build_model
    from chaorec_tpu.train.loop import Trainer

    results = {}
    logs = {}
    for flag in (False, True):
        cfg = Config(Model="LightGCN", batch_size=64, num_epoch=6, dim_E=16,
                     learning_rate=0.05, reg_weight=1e-4, n_layers=2,
                     patience=2, eval_pipeline=flag)
        model = build_model(cfg, tiny_dataset)
        with caplog.at_level(logging.INFO):
            caplog.clear()
            results[flag] = Trainer(model, tiny_dataset, cfg).run()
            logs[flag] = [r.getMessage() for r in caplog.records
                          if r.getMessage().startswith(("Epoch", "Validation",
                                                        "Test", "5:", "10:",
                                                        "20:"))]
    assert results[False] == results[True]
    assert logs[False] == logs[True]
