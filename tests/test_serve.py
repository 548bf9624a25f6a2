"""Serving path: artifact export, Recommender queries, HTTP endpoint."""

import json
import urllib.request

import jax
import numpy as np
import pytest

from chaorec_tpu.config import Config
from chaorec_tpu.models import build_model
from chaorec_tpu.serve import Recommender, export_artifact, serve_http
from chaorec_tpu.train.loop import Trainer

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def trained(tiny_dataset):
    ds = tiny_dataset
    cfg = Config(Model="BPR", batch_size=64, num_epoch=20, dim_E=16,
                 learning_rate=0.05, reg_weight=1e-4, patience=20)
    model = build_model(cfg, ds)
    trainer = Trainer(model, ds, cfg)
    trainer.run()
    return model, trainer.final_params, trainer.model_state, ds


@pytest.fixture(scope="module")
def artifact(trained, tmp_path_factory):
    model, params, mstate, ds = trained
    path = str(tmp_path_factory.mktemp("serve") / "bpr.npz")
    export_artifact(model, params, mstate, ds, path)
    return path


def test_recommend_matches_eval_ranklist(trained, artifact):
    """Serving top-k == the training eval ranklist (same masking, offset)."""
    from chaorec_tpu.eval.ranking import gene_ranklist

    model, params, mstate, ds = trained
    rec = Recommender.load(artifact)
    ue, ie = model.embeddings(params)
    ranklist = np.asarray(
        gene_ranklist(ue, ie, jax.numpy.asarray(ds.history.values),
                      ds.num_user, topk=10)
    )
    got = rec.recommend(list(range(ds.num_user)), k=10)
    for u in range(ds.num_user):
        np.testing.assert_array_equal(
            np.array([i for i, _ in got[u]]), ranklist[u]
        )


def test_recommend_excludes_history(trained, artifact):
    _, _, _, ds = trained
    rec = Recommender.load(artifact)
    got = rec.recommend([0, 1, 2], k=10)
    for u, recs in zip([0, 1, 2], got):
        n = int(ds.history.lengths[u])
        seen = set((ds.history.values[u, :n] + ds.num_user).tolist())
        assert not seen.intersection(i for i, _ in recs)
    # scores descending
    s = [x for _, x in got[0]]
    assert s == sorted(s, reverse=True)


def test_recommend_validates_ids(artifact):
    rec = Recommender.load(artifact)
    with pytest.raises(ValueError):
        rec.recommend([10_000_000])
    assert rec.recommend([]) == []


def test_similar_items_and_fold_in(trained, artifact):
    _, _, _, ds = trained
    rec = Recommender.load(artifact)
    sims = rec.similar_items([ds.num_user + 3], k=5)[0]
    assert len(sims) == 5
    assert all(i != ds.num_user + 3 for i, _ in sims)
    # fold-in on a history from the block-0 item group should mostly
    # recommend block-0 items (planted structure; items 0..23 = block 0)
    out = rec.fold_in([0, 1, 2, 3], k=8)
    assert all(i - ds.num_user not in (0, 1, 2, 3) for i, _ in out)
    block0 = sum(1 for i, _ in out if (i - ds.num_user) < 24)
    assert block0 >= 5


def test_score_mode_artifact(tiny_dataset, tmp_path):
    """rank_mode=='scores' models export precomputed ranklists."""
    ds = tiny_dataset
    cfg = Config(Model="MultVAE", batch_size=64, num_epoch=3, dim_E=16,
                 learning_rate=0.01, patience=3)
    model = build_model(cfg, ds)
    trainer = Trainer(model, ds, cfg)
    trainer.run()
    path = str(tmp_path / "vae.npz")
    export_artifact(model, trainer.final_params, trainer.model_state, ds,
                    path, score_topk=12)
    rec = Recommender.load(path)
    assert rec.kind == "ranklists"
    got = rec.recommend([0, 5], k=8)
    assert len(got) == 2 and len(got[0]) == 8
    # global ids within range
    for i, _ in got[0]:
        assert ds.num_user <= i < ds.num_user + ds.num_item
    with pytest.raises(ValueError):
        rec.recommend([0], k=50)  # beyond cached top-12
    with pytest.raises(ValueError):
        rec.similar_items([0])  # needs embeddings


def test_http_endpoint(artifact):
    rec = Recommender.load(artifact)
    srv = serve_http(rec, port=0)  # ephemeral port
    port = srv.server_address[1]
    try:
        health = json.load(
            urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz")
        )
        assert health["ok"] and health["model"] == "BPR"
        resp = json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/recommend?user=0,1&k=3"
        ))
        assert len(resp["results"]) == 2
        assert len(resp["results"][0]["items"]) == 3
        assert resp["results"][0]["user"] == 0
        sim = json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/similar?item=2&k=4"
        ))
        assert len(sim["results"][0]["items"]) == 4
        # bad request -> 400
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/recommend?user=999999&k=3"
            )
        assert e.value.code == 400
    finally:
        srv.shutdown()


def test_artifact_snapshot_provenance(trained, artifact, tmp_path):
    """VERDICT r2 item 10: the exported artifact records WHICH weights it
    holds (best-epoch early-stop snapshot vs final-epoch), and the
    Recommender surfaces it via info()."""
    rec = Recommender.load(artifact)
    assert rec.info()["snapshot"] == "best-epoch"  # export default

    model, params, mstate, ds = trained
    path = str(tmp_path / "bpr_final.npz")
    export_artifact(model, params, mstate, ds, path, snapshot="final-epoch")
    assert Recommender.load(path).info()["snapshot"] == "final-epoch"
