"""Serving path: artifact export + on-device recommender + HTTP endpoint.

The reference has **no serving path at all** (SURVEY.md §5: no weight
saving, no inference entry point — a trained model dies with its process).
This module is the capability add that makes training output deployable:

- ``export_artifact``: snapshot a trained model into a self-contained
  ``.npz`` — either the final (post-propagation) embedding tables for
  dot-product models, or precomputed top-K ranklists for score-mode models
  (VAE/diffusion decoders). The artifact needs no model code to serve.
- ``Recommender``: loads an artifact onto the accelerator; jit-compiled
  fixed-shape query paths (pad-to-chunk, so one compilation serves any
  request size): ``recommend`` (history-masked top-k), ``similar_items``
  (item-item cosine), ``fold_in`` (cold users scored from a raw item
  history, no retraining).
- ``serve_http``: a stdlib ThreadingHTTPServer JSON API (/healthz,
  /recommend, /similar) — zero extra dependencies.

Returned item ids are **global** (0-based item id + num_user), matching the
reference's ranklist convention (Model/BPR.py:81-83).
"""

from __future__ import annotations

import json
import logging
import threading
from functools import partial
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Sequence, Tuple
from urllib.parse import parse_qs, urlparse

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1
_QUERY_CHUNK = 256  # fixed-shape query batch: one compile serves all sizes


# ---------------------------------------------------------------------------
# Export


def export_artifact(
    model,
    params,
    model_state,
    dataset,
    path: str,
    score_topk: int = 200,
    eval_user_chunk: int = 4096,
    snapshot: str = "best-epoch",
) -> str:
    """Write a self-contained serving artifact for a trained model.

    ``kind="embeddings"``: final user/item tables from ``model.embeddings``
    (the full propagated embeddings, so serving needs no graph).
    ``kind="ranklists"``: for rank_mode=="scores" models, per-user top-K
    global item ids + scores, computed chunk-wise on device with the
    model's own masking semantics.
    """
    common = dict(
        format_version=FORMAT_VERSION,
        model=model.name,
        snapshot=snapshot,  # which weights: "best-epoch" or "final-epoch"
        dataset=dataset.name,
        num_user=dataset.num_user,
        num_item=dataset.num_item,
        history_values=dataset.history.values,
        history_lengths=dataset.history.lengths,
    )
    if model.rank_mode == "embeddings":
        if model.stateful:
            ue, ie = model.embeddings_stateful(params, model_state)
        else:
            ue, ie = model.embeddings(params)
        np.savez_compressed(
            path, kind="embeddings",
            user_emb=np.asarray(ue, np.float32),
            item_emb=np.asarray(ie, np.float32),
            **common,
        )
    else:
        from chaorec_tpu.eval.ranking import mask_and_topk

        topk = min(score_topk, dataset.num_item)
        mask_value = float(getattr(model, "mask_value", 1e-6))
        hist = jnp.asarray(dataset.history.values)
        ids_out, scores_out = [], []
        score_fn = (
            (lambda ids: model.score_users_stateful(params, model_state, ids))
            if model.stateful and hasattr(model, "score_users_stateful")
            else (lambda ids: model.score_users(params, ids))
        )
        for start in range(0, dataset.num_user, eval_user_chunk):
            end = min(start + eval_user_chunk, dataset.num_user)
            ids = jnp.arange(start, end, dtype=jnp.int32)
            scores = score_fn(ids)
            rows = jnp.broadcast_to(
                jnp.arange(end - start, dtype=jnp.int32)[:, None],
                hist[start:end].shape,
            )
            masked = scores.at[rows, hist[start:end]].set(
                mask_value, mode="drop"
            )
            v, i = jax.lax.top_k(masked, topk)
            ids_out.append(np.asarray(i, np.int32) + dataset.num_user)
            scores_out.append(np.asarray(v, np.float32))
        np.savez_compressed(
            path, kind="ranklists",
            rank_ids=np.concatenate(ids_out, 0),
            rank_scores=np.concatenate(scores_out, 0),
            **common,
        )
    logging.info("serving artifact written to %s", path)
    return path


# ---------------------------------------------------------------------------
# Query-side jitted kernels (fixed shapes: pad requests to _QUERY_CHUNK)


@partial(jax.jit, static_argnames=("k",))
def _topk_users(user_emb_rows, item_emb, hist_rows, k: int):
    scores = jnp.dot(
        user_emb_rows.astype(jnp.bfloat16),
        item_emb.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
    rows = jnp.broadcast_to(
        jnp.arange(hist_rows.shape[0], dtype=jnp.int32)[:, None],
        hist_rows.shape,
    )
    scores = scores.at[rows, hist_rows].set(-jnp.inf, mode="drop")
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx


@partial(jax.jit, static_argnames=("k",))
def _topk_similar(item_rows, item_emb, self_ids, k: int):
    a = item_rows / (jnp.linalg.norm(item_rows, axis=1, keepdims=True) + 1e-12)
    b = item_emb / (jnp.linalg.norm(item_emb, axis=1, keepdims=True) + 1e-12)
    sims = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    sims = sims.at[
        jnp.arange(self_ids.shape[0], dtype=jnp.int32), self_ids
    ].set(-jnp.inf, mode="drop")
    return jax.lax.top_k(sims, k)


class Recommender:
    """Device-resident serving handle over an exported artifact."""

    def __init__(self, data: Dict[str, np.ndarray]):
        fv = int(data["format_version"])
        if fv > FORMAT_VERSION:
            raise ValueError(f"artifact format {fv} newer than supported")
        self.kind = str(data["kind"])
        self.model_name = str(data["model"])
        # weight provenance: "best-epoch" (early-stop snapshot) or
        # "final-epoch" (trainer kept no best snapshot); pre-provenance
        # artifacts report "unknown"
        self.snapshot = str(data["snapshot"]) if "snapshot" in data else "unknown"
        self.dataset_name = str(data["dataset"])
        self.num_user = int(data["num_user"])
        self.num_item = int(data["num_item"])
        self.history = jnp.asarray(data["history_values"])
        if self.kind == "embeddings":
            self.user_emb = jnp.asarray(data["user_emb"])
            self.item_emb = jnp.asarray(data["item_emb"])
        elif self.kind == "ranklists":
            self.rank_ids = np.asarray(data["rank_ids"])
            self.rank_scores = np.asarray(data["rank_scores"])
        else:
            raise ValueError(f"unknown artifact kind {self.kind!r}")

    @classmethod
    def load(cls, path: str) -> "Recommender":
        with np.load(path, allow_pickle=False) as z:
            return cls({k: z[k] for k in z.files})

    # -- queries ----------------------------------------------------------
    def recommend(
        self, user_ids: Sequence[int], k: int = 10, exclude_seen: bool = True
    ) -> List[List[Tuple[int, float]]]:
        """Top-k (global_item_id, score) per user."""
        users = np.asarray(user_ids, np.int32)
        if users.size == 0:
            return []
        if users.min() < 0 or users.max() >= self.num_user:
            raise ValueError("user id out of range")
        k = min(k, self.num_item)
        if self.kind == "ranklists":
            if k > self.rank_ids.shape[1]:
                raise ValueError(
                    f"artifact caches top-{self.rank_ids.shape[1]} only"
                )
            return [
                list(zip(self.rank_ids[u, :k].tolist(),
                         self.rank_scores[u, :k].tolist()))
                for u in users
            ]
        out: List[List[Tuple[int, float]]] = []
        for start in range(0, users.size, _QUERY_CHUNK):
            chunk = users[start : start + _QUERY_CHUNK]
            n = chunk.size
            padded = np.zeros(_QUERY_CHUNK, np.int32)
            padded[:n] = chunk
            hist = (
                self.history[padded]
                if exclude_seen
                else jnp.full((_QUERY_CHUNK, 1), self.num_item, jnp.int32)
            )
            vals, idx = _topk_users(
                self.user_emb[padded], self.item_emb, hist, k
            )
            vals = np.asarray(vals[:n])
            idx = np.asarray(idx[:n]) + self.num_user
            out.extend(
                list(zip(idx[r].tolist(), vals[r].tolist())) for r in range(n)
            )
        return out

    def similar_items(
        self, item_ids: Sequence[int], k: int = 10
    ) -> List[List[Tuple[int, float]]]:
        """Top-k cosine-similar items. Accepts global OR 0-based item ids
        (global ids are detected by range); returns global ids."""
        if self.kind != "embeddings":
            raise ValueError("similar_items needs an embeddings artifact")
        ids = np.asarray(item_ids, np.int64)
        if ids.size == 0:
            return []
        if ids.min() >= self.num_user:  # global ids
            ids = ids - self.num_user
        if ids.min() < 0 or ids.max() >= self.num_item:
            raise ValueError("item id out of range")
        k = min(k, self.num_item - 1)
        out: List[List[Tuple[int, float]]] = []
        for start in range(0, ids.size, _QUERY_CHUNK):
            chunk = ids[start : start + _QUERY_CHUNK].astype(np.int32)
            n = chunk.size
            padded = np.zeros(_QUERY_CHUNK, np.int32)
            padded[:n] = chunk
            vals, idx = _topk_similar(
                self.item_emb[padded], self.item_emb, jnp.asarray(padded), k
            )
            vals = np.asarray(vals[:n])
            idx = np.asarray(idx[:n]) + self.num_user
            out.extend(
                list(zip(idx[r].tolist(), vals[r].tolist())) for r in range(n)
            )
        return out

    def fold_in(
        self, history_items: Sequence[int], k: int = 10
    ) -> List[Tuple[int, float]]:
        """Cold-start user: score from a raw item history without
        retraining — the user vector is the mean of the history's item
        embeddings (the fold-in standard for dot-product CF; the final
        tables already carry the graph propagation)."""
        if self.kind != "embeddings":
            raise ValueError("fold_in needs an embeddings artifact")
        ids = np.asarray(history_items, np.int64)
        if ids.size == 0:
            raise ValueError("history must be non-empty")
        if ids.min() >= self.num_user:
            ids = ids - self.num_user
        if ids.min() < 0 or ids.max() >= self.num_item:
            raise ValueError("item id out of range")
        u = jnp.mean(self.item_emb[np.asarray(ids, np.int32)], axis=0)
        scores = jnp.dot(self.item_emb, u, preferred_element_type=jnp.float32)
        scores = scores.at[np.asarray(ids, np.int32)].set(-jnp.inf)
        vals, idx = jax.lax.top_k(scores, min(k, self.num_item))
        idx = np.asarray(idx) + self.num_user
        return list(zip(idx.tolist(), np.asarray(vals).tolist()))

    def info(self) -> Dict:
        return {
            "kind": self.kind,
            "model": self.model_name,
            "snapshot": self.snapshot,
            "dataset": self.dataset_name,
            "num_user": self.num_user,
            "num_item": self.num_item,
        }


# ---------------------------------------------------------------------------
# HTTP endpoint (stdlib only)


def _make_handler(rec: Recommender):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            logging.debug("http: " + fmt, *args)

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API)
            try:
                url = urlparse(self.path)
                q = parse_qs(url.query)
                if url.path == "/healthz":
                    return self._json(200, {"ok": True, **rec.info()})
                k = int(q.get("k", ["10"])[0])
                if url.path == "/recommend":
                    users = [int(x) for x in q["user"][0].split(",")]
                    exclude = q.get("exclude_seen", ["1"])[0] != "0"
                    recs = rec.recommend(users, k=k, exclude_seen=exclude)
                    return self._json(200, {
                        "results": [
                            {"user": u,
                             "items": [{"item": i, "score": s} for i, s in r]}
                            for u, r in zip(users, recs)
                        ]
                    })
                if url.path == "/similar":
                    items = [int(x) for x in q["item"][0].split(",")]
                    sims = rec.similar_items(items, k=k)
                    return self._json(200, {
                        "results": [
                            {"item": it,
                             "items": [{"item": i, "score": s} for i, s in r]}
                            for it, r in zip(items, sims)
                        ]
                    })
                return self._json(404, {"error": "unknown path"})
            except (KeyError, ValueError) as e:
                return self._json(400, {"error": str(e)})

    return Handler


def serve_http(
    rec: Recommender, port: int = 8080, host: str = "127.0.0.1"
) -> ThreadingHTTPServer:
    """Start the JSON API in a daemon thread; returns the server (call
    ``.shutdown()`` to stop). Endpoints: /healthz, /recommend?user=1,2&k=10,
    /similar?item=17&k=10."""
    server = ThreadingHTTPServer((host, port), _make_handler(rec))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    logging.info("serving %s on http://%s:%d", rec.model_name, host, port)
    return server


def main(argv: Optional[List[str]] = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description="Serve a chaorec_tpu artifact.")
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    rec = Recommender.load(args.artifact)
    server = serve_http(rec, port=args.port, host=args.host)
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
