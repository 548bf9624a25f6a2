"""Native host runtime bindings (ctypes over ``libchaorec_host.so``).

The TPU owns all training compute; this module owns the host-CPU side the
reference delegated to third-party native code (scipy.sparse builders,
torch DataLoader workers, the O(U^2) Python user-graph precompute —
SURVEY.md §2.2). Every entry point has a pure-numpy fallback with identical
semantics, so the framework runs (slower) where no C++ toolchain exists;
``tests/test_native.py`` pins native == fallback.

Lazy build: the .so is compiled from ``src/chaorec_host.cc`` with g++ on
first use and cached next to the source; rebuilt when the source is newer
or the ABI tag changes.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_ABI_VERSION = 3
_SRC = Path(__file__).parent / "src" / "chaorec_host.cc"
_SO = Path(__file__).parent / "libchaorec_host.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
        "-o", str(_SO), str(_SRC), "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logging.warning("chaorec_host native build failed (%s); numpy fallbacks in use", e)
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.ch_abi_version.restype = ctypes.c_int32
    lib.ch_build_adj.restype = ctypes.c_int32
    lib.ch_build_adj.argtypes = [
        _i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
        _i32p, _i32p, _f32p, _f32p, _f32p,
    ]
    lib.ch_fill_dense.restype = None
    lib.ch_fill_dense.argtypes = [
        _i32p, ctypes.c_int64, _i32p, _f32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, _f32p,
    ]
    lib.ch_pad_ragged.restype = None
    lib.ch_pad_ragged.argtypes = [
        _i64p, _i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, _i32p, _i32p,
    ]
    lib.ch_uu_topk.restype = None
    lib.ch_uu_topk.argtypes = [
        _i64p, _i32p, _i64p, _i32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, _i32p, _f32p,
    ]
    lib.ch_sample_negatives.restype = None
    lib.ch_sample_negatives.argtypes = [
        _i64p, _i32p, _i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_uint64,
        ctypes.c_int32, ctypes.c_int32, _i32p,
    ]
    return lib


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("CHAOREC_DISABLE_NATIVE"):
            return None
        stale = (not _SO.exists()) or (
            _SRC.exists() and _SRC.stat().st_mtime > _SO.stat().st_mtime
        )
        if stale and not _build():
            return None
        try:
            lib = _bind(ctypes.CDLL(str(_SO)))
            if lib.ch_abi_version() != _ABI_VERSION:
                if not _build():
                    return None
                # dlopen on the same path returns the STALE mapped handle
                # (ctypes never dlcloses); re-verify the ABI and fall back
                # to the numpy paths rather than risk calling through
                # mismatched signatures.
                lib = _bind(ctypes.CDLL(str(_SO)))
                if lib.ch_abi_version() != _ABI_VERSION:
                    logging.warning(
                        "chaorec_host ABI still stale after rebuild "
                        "(old handle mapped); using numpy fallbacks"
                    )
                    return None
            _lib = lib
        except OSError as e:
            logging.warning("chaorec_host load failed (%s)", e)
        return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# build_adj: degrees, per-edge sym-norm weights, by-user/by-item stable orders.


def build_adj(
    edges: np.ndarray, num_user: int, num_item: int, eps: float = 1e-7
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (du, di, w, order_u, order_i). Matches the numpy fallback
    bit-for-bit (same fp32 expression, same stable order)."""
    edges = np.ascontiguousarray(edges, dtype=np.int32)
    e = edges.shape[0]
    lib = _load()
    if lib is not None:
        du = np.empty(num_user, np.float32)
        di = np.empty(num_item, np.float32)
        w = np.empty(e, np.float32)
        order_u = np.empty(e, np.int32)
        order_i = np.empty(e, np.int32)
        rc = lib.ch_build_adj(edges, e, num_user, num_item, np.float32(eps),
                              order_u, order_i, du, di, w)
        if rc != 0:
            raise ValueError("edge ids out of range for (num_user, num_item)")
        return du, di, w, order_u, order_i
    du = np.bincount(edges[:, 0], minlength=num_user).astype(np.float32)
    di = np.bincount(edges[:, 1], minlength=num_item).astype(np.float32)
    w = (
        1.0
        / np.sqrt(
            (du[edges[:, 0]] + np.float32(eps)) * (di[edges[:, 1]] + np.float32(eps))
        )
    ).astype(np.float32)
    order_u = np.argsort(edges[:, 0], kind="stable").astype(np.int32)
    order_i = np.argsort(edges[:, 1], kind="stable").astype(np.int32)
    return du, di, w, order_u, order_i


def fill_dense(
    edges: np.ndarray,
    order_u: np.ndarray,
    w: np.ndarray,
    num_user: int,
    num_item: int,
    n_threads: int = 0,
) -> np.ndarray:
    """Dense (U, I) scatter-add of edge weights (duplicate edges add)."""
    edges = np.ascontiguousarray(edges, dtype=np.int32)
    lib = _load()
    if lib is not None:
        r = np.empty((num_user, num_item), np.float32)
        lib.ch_fill_dense(
            edges, edges.shape[0], np.ascontiguousarray(order_u, np.int32),
            np.ascontiguousarray(w, np.float32), num_user, num_item,
            n_threads, r,
        )
        return r
    r = np.zeros((num_user, num_item), dtype=np.float32)
    np.add.at(r, (edges[:, 0], edges[:, 1]), w)
    return r


def pad_ragged(
    indptr: np.ndarray,
    values: np.ndarray,
    width: int,
    fill: int,
    sort_rows: bool = False,
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """CSR -> (N, width) padded int32 + (N,) lengths; truncates long rows."""
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    values = np.ascontiguousarray(values, dtype=np.int32)
    n = indptr.shape[0] - 1
    lib = _load()
    if lib is not None:
        out = np.empty((n, width), np.int32)
        lens = np.empty(n, np.int32)
        lib.ch_pad_ragged(indptr, values, n, width, fill, int(sort_rows),
                          n_threads, out, lens)
        return out, lens
    out = np.full((n, width), fill, dtype=np.int32)
    lens = np.minimum(np.diff(indptr), width).astype(np.int32)
    for r in range(n):
        row = values[indptr[r] : indptr[r] + lens[r]]
        out[r, : lens[r]] = np.sort(row) if sort_rows else row
    return out, lens


def uu_topk(
    user_indptr: np.ndarray,
    user_items: np.ndarray,
    item_indptr: np.ndarray,
    item_users: np.ndarray,
    num_user: int,
    k: int,
    weighted: bool = True,
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k co-interacting users per user (DualGNN precompute,
    dualgnn-gen-u-u-matrix.py:20-107). ids padded with -1, weights with 0.
    weighted=True scores by Jaccard co/(du+dv-co), else raw counts."""
    user_indptr = np.ascontiguousarray(user_indptr, np.int64)
    user_items = np.ascontiguousarray(user_items, np.int32)
    item_indptr = np.ascontiguousarray(item_indptr, np.int64)
    item_users = np.ascontiguousarray(item_users, np.int32)
    lib = _load()
    if lib is not None:
        ids = np.empty((num_user, k), np.int32)
        w = np.empty((num_user, k), np.float32)
        lib.ch_uu_topk(user_indptr, user_items, item_indptr, item_users,
                       num_user, k, int(weighted), n_threads, ids, w)
        return ids, w
    ids = np.full((num_user, k), -1, np.int32)
    w = np.zeros((num_user, k), np.float32)
    du = np.diff(user_indptr).astype(np.float32)
    for u in range(num_user):
        acc: dict = {}
        for item in user_items[user_indptr[u] : user_indptr[u + 1]]:
            for v in item_users[item_indptr[item] : item_indptr[item + 1]]:
                acc[v] = acc.get(v, 0.0) + 1.0
        acc.pop(u, None)
        if not acc:
            continue
        cand = np.fromiter(acc.keys(), np.int32, len(acc))
        co = np.fromiter(acc.values(), np.float32, len(acc))
        score = co / (du[u] + du[cand] - co) if weighted else co
        # sort by (-score, id) to match the C++ deterministic tie-break
        order = np.lexsort((cand, -score))[:k]
        ids[u, : len(order)] = cand[order]
        w[u, : len(order)] = score[order]
    return ids, w


def sample_negatives(
    indptr: np.ndarray,
    sorted_items: np.ndarray,
    users: np.ndarray,
    num_item: int,
    seed: int,
    max_tries: int = 64,
    n_threads: int = 0,
) -> np.ndarray:
    """Host BPR negative sampling (splitmix64 streams; rejection against the
    sorted per-user history, dataload.py:76-79 semantics)."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    sorted_items = np.ascontiguousarray(sorted_items, np.int32)
    users = np.ascontiguousarray(users, np.int32)
    n = users.shape[0]
    lib = _load()
    if lib is not None:
        out = np.empty(n, np.int32)
        lib.ch_sample_negatives(indptr, sorted_items, users, n, num_item,
                                np.uint64(seed), max_tries, n_threads, out)
        return out
    out = np.empty(n, np.int32)
    GOLD = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        for s in range(n):
            x = np.uint64(seed) + GOLD * np.uint64(s + 1)
            u = users[s]
            hist = sorted_items[indptr[u] : indptr[u + 1]]
            cand = np.int32(0)
            for _ in range(max_tries):
                x = x + GOLD
                z = x
                z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                z = z ^ (z >> np.uint64(31))
                cand = np.int32(z % np.uint64(num_item))
                j = np.searchsorted(hist, cand)
                if not (j < len(hist) and hist[j] == cand):
                    break
            out[s] = cand
    return out
