"""CPU shims that let the REFERENCE's torch code run in this environment.

The cross-framework quality oracles (VERDICT r3 item 1) run the
reference's own PyTorch models on CPU with this repo's deterministic
synthetic modality features and compare 5-10-epoch loss/metric
trajectories against our CLI. The reference environment pins CUDA torch
1.11 + PyG/faiss/sparsesvd/torchdiffeq; this image has CPU torch 2.x and
none of the native extensions, so before importing any reference module
we must install:

- **cuda no-ops**: `.cuda()` is hard-coded at many call sites
  (dataload.py:33-34, train_and_evaluate.py:149, Model/DiffMM.py:180...).
- **zero_grad(set_to_none=False)**: torch 1.11's default, flipped to
  True in torch 2.0. Load-bearing for parity: with set_to_none=False,
  Adam keeps stepping params whose grad was populated once (momentum
  drift on rebuild-gated subtrees — see train/loop.py epoch0_params).
- **torch_geometric**: MessagePassing/degree/... used by the PyG-based
  models (runtime-correct for the simple norm-message convs the target
  models use: gather x_j by source, scatter-`aggr` by target).
- **torch_sparse.spmm**, **torch_scatter.scatter_add**: thin wrappers
  over torch.sparse / index_add.
- **faiss / sparsesvd / torchdiffeq**: import-time stubs (not used by
  the oracle target models; loud failure if ever called).

These shims implement PUBLIC API semantics only — no reference code is
copied.
"""

from __future__ import annotations

import inspect
import sys
import types

import torch


# --------------------------------------------------------------- cuda
def install_cpu_patches() -> None:
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore
    torch.cuda.is_available = lambda: False  # type: ignore

    orig_zero_grad = torch.optim.Optimizer.zero_grad

    def zero_grad_torch111(self, set_to_none: bool = False):
        return orig_zero_grad(self, set_to_none=set_to_none)

    torch.optim.Optimizer.zero_grad = zero_grad_torch111  # type: ignore

    # The reference overwrites registered Parameters with computed plain
    # tensors (COHESION.py:147 vs :308/:357); torch 2.x raises. Demote
    # the slot to a plain attribute on first such assignment — the
    # optimizer keeps the original Parameter object it captured at
    # construction, matching the reference runs' effective behavior.
    orig_setattr = torch.nn.Module.__setattr__

    def lenient_setattr(self, name, value):
        params = self.__dict__.get("_parameters")
        if (params is not None and name in params
                and isinstance(value, torch.Tensor)
                and not isinstance(value, torch.nn.Parameter)):
            del params[name]
            object.__setattr__(self, name, value)
            return
        orig_setattr(self, name, value)

    torch.nn.Module.__setattr__ = lenient_setattr

    # python 3.11+ removed random.sample over sets (dataload.py:77,
    # Model/FREEDOM.py...) — restore the old behavior
    import random as _random

    orig_sample = _random.sample

    def sample_any(population, k, *a, **kw):
        if isinstance(population, (set, frozenset)):
            population = tuple(population)
        return orig_sample(population, k, *a, **kw)

    _random.sample = sample_any

    # scipy >= 1.14 removed the `.A` densify alias the reference uses
    # (dataload.py:167, Model/MMSSL.py:186 ...)
    import scipy.sparse as sp

    for cls in (sp.coo_matrix, sp.csr_matrix, sp.csc_matrix,
                sp.lil_matrix, sp.dok_matrix):
        if not hasattr(cls, "A"):
            cls.A = property(lambda self: self.toarray())

    # scipy >= 1.12 dok_matrix no longer exposes the private dict
    # `_update` the reference's get_norm_adj_mat uses
    # (Model/COHESION.py:174 and siblings)
    if not hasattr(sp.dok_matrix, "_update"):
        def _dok_update(self, data):
            for key, val in dict(data).items():
                self[key] = val
        sp.dok_matrix._update = _dok_update

    # torch 2.x removed the legacy torch.sparse.FloatTensor constructor
    if not hasattr(torch.sparse, "FloatTensor"):
        torch.sparse.FloatTensor = (  # type: ignore
            lambda indices, values, size: torch.sparse_coo_tensor(
                indices, values, tuple(size)))


# ------------------------------------------------- torch_geometric
class MessagePassing(torch.nn.Module):
    """Minimal PyG MessagePassing: flow='source_to_target', dense CPU.

    ``propagate(edge_index, **kw)`` gathers ``<name>_j`` from the source
    row (edge_index[0]) and ``<name>_i`` from the target row
    (edge_index[1]), calls ``self.message(...)`` with whatever arguments
    its signature names, scatter-aggregates by target, then calls
    ``self.update(aggr_out, ...)`` likewise.
    """

    def __init__(self, aggr: str = "add", flow: str = "source_to_target",
                 node_dim: int = 0, **kwargs):
        super().__init__()
        self.aggr = aggr or "add"
        self.flow = flow
        self.node_dim = node_dim

    def _collect(self, fn, edge_index, size, kwargs, extra):
        row, col = edge_index[0], edge_index[1]
        if self.flow == "target_to_source":
            row, col = col, row
        # PyG special argument names (GRCN's EGCNConv.message uses
        # edge_index_i / size_i, Model/GRCN.py:37-41)
        n_target = n_source = None
        if size is not None:
            n_target = size[1] if self.flow == "source_to_target" else size[0]
            n_source = size[0] if self.flow == "source_to_target" else size[1]
        elif "x" in kwargs and kwargs["x"] is not None:
            n_target = n_source = kwargs["x"].size(0)
        args = []
        params = list(inspect.signature(fn).parameters)
        for name in params:
            if name == "self":
                continue
            if name in extra:
                args.append(extra[name])
            elif name == "edge_index_i":
                args.append(col)
            elif name == "edge_index_j":
                args.append(row)
            elif name == "size_i":
                args.append(n_target)
            elif name == "size_j":
                args.append(n_source)
            elif name.endswith("_j") and name[:-2] in kwargs:
                args.append(kwargs[name[:-2]].index_select(0, row))
            elif name.endswith("_i") and name[:-2] in kwargs:
                args.append(kwargs[name[:-2]].index_select(0, col))
            elif name == "edge_index":
                args.append(edge_index)
            elif name == "size":
                # PyG passes message() the RESOLVED [N_src, N_tgt] list
                # (MGAT's message reads size[0] with a size=None call)
                args.append([n_source, n_target] if size is None else size)
            elif name in kwargs:
                args.append(kwargs[name])
            else:
                args.append(None)
        return args

    def propagate(self, edge_index, size=None, **kwargs):
        edge_index = edge_index.long()
        row, col = edge_index[0], edge_index[1]
        if self.flow == "target_to_source":
            row, col = col, row
        n_target = (size[1] if size is not None else
                    int(col.max().item()) + 1 if col.numel() else 0)
        # prefer the x tensor's row count when it is square usage
        if size is None and "x" in kwargs and kwargs["x"] is not None:
            n_target = kwargs["x"].size(0)
        msg = self.message(*self._collect(self.message, edge_index, size,
                                          kwargs, {}))
        out_shape = (n_target,) + tuple(msg.shape[1:])
        if self.aggr in ("add", "sum", "mean"):
            out = msg.new_zeros(out_shape)
            out.index_add_(0, col, msg)
            if self.aggr == "mean":
                cnt = torch.bincount(col, minlength=n_target).clamp(min=1)
                out = out / cnt.view(-1, *([1] * (msg.dim() - 1))).to(out.dtype)
        elif self.aggr == "max":
            out = msg.new_full(out_shape, float("-inf"))
            out = out.index_reduce_(0, col, msg, "amax", include_self=False)
            out = torch.where(torch.isinf(out), torch.zeros_like(out), out)
        else:
            raise NotImplementedError(self.aggr)
        return self.update(*self._collect(self.update, edge_index, size,
                                          kwargs, {"aggr_out": out}))

    def message(self, x_j):  # default
        return x_j

    def update(self, aggr_out):  # default
        return aggr_out


def degree(index, num_nodes=None, dtype=None):
    index = index.long()
    n = int(num_nodes) if num_nodes is not None else int(index.max()) + 1
    out = torch.bincount(index, minlength=n).to(dtype or torch.float32)
    return out


def remove_self_loops(edge_index, edge_attr=None):
    mask = edge_index[0] != edge_index[1]
    edge_index = edge_index[:, mask]
    if edge_attr is not None:
        edge_attr = edge_attr[mask]
    return edge_index, edge_attr


def add_self_loops(edge_index, edge_attr=None, fill_value=1.0,
                   num_nodes=None):
    n = (int(num_nodes) if num_nodes is not None
         else int(edge_index.max()) + 1)
    loops = torch.arange(n, dtype=edge_index.dtype,
                         device=edge_index.device)
    edge_index = torch.cat(
        [edge_index, torch.stack([loops, loops])], dim=1)
    if edge_attr is not None:
        fill = edge_attr.new_full((n,) + tuple(edge_attr.shape[1:]),
                                  fill_value)
        edge_attr = torch.cat([edge_attr, fill], dim=0)
    return edge_index, edge_attr


def pyg_softmax(src, index, num_nodes=None):
    n = int(num_nodes) if num_nodes is not None else int(index.max()) + 1
    index = index.long()
    amax = src.new_full((n,) + tuple(src.shape[1:]), float("-inf"))
    amax = amax.index_reduce_(0, index, src, "amax", include_self=False)
    out = (src - amax.index_select(0, index)).exp()
    denom = out.new_zeros((n,) + tuple(src.shape[1:]))
    denom.index_add_(0, index, out)
    return out / (denom.index_select(0, index) + 1e-16)


def dropout_adj(edge_index, edge_attr=None, p=0.5, training=True, **kw):
    if not training or p == 0.0:
        return edge_index, edge_attr
    mask = torch.rand(edge_index.size(1)) >= p
    edge_index = edge_index[:, mask]
    if edge_attr is not None:
        edge_attr = edge_attr[mask]
    return edge_index, edge_attr


def pyg_uniform(size, tensor):
    if tensor is not None:
        bound = 1.0 / (size ** 0.5)
        tensor.data.uniform_(-bound, bound)


class _StubGCNConv(torch.nn.Module):
    def __init__(self, *a, **k):
        super().__init__()

    def forward(self, *a, **k):
        raise NotImplementedError("torch_geometric.nn.GCNConv shim stub")


def _spmm(index, value, m, n, matrix):
    sp = torch.sparse_coo_tensor(index, value, (m, n))
    return torch.sparse.mm(sp, matrix)


def _scatter_add(src, index, dim=0, dim_size=None):
    n = int(dim_size) if dim_size is not None else int(index.max()) + 1
    shape = list(src.shape)
    shape[dim] = n
    out = src.new_zeros(shape)
    return out.index_add_(dim, index.long(), src)


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _unavailable(name):
    def fn(*a, **k):
        raise RuntimeError(f"{name} shim stub called — not implemented")
    return fn


def install_module_shims() -> None:
    tg = _stub_module("torch_geometric")
    tg_nn = _stub_module("torch_geometric.nn",
                         MessagePassing=MessagePassing,
                         GCNConv=_StubGCNConv)
    _stub_module("torch_geometric.nn.conv", MessagePassing=MessagePassing)
    _stub_module("torch_geometric.nn.inits", uniform=pyg_uniform)
    tg_utils = _stub_module(
        "torch_geometric.utils", degree=degree,
        remove_self_loops=remove_self_loops, add_self_loops=add_self_loops,
        softmax=pyg_softmax, dropout_adj=dropout_adj)
    tg.nn = tg_nn
    tg.utils = tg_utils
    def _coalesce(index, value, m, n, op="add"):
        sp = torch.sparse_coo_tensor(index, value, (m, n)).coalesce()
        return sp.indices(), sp.values()

    _stub_module("torch_sparse", spmm=_spmm, coalesce=_coalesce)
    _stub_module("torch_scatter", scatter_add=_scatter_add)

    class _FaissKmeans:
        def __init__(self, *a, **k):
            raise RuntimeError("faiss shim stub called")

    _stub_module("faiss", Kmeans=_FaissKmeans)
    _stub_module("sparsesvd", sparsesvd=_unavailable("sparsesvd"))
    _stub_module("torchdiffeq", odeint=_unavailable("torchdiffeq.odeint"))


def install_all() -> None:
    install_cpu_patches()
    install_module_shims()
