"""Numerical oracles against torch / scipy for tricky reimplementations."""

import jax
import jax.numpy as jnp
import numpy as np


def test_cf_diff_attention_matches_torch_mha():
    """CF_Diff._attention == torch.nn.MultiheadAttention(batch_first)
    with the same packed in_proj / out_proj weights (no dropout)."""
    import torch

    from chaorec_tpu.models.cf_diff import CF_Diff

    rs = np.random.default_rng(0)
    b, l, e, h = 3, 12, 16, 4
    q_in = rs.standard_normal((b, l, e)).astype(np.float32)
    kv_in = rs.standard_normal((b, l, e)).astype(np.float32)

    m = CF_Diff(8, 6, jnp.zeros((8, 6)), 0.001, 0.005, 0.005, 5)
    params = m.init_params(jax.random.PRNGKey(0))

    out_jax = np.asarray(m._attention(
        params, 0, jnp.asarray(q_in), jnp.asarray(kv_in)))

    mha = torch.nn.MultiheadAttention(e, h, dropout=0.0, batch_first=True)
    with torch.no_grad():
        mha.in_proj_weight.copy_(
            torch.tensor(np.asarray(params["attn_in_w0"])))
        mha.in_proj_bias.copy_(
            torch.tensor(np.asarray(params["attn_in_b0"])))
        mha.out_proj.weight.copy_(
            torch.tensor(np.asarray(params["attn_out_w0"])))
        mha.out_proj.bias.copy_(
            torch.tensor(np.asarray(params["attn_out_b0"])))
        out_t, _ = mha(torch.tensor(q_in), torch.tensor(kv_in),
                       torch.tensor(kv_in))
    np.testing.assert_allclose(out_jax, out_t.numpy(), rtol=2e-4, atol=2e-5)


def test_diffmm_modal_adj_matches_scipy_oracle():
    """build_modal_adj (keep=1, no dropout) reproduces buildUIMatrix:
    binarized block adjacency + I, sym-normalized (Model/DiffMM.py:158-180),
    checked by propagating random embeddings through both."""
    import scipy.sparse as sp

    from chaorec_tpu.models.diffmm import build_modal_adj, modal_prop

    rs = np.random.default_rng(1)
    num_user, num_item, k, e = 9, 7, 2, 5
    topk = np.stack([rs.choice(num_item, size=k, replace=False)
                     for _ in range(num_user)])

    adj = build_modal_adj(jnp.asarray(topk, jnp.int32), num_item,
                          keep_rate=1.0, rng=jax.random.PRNGKey(0))
    xu = rs.standard_normal((num_user, e)).astype(np.float32)
    xi = rs.standard_normal((num_item, e)).astype(np.float32)
    new_u, new_i = modal_prop(adj, jnp.asarray(xu), jnp.asarray(xi))

    # scipy oracle: reference buildUIMatrix + normalizeAdj
    n = num_user + num_item
    rows = np.repeat(np.arange(num_user), k)
    cols = topk.reshape(-1) + num_user
    mat = sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    mat = mat + mat.T
    mat = (mat != 0) * 1.0
    mat = mat + sp.eye(n)
    deg = np.array(mat.sum(axis=-1)).reshape(-1)
    dinv = np.where(deg > 0, deg ** -0.5, 0.0)
    norm = sp.diags(dinv) @ sp.csr_matrix(mat) @ sp.diags(dinv)
    ref = norm @ np.concatenate([xu, xi], axis=0)

    np.testing.assert_allclose(np.asarray(new_u), ref[:num_user],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_i), ref[num_user:],
                               rtol=1e-5, atol=1e-5)


def test_lightgt_layernorm_matches_torch():
    """The hand-rolled LayerNorm in LightGT._encoder matches torch's
    nn.LayerNorm(eps=1e-5) semantics."""
    import torch

    rs = np.random.default_rng(2)
    x = rs.standard_normal((4, 9, 16)).astype(np.float32)
    w = rs.standard_normal(16).astype(np.float32)
    b = rs.standard_normal(16).astype(np.float32)

    xa = jnp.asarray(x)
    mean = jnp.mean(xa, axis=-1, keepdims=True)
    var = jnp.var(xa, axis=-1, keepdims=True)
    out = (xa - mean) * jax.lax.rsqrt(var + 1e-5)
    out = out * jnp.asarray(w) + jnp.asarray(b)

    ln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        ln.weight.copy_(torch.tensor(w))
        ln.bias.copy_(torch.tensor(b))
        ref = ln(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
