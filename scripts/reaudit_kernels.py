"""r5 re-audit of every Pallas kernel under fetch-synced methodology.

VERDICT r4 weak #2: `block_until_ready` does not block through the
device tunnel, so any round-1..3 "validated on-chip" artifact that
timed or checked kernels without a real host value fetch is suspect.
This script re-validates each kernel's PARITY (max-abs error vs an
fp32-forced XLA oracle, fetched to host) and re-times it with the
delta method (dispatch k and 3k iterations, each ended by a scalar
fetch, report (t3k - tk)/2k — tunnel RTT and fetch cost cancel).

Covers: pallas_attn.fused_mha, pallas_lse.streaming_logsumexp,
pallas_row_adam.fused_row_adam, pallas_scan.chunked_cumsum.

Writes the one-table artifact parity_logs/kernel_reaudit_r5.txt.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

LINES = []


def say(s):
    print(s, flush=True)
    LINES.append(s)


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def delta_ms(fn, *args, iters=10):
    out = fn(*args)
    fetch(out)

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        fetch(o)
        return time.perf_counter() - t0

    t1 = run(iters)
    t3 = run(3 * iters)
    return (t3 - t1) / (2 * iters) * 1e3


def maxerr(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float64)
                               - np.asarray(b, np.float64))))


def audit_attn():
    from chaorec_tpu.ops.pallas_attn import fused_mha, mha_reference

    b, h, l, dh = 64, 4, 1034, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, l, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, l, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, l, dh), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)

    with jax.default_matmul_precision("float32"):
        oracle = jax.jit(lambda q, k, v: mha_reference(q, k, v))(q, k, v)
    fused = jax.jit(lambda q, k, v, s: fused_mha(q, k, v, s, 1.0))(
        q, k, v, seed)
    xla = jax.jit(lambda q, k, v: mha_reference(q, k, v))(q, k, v)
    e_fused = maxerr(fused, oracle)
    e_xla = maxerr(xla, oracle)
    ok = e_fused <= max(10 * e_xla, 1e-6)
    say(f"attn fwd       | err(fused)={e_fused:.2e} err(xla)={e_xla:.2e} "
        f"| {'OK' if ok else 'FAIL'}")

    def g_fused(q, k, v, s):
        return jax.grad(lambda q: jnp.sum(fused_mha(q, k, v, s, 1.0)))(q)

    def g_ref(q, k, v):
        return jax.grad(lambda q: jnp.sum(mha_reference(q, k, v)))(q)

    with jax.default_matmul_precision("float32"):
        go = jax.jit(g_ref)(q, k, v)
    gf = jax.jit(g_fused)(q, k, v, seed)
    gx = jax.jit(g_ref)(q, k, v)
    e_gf, e_gx = maxerr(gf, go), maxerr(gx, go)
    ok_g = e_gf <= max(10 * e_gx, 1e-6)
    say(f"attn grad dq   | err(fused)={e_gf:.2e} err(xla)={e_gx:.2e} "
        f"| {'OK' if ok_g else 'FAIL'}")

    t_f = delta_ms(jax.jit(lambda q, k, v, s: fused_mha(q, k, v, s, 1.0)),
                   q, k, v, seed)
    t_x = delta_ms(jax.jit(lambda q, k, v: mha_reference(q, k, v)), q, k, v)
    say(f"attn fwd time  | fused={t_f:.3f} ms xla={t_x:.3f} ms "
        f"({t_x / max(t_f, 1e-9):.2f}x)")
    tg_f = delta_ms(jax.jit(g_fused), q, k, v, seed)
    tg_x = delta_ms(jax.jit(g_ref), q, k, v)
    say(f"attn f+b time  | fused={tg_f:.3f} ms xla={tg_x:.3f} ms "
        f"({tg_x / max(tg_f, 1e-9):.2f}x)")
    return ok and ok_g


def audit_lse():
    from chaorec_tpu.ops.pallas_lse import streaming_logsumexp

    b, n, d = 1024, 12351, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    q = jax.random.normal(ks[0], (b, d), jnp.float32)
    k = jax.random.normal(ks[1], (n, d), jnp.float32)

    def xla_lse(q, k):
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        return jax.scipy.special.logsumexp(logits, axis=1)

    with jax.default_matmul_precision("float32"):
        oracle = jax.jit(xla_lse)(q, k)
    got = jax.jit(lambda q, k: streaming_logsumexp(q, k))(q, k)
    xla = jax.jit(xla_lse)(q, k)
    e_p, e_x = maxerr(got, oracle), maxerr(xla, oracle)
    ok = e_p <= max(10 * e_x, 1e-5)
    say(f"lse fwd        | err(pallas)={e_p:.2e} err(xla)={e_x:.2e} "
        f"| {'OK' if ok else 'FAIL'}")

    def g_p(q, k):
        return jax.grad(lambda q: jnp.sum(streaming_logsumexp(q, k)))(q)

    def g_x(q, k):
        return jax.grad(lambda q: jnp.sum(xla_lse(q, k)))(q)

    with jax.default_matmul_precision("float32"):
        go = jax.jit(g_x)(q, k)
    e_gp, e_gx = maxerr(jax.jit(g_p)(q, k), go), maxerr(jax.jit(g_x)(q, k), go)
    ok_g = e_gp <= max(10 * e_gx, 1e-5)
    say(f"lse grad dq    | err(pallas)={e_gp:.2e} err(xla)={e_gx:.2e} "
        f"| {'OK' if ok_g else 'FAIL'}")
    t_p = delta_ms(jax.jit(lambda q, k: streaming_logsumexp(q, k)), q, k)
    t_x = delta_ms(jax.jit(xla_lse), q, k)
    say(f"lse fwd time   | pallas={t_p:.3f} ms xla={t_x:.3f} ms "
        f"({t_x / max(t_p, 1e-9):.2f}x)")
    return ok and ok_g


def audit_row_adam():
    from chaorec_tpu.ops.pallas_row_adam import (fused_row_adam,
                                                 prepare_sorted_rows)

    # production shape class: FREEDOM t_feat is (I, 384); the kernel
    # requires D % 128 == 0 (Mosaic lane tiling — narrower tables route
    # to the XLA path, see ops/indexed_adam.table_adam_update)
    n, d, b = 12351, 384, 1024
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    p = jax.random.normal(ks[0], (n, d), jnp.float32)
    m = jax.random.normal(ks[1], (n, d), jnp.float32) * 0.01
    v = jnp.abs(jax.random.normal(ks[2], (n, d), jnp.float32)) * 0.01
    rows = jax.random.randint(ks[3], (b,), 0, n)
    g = jax.random.normal(ks[4], (b, d), jnp.float32)
    lr, b1, b2, eps, t = 1e-3, 0.9, 0.999, 1e-8, 3

    def xla_ref(p, m, v, rows, g):
        # DENSE zero-grad Adam semantics (torch-1.11: every row decays
        # and steps every step) — the contract of row_adam_update and
        # the kernel, pinned vs optax in tests/test_indexed_adam.py.
        # The first r5 reaudit wrongly froze untouched rows here and
        # reported a false FAIL (err(p)=0.107 is the zero-grad step on
        # rows with tiny v, not a kernel defect).
        gd = jnp.zeros_like(p).at[rows].add(g)
        m2 = b1 * m + (1 - b1) * gd
        v2 = b2 * v + (1 - b2) * gd * gd
        mh = m2 / (1 - b1 ** t)
        vh = v2 / (1 - b2 ** t)
        p2 = p - lr * mh / (jnp.sqrt(vh) + eps)
        return p2, m2, v2

    want = jax.jit(xla_ref)(p, m, v, rows, g)

    def ours(p, m, v, rows, g):
        srows, sg = prepare_sorted_rows(rows, g, n)
        return fused_row_adam(p, m, v, srows, sg, jnp.int32(t),
                              lr, b1, b2, eps)

    got = jax.jit(ours)(p, m, v, rows, g)
    errs = [maxerr(a, b) for a, b in zip(got, want)]
    ok = all(e < 1e-5 for e in errs)
    say(f"row_adam       | err(p,m,v)=({errs[0]:.2e},{errs[1]:.2e},"
        f"{errs[2]:.2e}) | {'OK' if ok else 'FAIL'}")
    t_p = delta_ms(jax.jit(ours), p, m, v, rows, g)
    t_x = delta_ms(jax.jit(xla_ref), p, m, v, rows, g)
    say(f"row_adam time  | pallas={t_p:.3f} ms xla={t_x:.3f} ms "
        f"({t_x / max(t_p, 1e-9):.2f}x)")
    return ok


def audit_scan():
    from chaorec_tpu.ops.pallas_scan import chunked_cumsum

    m, d = 186826, 64
    x = jax.random.normal(jax.random.PRNGKey(3), (m, d), jnp.float32)
    want = jax.jit(lambda x: jnp.cumsum(x, axis=0))(x)
    got = jax.jit(lambda x: chunked_cumsum(x))(x)
    # fp32 prefix over 187k rows: absolute error scales with the running
    # total (~sqrt(M) * sigma ~ 430); 1e-2 abs is the precision class.
    e = maxerr(got, want)
    ok = e < 5e-2
    say(f"scan cumsum    | err={e:.2e} (fp32 prefix class) "
        f"| {'OK' if ok else 'FAIL'}")
    t_p = delta_ms(jax.jit(lambda x: chunked_cumsum(x)), x, iters=30)
    t_x = delta_ms(jax.jit(lambda x: jnp.cumsum(x, axis=0)), x, iters=30)
    say(f"scan time      | pallas={t_p:.3f} ms xla={t_x:.3f} ms "
        f"({t_x / max(t_p, 1e-9):.2f}x)")
    return ok


def main():
    say("# Pallas kernel re-audit (r5): fetch-synced parity + delta "
        "timing")
    say(f"# backend={jax.default_backend()} "
        f"device={jax.devices()[0].device_kind}")
    results = {}
    for name, fn in [("attn", audit_attn), ("lse", audit_lse),
                     ("row_adam", audit_row_adam), ("scan", audit_scan)]:
        try:
            results[name] = fn()
        except Exception as exc:  # noqa: BLE001 — record, keep auditing
            say(f"{name} ERROR: {exc!r}")
            results[name] = False
    say(f"# summary: {results}")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "parity_logs", "kernel_reaudit_r5.txt")
    with open(out, "w") as fh:
        fh.write("\n".join(LINES) + "\n")
    if not all(results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
