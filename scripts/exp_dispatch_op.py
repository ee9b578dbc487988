"""Primitive-level bisect of the axon degraded-dispatch trigger.

Runs ONE tiny single-op program (argv[1]) in a fresh process, then reports
whether a plain matmul's dispatch time degraded.  See exp_dispatch_bisect.py.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *a, iters=10):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    which = sys.argv[1]
    M = jnp.asarray(np.random.default_rng(0).normal(size=(64, 63, 63)),
                    jnp.float32)
    mm = jax.jit(lambda M: M @ M)
    t_before = timeit(mm, M)

    x = jnp.asarray(np.random.default_rng(1).normal(size=(256, 64)),
                    jnp.float32)
    idx = jnp.asarray(np.random.default_rng(2).integers(0, 64, (256,)),
                      jnp.int32)

    ops = {
        "sincos": lambda: jnp.sin(x) + jnp.cos(x),
        "where": lambda: jnp.where(x > 0, x, -x),
        "concat": lambda: jnp.concatenate([x, x], axis=1),
        "cumsum": lambda: jnp.cumsum(x, axis=1),
        "argsort": lambda: jnp.argsort(x, axis=1),
        "topk": lambda: jax.lax.top_k(x, 8)[0],
        "gather_rows": lambda: x[idx],
        "take_along": lambda: jnp.take_along_axis(
            x, idx[:, None], axis=1),
        "gather_2d": lambda: x[idx, idx],
        "scatter_set": lambda: x.at[idx, 0].set(1.0),
        "scatter_add": lambda: x.at[idx, 0].add(1.0),
        "dynslice": lambda: jax.lax.dynamic_slice(x, (idx[0], 0), (8, 64)),
        "dynupdate": lambda: jax.lax.dynamic_update_slice(
            x, jnp.ones((8, 64)), (idx[0], 0)),
        "scan_mm": lambda: jax.lax.scan(
            lambda c, _: (c @ c * 0.5 + c, None), x[:64, :64], None,
            length=8)[0],
        "while_loop": lambda: jax.lax.while_loop(
            lambda c: c[0] < 5.0, lambda c: (c[0] + 1.0, c[1] * 1.1),
            (jnp.asarray(0.0), x))[1],
        "cond": lambda: jax.lax.cond(idx[0] > 32, lambda: x, lambda: -x),
        "iota_bcast": lambda: jnp.arange(64)[None, :] * x,
        "reduce_max": lambda: jnp.max(x, axis=1),
        "triangular_solve": lambda: jax.scipy.linalg.solve_triangular(
            jnp.eye(64) + jnp.tril(jnp.ones((64, 64))), x.T, lower=True),
        "cholesky": lambda: jnp.linalg.cholesky(
            jnp.eye(64) * 70 + x.T @ x / 256),
        "sort_pairs": lambda: jax.lax.sort((x, x), num_keys=1)[0],
        "rsqrt": lambda: jax.lax.rsqrt(jnp.abs(x) + 1e-30),
        "clip": lambda: jnp.clip(x, -1.0, 1.0),
        "pad": lambda: jnp.pad(x, ((0, 0), (0, 64))),
        "rev": lambda: x[:, ::-1],
        "transpose": lambda: x.T @ x,
        "einsum3": lambda: jnp.einsum("bi,bj->bij", x, x),
        "eye_diag": lambda: jnp.diag(x[0]),
        "diagonal": lambda: jnp.diagonal(M, axis1=-2, axis2=-1),
        "bool_any": lambda: jnp.any(x > 0),
        "convert": lambda: x.astype(jnp.bfloat16).astype(jnp.float32),
    }
    fn = jax.jit(ops[which])
    out = fn()
    jax.block_until_ready(out)
    t_after = timeit(mm, M)
    verdict = "POISONED" if t_after > 5 * max(t_before, 0.05) else "clean"
    print(f"{which:16s} before {t_before:7.3f}  after {t_after:7.3f}"
          f"   -> {verdict}", flush=True)


if __name__ == "__main__":
    main()
