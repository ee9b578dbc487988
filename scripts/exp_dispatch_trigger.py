"""Map the exact trigger conditions of the axon degraded-dispatch mode.

One candidate per fresh process (argv[1]); prints matmul dispatch time
before/after running the candidate once.
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
    x = jnp.asarray(np.random.default_rng(1).normal(size=(256, 64)),
                    jnp.float32)
    idx_np = np.random.default_rng(2).integers(0, 64, (256,))
    idx = jnp.asarray(idx_np, jnp.int32)
    perm = jnp.asarray(np.random.default_rng(3).permutation(63), jnp.int32)
    mm = jax.jit(lambda M: M @ M)
    t_before = timeit(mm, M)

    if which == "gather_const_idx":
        f = jax.jit(lambda x: x[idx])              # idx closed over
        out = f(x)
    elif which == "gather_arg_idx":
        f = jax.jit(lambda x, i: x[i])
        out = f(x, idx)
    elif which == "gather_np_idx":
        f = jax.jit(lambda x: x[idx_np])           # numpy closed over
        out = f(x)
    elif which == "ix_const":
        f = jax.jit(jax.vmap(lambda m: m[jnp.ix_(perm, perm)]))
        out = f(M)
    elif which == "ix_arg":
        f = jax.jit(jax.vmap(lambda m, p: m[jnp.ix_(p, p)]))
        out = f(M, jnp.broadcast_to(perm, (64, 63)))
    elif which == "nullary_tiny":
        f = jax.jit(lambda: jnp.zeros((3,)))
        out = f()
    elif which == "nullary_eager_zeros":
        out = jnp.zeros((3,))
    elif which == "nullary_big":
        f = jax.jit(lambda: jnp.sin(x))
        out = f()
    elif which == "nullary_iota":
        f = jax.jit(lambda: jnp.arange(1024, dtype=jnp.float32) * 2.0)
        out = f()
    elif which == "closure_add":
        f = jax.jit(lambda y: y + x)               # big closed-over const
        out = f(x)
    elif which == "closure_matmul":
        f = jax.jit(lambda y: y @ x.T[:64])        # const operand matmul
        out = f(x)
    elif which == "scalar_out":
        f = jax.jit(lambda y: jnp.sum(y))
        out = f(x)
    elif which == "donate":
        f = jax.jit(lambda y: y * 2.0, donate_argnums=0)
        out = f(jnp.ones((256, 64)))
    elif which == "two_outputs":
        f = jax.jit(lambda y: (y * 2, y + 1))
        out = f(x)
    else:
        raise SystemExit(f"unknown {which}")

    jax.block_until_ready(out)
    t_after = timeit(mm, M)
    verdict = "POISONED" if t_after > 5 * max(t_before, 0.05) else "clean"
    print(f"{which:20s} before {t_before:7.3f}  after {t_after:7.3f}"
          f"  -> {verdict}", flush=True)


if __name__ == "__main__":
    main()
