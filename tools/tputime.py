"""Reliable device timing on the axon-tunneled TPU.

`jax.block_until_ready` does NOT synchronize on this backend (it returns
after dispatch), and a D2H fetch carries seconds of fixed tunnel latency.
So: time two different iteration counts, each terminated by ONE scalar
D2H fetch (which forces full completion of the chain), and report the
slope — fixed overheads cancel.

Every timed call is CHAINED (output feeds the next input where possible)
so the device cannot overlap iterations.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _run(f, args, n):
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = f(*args)
    # force completion: scalar reduce + D2H (skip float0 tangents of int
    # leaves and empty arrays — the axon fetch chokes on zero-byte buffers)
    leaves = [l for l in jax.tree_util.tree_leaves(out)
              if hasattr(l, "dtype") and l.dtype != jax.dtypes.float0
              and getattr(l, "size", 0)]
    s = sum(jnp.sum(jnp.asarray(l, jnp.float32).ravel()[:16]) for l in leaves)
    float(s)
    return time.perf_counter() - t0


def device_time_ms(fn, *args, n_lo: int = 2, n_hi: int = 18) -> float:
    """Per-call device time in ms via two-point slope."""
    f = jax.jit(fn)
    _run(f, args, 1)  # compile + warmup
    t_lo = _run(f, args, n_lo)
    t_hi = _run(f, args, n_hi)
    return (t_hi - t_lo) / (n_hi - n_lo) * 1e3


def report(name: str, fn, *args, **kw):
    ms = device_time_ms(fn, *args, **kw)
    print(f"{name:52s} {ms:9.2f} ms", flush=True)
    return ms
