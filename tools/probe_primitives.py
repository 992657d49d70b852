"""One-off device probes for round-2 design decisions (scatter/gather/sort)."""
import os, sys, time
if os.environ.get("RWT_AXON_BOOTED") != "1" and os.path.exists("/opt/axon/libaxon_pjrt.so"):
    env = dict(os.environ, RWT_AXON_BOOTED="1")
    os.execve(sys.executable, [sys.executable, "-S", os.path.abspath(__file__)], env)
if os.environ.get("RWT_AXON_BOOTED") == "1":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.axon_boot import boot
    boot()

import numpy as np
import jax, jax.numpy as jnp

def timeit(name, fn, *args, reps=3):
    chk = jax.jit(lambda x: jnp.sum(x.astype(jnp.int64)) if x.dtype != jnp.int64 else jnp.sum(x))
    f = jax.jit(fn)
    out = f(*args); float(chk(out.reshape(-1)[:1]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args); float(chk(out.reshape(-1)[:1]))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms")
    return min(ts)

K = 4 * 1024 * 1024   # parent table size
E = 32 * 1024 * 1024  # edge count
P = 16 * 1024 * 1024  # plane pixels
rng = np.random.default_rng(0)
idx = jax.device_put(jnp.asarray(rng.integers(0, K, size=E).astype(np.int32)))
val = jax.device_put(jnp.asarray(rng.integers(0, K, size=E).astype(np.int32)))
tbl = jax.device_put(jnp.arange(K, dtype=jnp.int32))
pix = jax.device_put(jnp.asarray(rng.integers(0, K, size=P).astype(np.int32)))
jax.block_until_ready((idx, val, tbl, pix))

timeit("scatter-min E=32M -> K=4M", lambda t, i, v: t.at[i].min(v, mode="drop"), tbl, idx, val)
timeit("gather E=32M from K=4M", lambda t, i: t[i], tbl, idx)
timeit("gather P=16M from K=4M", lambda t, i: t[i], tbl, pix)
timeit("pointer-jump 1 round (p[p], K=4M)", lambda p: p[p], tbl)
timeit("sort E=32M int32", lambda v: jnp.sort(v), val)
timeit("sort-pair E=32M (key+payload)", lambda k, v: jax.lax.sort((k, v), num_keys=1)[0], idx, val)
timeit("segment-min via sorted scatter (E=32M)", lambda t, i, v: t.at[i].min(v, mode="drop"), tbl, jnp.sort(idx), val)
timeit("bincount P=16M -> 256", lambda x: jnp.zeros(256, jnp.int32).at[x & 255].add(1), pix)
