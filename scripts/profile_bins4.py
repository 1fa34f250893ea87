#!/usr/bin/env python3
"""Why is the real scatter 183ms when an identical arg-fed scatter is fast?"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timeit(fn, args_fn, iters=10, warm=3):
    import jax

    for i in range(warm):
        jax.block_until_ready(fn(*args_fn(i)))
    t0 = time.time()
    for i in range(iters):
        out = fn(*args_fn(warm + i))
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    N = 50_000
    K = 256
    MAXP = 8 * N
    rng = np.random.default_rng(0)

    # realistic inputs: ~6 pairs valid per splat, rest OOB (=MAXP)
    spans = rng.integers(1, 4, (N, 2))
    offs = np.concatenate([[0], np.cumsum(spans[:, 0] * spans[:, 1])[:-1]])
    idx_np = np.full((N, K), MAXP, np.int32)
    tile_np = np.zeros((N, K), np.int32)
    for_k = np.arange(K)
    dyv = for_k // 16
    dxv = for_k % 16
    ok = (dxv[None, :] < spans[:, :1]) & (dyv[None, :] < spans[:, 1:2])
    jv = dyv[None, :] * spans[:, :1] + dxv[None, :]
    idx_np = np.where(ok, offs[:, None] + jv, MAXP).astype(np.int32)
    tile_np = ((dyv[None, :] + rng.integers(0, 10, (N, 1))) * 20
               + dxv[None, :] + rng.integers(0, 10, (N, 1))).astype(np.int32)

    flat_idx = jnp.asarray(idx_np.reshape(-1))
    tile_flat = jnp.asarray(tile_np.reshape(-1))
    depths = jnp.asarray(rng.random(N).astype(np.float32))

    # A: everything as precomputed args
    @jax.jit
    def scatterA(flat_idx, tile_flat):
        return jnp.full((MAXP,), 300, jnp.int32).at[flat_idx].set(
            tile_flat, mode="drop")

    dt = timeit(lambda a, b: scatterA(a, b),
                lambda i: (flat_idx, tile_flat + i))
    print(f"A scatter(args):            {dt*1e3:8.2f} ms", flush=True)

    # B: values computed inline via broadcast (like the real code)
    tile_small = jnp.asarray(tile_np[:, :1])  # [N, 1]

    @jax.jit
    def scatterB(flat_idx, tile_small):
        tile = jnp.broadcast_to(tile_small, (N, K)).reshape(-1)
        return jnp.full((MAXP,), 300, jnp.int32).at[flat_idx].set(
            tile, mode="drop")

    dt = timeit(lambda a, b: scatterB(a, b),
                lambda i: (flat_idx, tile_small + i))
    print(f"B scatter(bcast values):    {dt*1e3:8.2f} ms", flush=True)

    # C: indices computed inline from [N] args (like the real code)
    offs_j = jnp.asarray(offs.astype(np.int32))
    span_j = jnp.asarray(spans.astype(np.int32))

    @jax.jit
    def scatterC(offs_j, span_j, tile_flat):
        k = jnp.arange(K, dtype=jnp.int32)
        dy = (k // 16)[None, :]
        dx = (k % 16)[None, :]
        ok = (dx < span_j[:, :1]) & (dy < span_j[:, 1:2])
        j = dy * span_j[:, :1] + dx
        idx = jnp.where(ok, offs_j[:, None] + j, MAXP).reshape(-1)
        return jnp.full((MAXP,), 300, jnp.int32).at[idx].set(
            tile_flat, mode="drop")

    dt = timeit(lambda a, b, c: scatterC(a, b, c),
                lambda i: (offs_j + i * 0, span_j, tile_flat + i))
    print(f"C scatter(computed idx):    {dt*1e3:8.2f} ms", flush=True)

    # D: indices computed inline INCLUDING the cumsum
    counts_j = jnp.asarray((spans[:, 0] * spans[:, 1]).astype(np.int32))

    @jax.jit
    def scatterD(counts_j, span_j, tile_flat):
        offs = jnp.cumsum(counts_j) - counts_j
        k = jnp.arange(K, dtype=jnp.int32)
        dy = (k // 16)[None, :]
        dx = (k % 16)[None, :]
        ok = (dx < span_j[:, :1]) & (dy < span_j[:, 1:2])
        j = dy * span_j[:, :1] + dx
        idx = jnp.where(ok, offs[:, None] + j, MAXP).reshape(-1)
        return jnp.full((MAXP,), 300, jnp.int32).at[idx].set(
            tile_flat, mode="drop")

    dt = timeit(lambda a, b, c: scatterD(a, b, c),
                lambda i: (counts_j + i * 0, span_j, tile_flat + i))
    print(f"D scatter(cumsum idx):      {dt*1e3:8.2f} ms", flush=True)

    # E: 3 scatters sharing one computed index (the real shape of the code)
    @jax.jit
    def scatterE(counts_j, span_j, tile_small, depths):
        offs = jnp.cumsum(counts_j) - counts_j
        k = jnp.arange(K, dtype=jnp.int32)
        dy = (k // 16)[None, :]
        dx = (k % 16)[None, :]
        ok = (dx < span_j[:, :1]) & (dy < span_j[:, 1:2])
        j = dy * span_j[:, :1] + dx
        idx = jnp.where(ok, offs[:, None] + j, MAXP).reshape(-1)
        tile = jnp.broadcast_to(tile_small, (N, K)).reshape(-1)
        db = jnp.broadcast_to(depths[:, None], (N, K)).reshape(-1)
        gid = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[:, None], (N, K)).reshape(-1)
        a = jnp.full((MAXP,), 300, jnp.int32).at[idx].set(tile, mode="drop")
        b = jnp.full((MAXP,), jnp.inf).at[idx].set(db, mode="drop")
        c = jnp.zeros((MAXP,), jnp.int32).at[idx].set(gid, mode="drop")
        return a, b, c

    dt = timeit(lambda a, b, c, d: scatterE(a, b, c, d)[0],
                lambda i: (counts_j, span_j, tile_small + i, depths))
    print(f"E 3 scatters (real shape):  {dt*1e3:8.2f} ms", flush=True)

    # F: ONE scatter of a packed int64-style pair (tile<<20 | quantized depth)
    @jax.jit
    def scatterF(counts_j, span_j, tile_small, depths):
        offs = jnp.cumsum(counts_j) - counts_j
        k = jnp.arange(K, dtype=jnp.int32)
        dy = (k // 16)[None, :]
        dx = (k % 16)[None, :]
        ok = (dx < span_j[:, :1]) & (dy < span_j[:, 1:2])
        j = dy * span_j[:, :1] + dx
        idx = jnp.where(ok, offs[:, None] + j, MAXP).reshape(-1)
        # pack (tile, gid) -- depth ordering via separate 1-key sort later
        packed = (tile_small.astype(jnp.int64) << 32) | jnp.arange(
            N, dtype=jnp.int64)[:, None]
        pk = jnp.broadcast_to(packed, (N, K)).reshape(-1)
        return jnp.full((MAXP,), jnp.int64(2**62)).at[idx].set(pk, mode="drop")

    try:
        dt = timeit(lambda a, b, c, d: scatterF(a, b, c, d),
                    lambda i: (counts_j, span_j, tile_small + i, depths))
        print(f"F 1 scatter int64 packed:   {dt*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(f"F failed: {e}", flush=True)


if __name__ == "__main__":
    main()
