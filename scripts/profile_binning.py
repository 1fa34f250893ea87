#!/usr/bin/env python3
"""Micro-benchmark the binning pipeline stages on chip."""

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
    from functools import partial

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    N = 50_000
    K = 256  # max_span^2
    MAXP = 8 * N  # 400k
    rng = np.random.default_rng(0)

    print(f"device: {jax.devices()[0]}  N={N} K={K} max_pairs={MAXP}",
          flush=True)

    # ---- enumeration [N, K] elementwise ----
    x = jnp.asarray(rng.uniform(0, 320, N).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 240, N).astype(np.float32))
    r = jnp.asarray(rng.uniform(2, 20, N).astype(np.float32))
    d = jnp.asarray(rng.uniform(0.5, 5, N).astype(np.float32))

    @jax.jit
    def enumerate_only(x, y, r):
        ts, tiles_x, tiles_y, max_span = 16, 20, 15, 16
        tx0 = jnp.clip(jnp.floor((x - r) / ts), 0, tiles_x - 1).astype(jnp.int32)
        tx1 = jnp.clip(jnp.floor((x + r) / ts), 0, tiles_x - 1).astype(jnp.int32)
        ty0 = jnp.clip(jnp.floor((y - r) / ts), 0, tiles_y - 1).astype(jnp.int32)
        ty1 = jnp.clip(jnp.floor((y + r) / ts), 0, tiles_y - 1).astype(jnp.int32)
        span_x = tx1 - tx0 + 1
        span_y = ty1 - ty0 + 1
        counts = span_x * span_y
        offsets = jnp.cumsum(counts) - counts
        k = jnp.arange(max_span * max_span, dtype=jnp.int32)
        dy = (k // max_span)[None, :]
        dx = (k % max_span)[None, :]
        pair_ok = (dx < span_x[:, None]) & (dy < span_y[:, None])
        j = dy * span_x[:, None] + dx
        tile = (ty0[:, None] + dy) * tiles_x + (tx0[:, None] + dx)
        idx = jnp.where(pair_ok, offsets[:, None] + j, MAXP)
        return idx.sum() + tile.sum()

    dt = timeit(lambda a, b, c: enumerate_only(a, b, c),
                lambda i: (x + i * 1e-6, y, r))
    print(f"enumerate [N,K]:        {dt*1e3:8.2f} ms", flush=True)

    # ---- scatter [N*K] -> [MAXP] x3 ----
    idx_np = rng.integers(0, MAXP + 1, N * K).astype(np.int32)
    flat_idx = jnp.asarray(idx_np)
    val1 = jnp.asarray(rng.integers(0, 300, N * K).astype(np.int32))
    val2 = jnp.asarray(rng.random(N * K).astype(np.float32))

    @jax.jit
    def scatter3(flat_idx, v1, v2):
        a = jnp.full((MAXP,), 300, jnp.int32).at[flat_idx].set(v1, mode="drop")
        b = jnp.full((MAXP,), jnp.inf).at[flat_idx].set(v2, mode="drop")
        c = jnp.zeros((MAXP,), jnp.int32).at[flat_idx].set(v1, mode="drop")
        return a, b, c

    dt = timeit(lambda f, a, b: scatter3(f, a, b),
                lambda i: (flat_idx, val1 + i, val2))
    print(f"scatter 12.8M->400k x3: {dt*1e3:8.2f} ms", flush=True)

    # ---- sort 400k, 3 operands 2 keys ----
    t1 = jnp.asarray(rng.integers(0, 301, MAXP).astype(np.int32))
    t2 = jnp.asarray(rng.random(MAXP).astype(np.float32))
    t3 = jnp.asarray(rng.integers(0, N, MAXP).astype(np.int32))

    @jax.jit
    def sort2key(a, b, c):
        return jax.lax.sort((a, b, c), dimension=-1, num_keys=2)

    dt = timeit(lambda a, b, c: sort2key(a, b, c),
                lambda i: (t1, t2 + i * 1e-7, t3))
    print(f"sort 400k 2-key:        {dt*1e3:8.2f} ms", flush=True)

    # ---- single fused key sort (tile*2^20 + depth-bits) 400k ----
    @jax.jit
    def sort1key(a, b, c):
        # pack tile and quantized depth into one int32 key
        db = jnp.clip((b * 65535.0), 0, 65535).astype(jnp.int32)
        key = a * 65536 + db
        return jax.lax.sort((key, c), dimension=-1, num_keys=1)

    dt = timeit(lambda a, b, c: sort1key(a, b, c),
                lambda i: (t1, t2 + i * 1e-7, t3))
    print(f"sort 400k 1-key packed: {dt*1e3:8.2f} ms", flush=True)

    # ---- sort 800k 1-key (K=16 no-scatter variant) ----
    u1 = jnp.asarray(rng.integers(0, 301, 16 * N).astype(np.int32))
    u3 = jnp.asarray(rng.integers(0, N, 16 * N).astype(np.int32))

    @jax.jit
    def sort1key_big(key, c):
        return jax.lax.sort((key, c), dimension=-1, num_keys=1)

    dt = timeit(lambda a, c: sort1key_big(a, c), lambda i: (u1 + i, u3))
    print(f"sort 800k 1-key:        {dt*1e3:8.2f} ms", flush=True)

    # ---- searchsorted + [T, cap] gather ----
    sorted_tile = jnp.sort(t1)
    sorted_id = t3

    @jax.jit
    def ranges_gather(sorted_tile, sorted_id):
        tile_range = jnp.arange(300, dtype=jnp.int32)
        starts = jnp.searchsorted(sorted_tile, tile_range, side="left")
        ends = jnp.searchsorted(sorted_tile, tile_range, side="right")
        slot = jnp.arange(512, dtype=jnp.int32)[None, :]
        gi = starts[:, None].astype(jnp.int32) + slot
        mask = slot < (ends - starts)[:, None].astype(jnp.int32)
        gi = jnp.where(mask, gi, 0)
        return sorted_id[gi], mask

    dt = timeit(lambda a, b: ranges_gather(a, b)[0],
                lambda i: (sorted_tile, sorted_id + i))
    print(f"searchsorted+gather:    {dt*1e3:8.2f} ms", flush=True)

    # ---- channel gather: [T=300, M=512] ids from N-channel tables ----
    ids = jnp.asarray(rng.integers(0, N, (300, 512)).astype(np.int32))
    table = jnp.asarray(rng.random((14, N)).astype(np.float32))

    @jax.jit
    def chan_gather(table, ids):
        return jnp.swapaxes(table[:, ids], 0, 1)  # [T, 14, M]

    dt = timeit(lambda t, i_: chan_gather(t, i_),
                lambda i: (table + i * 1e-7, ids))
    print(f"gather 14ch [300,512]:  {dt*1e3:8.2f} ms", flush=True)

    # ---- same gather via one-hot matmul (MXU) ----
    @jax.jit
    def chan_gather_mm(table, ids):
        # [T*M, N] one-hot @ [N, 14] -- way too big; use segment approach?
        oh = jax.nn.one_hot(ids.reshape(-1), N, dtype=jnp.bfloat16)
        return oh @ table.T.astype(jnp.bfloat16)

    try:
        dt = timeit(lambda t, i_: chan_gather_mm(t, i_),
                    lambda i: (table + i * 1e-7, ids), iters=3, warm=1)
        print(f"gather via one-hot mm:  {dt*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(f"one-hot mm failed: {e}", flush=True)

    # ---- sorted-operand co-sort: carry 14 channels through the sort ----
    vals = [jnp.asarray(rng.random(MAXP).astype(np.float32)) for _ in range(14)]

    @jax.jit
    def sort_carry(key, *vals):
        return jax.lax.sort((key,) + vals, dimension=-1, num_keys=1)

    dt = timeit(lambda k, *v: sort_carry(k, *v)[0],
                lambda i: tuple([t1 + i] + vals))
    print(f"sort 400k +14 operands: {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
