"""Microbench: effective HBM->VMEM DMA bandwidth vs transfer size from a
Pallas kernel issuing sequential manual copies (the BVH sweep's access
pattern).  Decides whether coalescing adjacent leaf windows into bigger
transfers can beat the ~77 GB/s effective rate the sweep kernel observes."""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")


def make_bench(rows, n_copies, ring):
    def kernel(hbm_ref, out_ref, buf, sem):
        T = hbm_ref.shape[0]

        def body(i, carry):
            slot = jax.lax.rem(i, ring)
            off = jax.lax.rem(i * 7919, T - rows)
            cp = pltpu.make_async_copy(
                hbm_ref.at[pl.ds(off, rows), :], buf.at[slot], sem.at[slot]
            )
            cp.start()

            @pl.when(i >= ring - 1)
            def _():
                j = i - (ring - 1)
                off_j = jax.lax.rem(j * 7919, T - rows)
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(off_j, rows), :], buf.at[jax.lax.rem(j, ring)],
                    sem.at[jax.lax.rem(j, ring)],
                ).wait()
            return carry + buf[slot, 0, 0]

        acc = jax.lax.fori_loop(0, n_copies, body, jnp.float32(0.0))
        # drain the tail
        def drain(j, c):
            i = n_copies - (ring - 1) + j
            off_i = jax.lax.rem(i * 7919, T - rows)
            pltpu.make_async_copy(
                hbm_ref.at[pl.ds(off_i, rows), :], buf.at[jax.lax.rem(i, ring)],
                sem.at[jax.lax.rem(i, ring)],
            ).wait()
            return c
        acc = jax.lax.fori_loop(0, ring - 1, drain, acc)
        out_ref[0, 0] = acc

    T = 1 << 18
    x = jnp.ones((T, 128), jnp.float32)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((ring, rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((ring,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)

    run(x).block_until_ready()
    best = None
    for _ in range(4):
        t0 = time.perf_counter()
        run(x).block_until_ready()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    gb = rows * 128 * 4 * n_copies / 1e9
    return gb / best


if __name__ == "__main__":
    for rows, ring in ((72, 16), (72, 4), (144, 8), (288, 8), (1152, 4), (4608, 2)):
        n_copies = max(2048, (1 << 25) // (rows * 128 * 4))
        bw = make_bench(rows, n_copies, ring)
        print(f"rows={rows:5d} ({rows*128*4/1024:7.1f} KB/copy) ring={ring:2d}: "
              f"{bw:7.1f} GB/s", flush=True)
