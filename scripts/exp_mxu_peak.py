"""Probe achievable int8 MXU throughput in Pallas on the live chip.

Times chained (dispatch-amortized) Pallas matmul kernels across shapes and
layouts to find the practical int8 ceiling, vs the 394.7 TOPS v5e spec.

Usage: python scripts/exp_mxu_peak.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from sezkp_tpu.utils.config import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    params = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
    rng = np.random.default_rng(0)

    def bench(name, mk, xshape, macs, iters=10):
        x = jnp.asarray(rng.integers(-128, 128, xshape, dtype=np.int8))
        f = jax.jit(mk)
        out = f(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:42s}: {dt*1e3:7.3f} ms  {2*macs/dt/1e12:6.1f} TOPS")

    # config: m=256, other=65536 (the 2^24 phase), NDIG=9
    m, other, nd = 256, 65536, 9

    def dots_kernel(nrep, tile, fuse):
        """nrep separate dots of [m,m]@[m,nd*tile] per grid step (fuse=False)
        or one [nrep*m, m]@[m, nd*tile] dot (fuse=True)."""
        grid = other // tile

        def kernel(x_ref, w_ref, o_ref):
            x = x_ref[:, :]
            if fuse:
                p = jax.lax.dot_general(
                    w_ref[:, :], x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = p[: m, :]
                for j in range(1, nrep):
                    acc = acc + p[j * m : (j + 1) * m, :]
            else:
                acc = None
                for j in range(nrep):
                    p = jax.lax.dot_general(
                        w_ref[j * m : (j + 1) * m, :], x,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    acc = p if acc is None else acc + p
            o_ref[:, :] = acc

        w = jnp.asarray(
            rng.integers(-128, 128, (nrep * m, m), dtype=np.int8))
        xs = pl.BlockSpec((m, nd * tile), lambda i: (0, i))
        ws = pl.BlockSpec((nrep * m, m), lambda i: (0, 0))
        os_ = pl.BlockSpec((m, nd * tile), lambda i: (0, i))
        f = pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[xs, ws], out_specs=os_,
            out_shape=jax.ShapeDtypeStruct((m, nd * other), jnp.int32),
            compiler_params=params)
        return lambda x: f(x, w)

    macs9 = nd * m * m * nd * other  # 9 dots x (m*m*9*tile*grid)
    for tile in (512,):
        bench(f"9 dots [{m},{m}]@[{m},{nd*tile}] t={tile}",
              dots_kernel(nd, tile, False), (m, nd * other), macs9)
    for tile in (512,):
        bench(f"1 dot [{nd*m},{m}]@[{m},{nd*tile}] t={tile}",
              dots_kernel(nd, tile, True), (m, nd * other), macs9)

    # bigger square: single dot [1024,1024]@[1024, tile]
    for mm, tile in ((1024, 2048), (512, 4096)):
        grid_elems = 1 << 24

        def mk(mm=mm, tile=tile):
            grid = grid_elems // tile

            def kernel(x_ref, w_ref, o_ref):
                o_ref[:, :] = jax.lax.dot_general(
                    w_ref[:, :], x_ref[:, :], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)

            w = jnp.asarray(
                rng.integers(-128, 128, (mm, mm), dtype=np.int8))
            f = pl.pallas_call(
                kernel, grid=(grid,),
                in_specs=[pl.BlockSpec((mm, tile), lambda i: (0, i)),
                          pl.BlockSpec((mm, mm), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((mm, tile), lambda i: (0, i)),
                out_shape=jax.ShapeDtypeStruct((mm, grid_elems), jnp.int32),
                compiler_params=params)
            return lambda x: f(x, w)

        bench(f"1 dot [{mm},{mm}]@[{mm},{tile}] i32-out",
              mk(), (mm, grid_elems), mm * mm * grid_elems, iters=10)

    # same but bf16 output-only reference point and int8 in/out
    def mk_i8out(mm, tile):
        grid = (1 << 24) // tile

        def kernel(x_ref, w_ref, o_ref):
            p = jax.lax.dot_general(
                w_ref[:, :], x_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[:, :] = (p & 127).astype(jnp.int8)

        w = jnp.asarray(rng.integers(-128, 128, (mm, mm), dtype=np.int8))
        f = pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec((mm, tile), lambda i: (0, i)),
                      pl.BlockSpec((mm, mm), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((mm, tile), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((mm, 1 << 24), jnp.int8),
            compiler_params=params)
        return lambda x: f(x, w)

    bench("1 dot [1024,1024]@[1024,2048] i8-out",
          mk_i8out(1024, 2048), (1024, 1 << 24), 1024 * 1024 * (1 << 24),
          iters=10)


if __name__ == "__main__":
    main()
