"""Paired-slot block-ELL experiment: fuse two wb slots into one 128-deep
MXU contraction per step (vals (64,128) @ stacked x (128,k)) vs the
shipped resident engine's two 64-deep dots.  Measure, don't predict.
Run on chip: python experiments/bell_pair_proto.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from cgx.kernels.bsr import BlockELL, bell_spmm, _BELL_RESIDENT_VMEM_CAP


@partial(jax.jit, static_argnames=("k", "interpret"))
def bell_spmm_paired(block_cols, values, xb, *, k, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbr, wb, bs, _ = values.shape
    assert wb % 2 == 0
    nbc = xb.shape[0]
    out_dtype = jnp.float32

    def kernel(cols_ref, vals_ref, x_ref, out_ref):
        i = pl.program_id(0)
        acc = jnp.zeros((bs, k), out_dtype)
        for j in range(0, wb, 2):
            c1 = cols_ref[i, j]
            c2 = cols_ref[i, j + 1]
            x1 = x_ref[pl.ds(c1, 1)][0]
            x2 = x_ref[pl.ds(c2, 1)][0]
            xx = jnp.concatenate([x1, x2], axis=0)        # (2bs, k)
            vv = jnp.concatenate([vals_ref[0, j], vals_ref[0, j + 1]],
                                 axis=1)                  # (bs, 2bs)
            acc = acc + jnp.dot(vv, xx,
                                preferred_element_type=out_dtype)
        out_ref[0] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nbr,),
        in_specs=[
            pl.BlockSpec((1, wb, bs, bs), lambda i, cols: (i, 0, 0, 0)),
            pl.BlockSpec((nbc, bs, k), lambda i, cols: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bs, k), lambda i, cols: (i, 0, 0)))
    xbytes = nbc * bs * k * xb.dtype.itemsize
    params = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(1.2 * xbytes) + (24 << 20),
                                 127 << 20)))
    return pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=jax.ShapeDtypeStruct((nbr, bs, k),
                                                         out_dtype),
                          interpret=interpret, **params)(
        block_cols, values, xb)


def main():
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    nbr, wb, bs, k = (64, 4, 16, 64) if interpret else (512, 8, 64, 256)
    for dt in ([np.float32] if interpret else [np.float32, jnp.bfloat16]):
        vals = rng.standard_normal((nbr, wb, bs, bs)).astype(dt)
        cols = rng.integers(0, nbr, (nbr, wb)).astype(np.int32)
        a = BlockELL(jnp.asarray(vals), jnp.asarray(cols),
                     (nbr * bs, nbr * bs))
        x = jnp.asarray(rng.standard_normal((nbr * bs, k)), a.values.dtype)
        xb = x.reshape(-1, bs, k)
        y_ref = np.asarray(bell_spmm(a, x, interpret=interpret,
                                     engine="resident"), np.float32)
        y_p = np.asarray(bell_spmm_paired(a.block_cols, a.values, xb,
                                          k=k, interpret=interpret),
                         np.float32).reshape(nbr * bs, k)
        err = np.abs(y_p - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
        print(f"{np.dtype(dt).name}: paired-vs-resident max rel diff "
              f"{err:.1e}")
        assert err < 1e-5
        if interpret:
            continue

        @partial(jax.jit, static_argnames=("K", "mode"))
        def loop(a_, x_, K, mode):
            def body(i, y):
                if mode == "paired":
                    z = bell_spmm_paired(a_.block_cols, a_.values, y,
                                         k=k, interpret=False)
                else:
                    z = bell_spmm(a_, y.reshape(-1, k),
                                  engine="resident").reshape(y.shape)
                return (z * 0.0001).astype(y.dtype)
            return jax.lax.fori_loop(0, K, body, x_)

        flops = 2 * nbr * wb * bs * bs * k
        for mode in ("resident", "paired"):
            k1, k2 = 50, 450
            jax.block_until_ready(loop(a, xb, k1, mode))
            jax.block_until_ready(loop(a, xb, k2, mode))
            best = None
            for i in range(3):
                xv = jax.block_until_ready(xb * (1 + 0.001 * (i + 1)))
                t1 = time.perf_counter()
                jax.block_until_ready(loop(a, xv, k1, mode))
                t1 = time.perf_counter() - t1
                t2 = time.perf_counter()
                jax.block_until_ready(loop(a, xv, k2, mode))
                t2 = time.perf_counter() - t2
                d = (t2 - t1) / (k2 - k1)
                best = d if best is None else min(best, d)
            print(f"  {np.dtype(dt).name} {mode:9s}: {best*1e6:7.1f} us  "
                  f"{flops/best/1e12:6.2f} TFLOP/s")


if __name__ == "__main__":
    main()
