"""Single-call width-tiered resident kernel prototype (PERF_NOTES 5b):
planes sorted by actual window-width class {<=4, <=8, <=16}, ONE
pallas_call whose grid covers the three class segments with a static
span per segment - no x/y re-streaming, no cross-call adds.

Run on chip: python experiments/tier_proto.py [name] [scale] [k]
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp
from functools import partial


def build_tiers(wb, splane):
    """Reorder a WBELLMatrix's planes into width classes with tight
    per-plane windows; returns concatenated arrays + per-class step
    counts (each class padded to a splane multiple)."""
    lc = np.asarray(wb.lc); vals = np.asarray(wb.values)
    p_ga = np.asarray(wb.p_ga); p_og = np.asarray(wb.p_og)
    gloc = lc[:, 0, :] // 128
    nz = (np.abs(vals).sum(axis=(1, 2)) > 0)
    gmin = np.where(nz, gloc, 10**6).min(axis=1)
    gmin = np.where(gmin == 10**6, 0, gmin)
    width = np.maximum(np.where(nz, gloc, -1).max(axis=1) - gmin + 1, 1)
    cls = np.where(width <= 4, 4, np.where(width <= 8, 8, 16))
    out_v, out_l, out_pg, steps = [], [], [], []
    for w in (4, 8, 16):
        idx = np.flatnonzero(cls == w)
        pad = (-len(idx)) % splane
        v = vals[idx]
        l = lc[idx].copy()
        og = p_og[idx]
        ga = p_ga[idx] + gmin[idx]
        l[:, 0, :] = np.where(nz[idx], l[:, 0, :] - 128 * gmin[idx][:, None],
                              0)
        assert len(idx) == 0 or (l[:, 0, :] // 128).max() < w
        if pad:
            v = np.concatenate([v, np.zeros((pad, 8, 8, 128), np.float32)])
            l = np.concatenate([l, np.zeros((pad, 1, 128), np.int32)])
            og = np.concatenate([og, np.zeros(pad, np.int64)])
            ga = np.concatenate([ga, np.zeros(pad, np.int64)])
        out_v.append(v); out_l.append(l)
        out_pg.append((og.astype(np.int32) << 16) | ga.astype(np.int32))
        steps.append((len(idx) + pad) // splane)
    return (jnp.asarray(np.concatenate(out_v)),
            jnp.asarray(np.concatenate(out_l)),
            jnp.asarray(np.concatenate(out_pg)), tuple(steps))


def _kernel_tiers(steps, nrhs, splane):
    from jax.experimental import pallas as pl
    s4, s8, s16 = steps

    def tier_body(pg_r, lc_ref, vals_ref, x_ref, o_ref, j, span):
        for s in range(splane):
            p = j * splane + s
            l = lc_ref[s]
            idx = jnp.broadcast_to(l % 128, (8, 128))
            lcg = jnp.broadcast_to(l // 128, (8, 128))
            v = vals_ref[s].astype(o_ref.dtype)
            pg = pg_r[p]
            og = (pg >> 16) & 0xFFFF
            ga = pg & 0xFFFF
            for c in range(nrhs):
                w = x_ref[c, pl.ds(ga, span)]
                g = jnp.zeros((8, 128), o_ref.dtype)
                for t in range(span):
                    cand = jnp.take_along_axis(w[t], idx, axis=1)
                    g = (cand if span == 1 else jnp.where(lcg == t, cand, g))
                y = o_ref[c, og]
                for jj in range(8):
                    y = y + v[:, jj, :] * jnp.broadcast_to(
                        g[jj:jj + 1, :], (8, 128))
                o_ref[c, og] = y

    def kernel(pg_r, lc_ref, vals_ref, x_ref, o_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        if s4:
            @pl.when(j < s4)
            def _():
                tier_body(pg_r, lc_ref, vals_ref, x_ref, o_ref, j, 4)
        if s8:
            @pl.when((j >= s4) & (j < s4 + s8))
            def _():
                tier_body(pg_r, lc_ref, vals_ref, x_ref, o_ref, j, 8)
        if s16:
            @pl.when(j >= s4 + s8)
            def _():
                tier_body(pg_r, lc_ref, vals_ref, x_ref, o_ref, j, 16)

    return kernel


@partial(jax.jit, static_argnames=("steps", "splane", "interpret"))
def tier_spmm(packed, lc, values, x, *, steps, splane, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    nrhs, nt = x.shape[0], x.shape[1]
    nsteps = sum(steps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((splane, 1, 128), lambda j, pg: (j, 0, 0)),
            pl.BlockSpec((splane, 8, 8, 128), lambda j, pg: (j, 0, 0, 0)),
            pl.BlockSpec((nrhs, nt, 8, 128), lambda j, pg: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nrhs, nt, 8, 128),
                               lambda j, pg: (0, 0, 0, 0)))
    vec = nrhs * nt * 1024 * 4
    params = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(2.2 * vec) + (24 << 20), 127 << 20)))
    return pl.pallas_call(
        _kernel_tiers(steps, nrhs, splane), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrhs, nt, 8, 128), jnp.float32),
        interpret=interpret, **params)(packed, lc, values, x)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "thermal2"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    ks = [int(v) for v in (sys.argv[3].split(",") if len(sys.argv) > 3
                           else ["1", "4"])]
    interpret = jax.default_backend() != "tpu"
    from cgx.io.suitesparse import load_or_standin
    from cgx.sparse.wbell import wbell_from_csr
    from cgx.kernels.wbell import wbell_spmm

    a, _ = load_or_standin(name, None, scale=scale)
    a_sp = sp.csr_matrix((np.asarray(a.values, np.float64),
                          np.asarray(a.col_indices),
                          np.asarray(a.indptr)), shape=a.shape)
    n = a_sp.shape[0]
    wb = wbell_from_csr(a_sp)
    splane = 8 if interpret else 32
    v, l, pg, steps = build_tiers(wb, splane)
    print(f"{name}: tiers steps {steps} (x{splane} planes)")

    rng = np.random.default_rng(0)
    for k in ks:
        X = rng.standard_normal((n, k)).astype(np.float32)
        xb = jnp.stack([wb.to_internal(X[:, j]) for j in range(k)])
        y_ref = np.asarray(wbell_spmm(wb, xb, interpret=interpret))
        y_t = np.asarray(tier_spmm(pg, l, v, xb, steps=steps,
                                   splane=splane, interpret=interpret))
        err = np.abs(y_t - y_ref).max()
        print(f"k={k} max abs diff tiers vs batched: {err:.2e}")
        assert err < 1e-4 * max(1.0, np.abs(y_ref).max())
        if interpret:
            continue

        @partial(jax.jit, static_argnums=(4, 5, 6))
        def loop_t(pg_, l_, v_, x, K, steps, splane):
            return jax.lax.fori_loop(
                0, K, lambda i, y: tier_spmm(pg_, l_, v_, y, steps=steps,
                                             splane=splane,
                                             interpret=False) * 0.125, x)

        k1, k2 = 30, 90
        jax.block_until_ready(loop_t(pg, l, v, xb, k1, steps, splane))
        jax.block_until_ready(loop_t(pg, l, v, xb, k2, steps, splane))
        best = None
        for i in range(3):
            xv = jax.block_until_ready(xb * (1 + 0.001 * (i + 1)))
            t1 = time.perf_counter()
            jax.block_until_ready(loop_t(pg, l, v, xv, k1, steps, splane))
            t1 = time.perf_counter() - t1
            t2 = time.perf_counter()
            jax.block_until_ready(loop_t(pg, l, v, xv, k2, steps, splane))
            t2 = time.perf_counter() - t2
            d = (t2 - t1) / (k2 - k1)
            best = d if best is None else min(best, d)
        print(f"tiered single-call k={k}: {best*1e3:.3f} ms/SpMM = "
              f"{best*1e3/k:.3f} ms/RHS")


if __name__ == "__main__":
    main()
