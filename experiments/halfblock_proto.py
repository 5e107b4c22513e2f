"""4x8 half-block WBELL prototype (VERDICT r4 weak #5 / next #6): measure,
don't predict.  Builds real (P, 4, 8, 128) half-block planes (per-lane
half bit in lc bit 14), runs a variant resident kernel, and times
ms/SpMV against the shipped 8x8 flagship on the same matrix.

Run ON the TPU chip: python experiments/halfblock_proto.py [name] [scale]
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp
from functools import partial


def build_halfblock(a_sp, span=16):
    """Pack 4x8 half-blocks in the shipped RCM+balance order."""
    from cgx.sparse.wbell import _rcm, _balance_blocks
    n = a_sp.shape[0]
    perm = _balance_blocks(a_sp, _rcm(a_sp), 1024)
    ap = a_sp[perm][:, perm].tocoo()
    row = ap.row.astype(np.int64); col = ap.col.astype(np.int64)
    val = ap.data.astype(np.float32)
    nbr = -(-n // 8)
    ng_real = -(-nbr // 128)

    ub4 = row >> 2                      # 4-row half-block row
    bc = col >> 3
    key = ub4 * nbr + bc                # unique (half-block row, col block)
    uid, inv = np.unique(key, return_inverse=True)
    hb_r, hb_c = uid // nbr, uid % nbr
    pb = hb_r >> 1                      # parent 8-row block row
    half = hb_r & 1
    lane = pb & 127
    tile = pb >> 7
    bucket = (hb_c >> 7) // span
    nblocks = len(uid)

    # ELL pack per (tile, bucket): rank within (parent-lane, bucket) runs.
    # Blocks sorted by (hb_r, hb_c) == (pb, half, hb_c): a lane's halves
    # interleave, which is fine - each is its own slot entry.
    chg = np.empty(nblocks, bool); chg[0] = True
    chg[1:] = (hb_r[1:] != hb_r[:-1]) | (bucket[1:] != bucket[:-1]) | \
              (pb[1:] != pb[:-1])
    # rank within (lane, tile, bucket): count per (pb, bucket)
    key2 = pb * 1000 + bucket
    u2, inv2 = np.unique(key2, return_inverse=True)
    first = np.full(len(u2), -1, np.int64)
    np.minimum.at(first, inv2, np.arange(nblocks))
    # blocks are sorted by key2? sorted by (pb, half, hb_c) -> (pb,bucket)
    # NOT monotone in bucket across halves. Use argsort for ranks:
    order = np.lexsort((half, hb_c, bucket, pb))
    ub4o = dict(r=hb_r[order])
    pbo, bko = pb[order], bucket[order]
    k2o = pbo * 10000 + bko
    chg2 = np.empty(nblocks, bool); chg2[0] = True
    chg2[1:] = k2o[1:] != k2o[:-1]
    gstart = np.flatnonzero(chg2)
    gid = np.cumsum(chg2) - 1
    rank_o = np.arange(nblocks) - gstart[gid]
    rank = np.empty(nblocks, np.int64); rank[order] = rank_o

    NB = int(bucket.max()) + 1
    tb_key = tile * NB + bucket
    tb_uid, tb_inv = np.unique(tb_key, return_inverse=True)
    wbt_tb = np.zeros(len(tb_uid), np.int64)
    np.maximum.at(wbt_tb, tb_inv, rank + 1)
    pstart_tb = np.concatenate([[0], np.cumsum(wbt_tb[:-1])])
    p_real = int(wbt_tb.sum())
    plane = pstart_tb[tb_inv] + rank

    values = np.zeros((p_real, 4, 8, 128), np.float32)
    lcp = np.zeros((p_real, 1, 128), np.int32)
    np.add.at(values, (plane[inv], row & 3, col & 7, lane[inv]), val)
    lcp[plane, 0, lane] = ((hb_c & 127)
                           + 128 * ((hb_c >> 7) - bucket[...] * span)
                           + 16384 * half).astype(np.int32)
    p_og = np.repeat(tb_uid // NB, wbt_tb)
    p_ga = np.repeat((tb_uid % NB) * span, wbt_tb)
    pad = (-p_real) % 64
    if pad:
        values = np.concatenate([values, np.zeros((pad,4,8,128),np.float32)])
        lcp = np.concatenate([lcp, np.zeros((pad,1,128),np.int32)])
        p_og = np.concatenate([p_og, np.zeros(pad,np.int64)])
        p_ga = np.concatenate([p_ga, np.zeros(pad,np.int64)])
    fill = values.size / max(len(val), 1)
    return (jnp.asarray(values), jnp.asarray(lcp),
            jnp.asarray(p_og.astype(np.int32)),
            jnp.asarray(p_ga.astype(np.int32)), fill, p_real)


def _kernel_half(span, splane):
    from jax.experimental import pallas as pl

    def kernel(pg_r, lc_ref, vals_ref, x_ref, o_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        for s in range(splane):
            p = j * splane + s
            lraw = lc_ref[s]
            half = (lraw >> 14) & 1                       # (1,128)
            l = lraw & 0x3FFF
            idx = jnp.broadcast_to(l % 128, (8, 128))
            lcg = jnp.broadcast_to(l // 128, (8, 128))
            v = vals_ref[s].astype(o_ref.dtype)           # (4,8,128)
            pg = pg_r[p]
            og = (pg >> 16) & 0xFFFF
            ga = pg & 0xFFFF
            w = x_ref[0, pl.ds(ga, span)]
            g = jnp.zeros((8, 128), o_ref.dtype)
            for t in range(span):
                cand = jnp.take_along_axis(w[t], idx, axis=1)
                g = jnp.where(lcg == t, cand, g)
            c = jnp.zeros((4, 128), o_ref.dtype)
            for jj in range(8):
                c = c + v[:, jj, :] * jnp.broadcast_to(
                    g[jj:jj + 1, :], (4, 128))
            y = o_ref[0, og]
            hb = jnp.broadcast_to(half, (4, 128))
            top = y[:4] + jnp.where(hb == 0, c, 0.0)
            bot = y[4:] + jnp.where(hb == 1, c, 0.0)
            o_ref[0, og] = jnp.concatenate([top, bot], axis=0)

    return kernel


@partial(jax.jit, static_argnames=("span", "splane", "interpret"))
def half_spmv(packed, lc, values, x, *, span, splane, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    nt = x.shape[1]
    nsteps = values.shape[0] // splane
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((splane, 1, 128), lambda j, pg: (j, 0, 0)),
            pl.BlockSpec((splane, 4, 8, 128), lambda j, pg: (j, 0, 0, 0)),
            pl.BlockSpec((1, nt, 8, 128), lambda j, pg: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nt, 8, 128), lambda j, pg: (0, 0, 0, 0)))
    vec = nt * 1024 * 4
    params = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(2.5 * vec) + (24 << 20), 127 << 20)))
    return pl.pallas_call(
        _kernel_half(span, splane), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, nt, 8, 128), jnp.float32),
        interpret=interpret, **params)(packed, lc, values, x)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "thermal2"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    interpret = jax.default_backend() != "tpu"
    from cgx.io.suitesparse import load_or_standin
    from cgx.sparse.wbell import wbell_from_csr
    from cgx.kernels.wbell import wbell_spmv

    a, _ = load_or_standin(name, None, scale=scale)
    a_sp = sp.csr_matrix((np.asarray(a.values, np.float64),
                          np.asarray(a.col_indices),
                          np.asarray(a.indptr)), shape=a.shape)
    n = a_sp.shape[0]
    wb = wbell_from_csr(a_sp)
    t0 = time.perf_counter()
    v4, lc4, og4, ga4, fill4, p4 = build_halfblock(a_sp)
    print(f"{name}: 4x8 build {time.perf_counter()-t0:.0f}s "
          f"fill {fill4:.2f}x planes {p4} "
          f"(8x8: fill {wb.nnz_stored/wb.nnz:.2f}x planes "
          f"{np.count_nonzero(np.abs(np.asarray(wb.values)).sum(axis=(1,2,3)))})")
    packed4 = (og4 << 16) | ga4

    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    xi = wb.to_internal(jnp.asarray(x))[None]
    splane = 8 if interpret else 32
    y4 = half_spmv(packed4, lc4, v4, xi, span=wb.span, splane=splane,
                   interpret=interpret)
    y4s = np.asarray(wb.from_internal(y4[0]))
    truth = a_sp @ x.astype(np.float64)
    err = np.abs(y4s - truth).max() / (np.abs(truth).max() + 1e-30)
    print(f"4x8 correctness max rel-to-peak err: {err:.2e}")
    assert err < 1e-5

    if interpret:
        return

    @partial(jax.jit, static_argnums=(4, 5))
    def loop4(packed, lc, v, x, K, splane):
        return jax.lax.fori_loop(
            0, K, lambda i, y: half_spmv(packed, lc, v, y, span=16,
                                         splane=splane,
                                         interpret=False) * 0.125, x)

    @partial(jax.jit, static_argnums=(2,))
    def loop8(wb_, x, K):
        return jax.lax.fori_loop(
            0, K, lambda i, y: wbell_spmv(wb_, y, interpret=False) * 0.125,
            x)

    def timeit(fn, x, k1=30, k2=90):
        jax.block_until_ready(fn(x, k1)); jax.block_until_ready(fn(x, k2))
        best = None
        for i in range(3):
            xv = jax.block_until_ready(x * (1 + 0.001 * (i + 1)))
            t1 = time.perf_counter(); jax.block_until_ready(fn(xv, k1))
            t1 = time.perf_counter() - t1
            t2 = time.perf_counter(); jax.block_until_ready(fn(xv, k2))
            t2 = time.perf_counter() - t2
            d = (t2 - t1) / (k2 - k1)
            best = d if best is None else min(best, d)
        return best

    t8 = timeit(lambda xx, K: loop8(wb, xx[0], K)[None], xi)
    t4 = timeit(lambda xx, K: loop4(packed4, lc4, v4, xx, K, splane), xi)
    print(f"8x8 flagship: {t8*1e3:.3f} ms/SpMV   "
          f"4x8 half-block: {t4*1e3:.3f} ms/SpMV  "
          f"({t8/t4:.2f}x; bytes ratio {fill4/(wb.nnz_stored/wb.nnz):.2f})")


if __name__ == "__main__":
    main()
