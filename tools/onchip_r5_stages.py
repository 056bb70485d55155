#!/usr/bin/env python
"""Round-5 per-pass breakdown of the GF16 wire pair vs the field pair.

Times partial pipelines (marginal = chained-difference) to locate where
the wire pair's extra ~11 ms over the field pair lives: pass A1, the
seam, pass B2, and the bitmap moveaxis are measured cumulatively.
Run: python tools/onchip_r5_stages.py
"""
import gc
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from fastecc_tpu.fields import GF16  # noqa: E402
from fastecc_tpu.kernels import ntt_mfa  # noqa: E402
from fastecc_tpu.utils.timer import median, time_samples  # noqa: E402


def emit(**kw):
    print(json.dumps(kw), flush=True)


def measure(name, fn, x, samples=5):
    f1 = jax.jit(fn)
    s1 = time_samples(f1, x, iters=samples)
    emit(metric=name, single_s=round(median(s1), 4),
         s1=[round(v, 4) for v in s1])
    jax.clear_caches()
    gc.collect()
    return median(s1)


def main():
    emit(device=str(jax.devices()[0]))
    k, bb = 1 << 13, 1 << 16
    wu = bb // 4
    field = GF16
    w_n = field.root_of_order(2 * k)
    pairs = jax.block_until_ready(
        jax.random.bits(jax.random.key(3), (k, wu), dtype=jnp.uint32))

    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c1 = ntt_mfa._pair_default_c(k)
    r1 = k // c1
    c2, r2 = r1, c1
    tr, tl = ntt_mfa._tile_for(c1, r1, wu)
    emit(shape=dict(k=k, wu=wu, c1=c1, r1=r1, tr=tr, tl=tl))

    # stage-wise: reuse the module's builders by calling the full pair
    # but stopping after each pallas_call via small copies of the tail.
    inv, fwd = True, False
    F = field.name
    tw_c1 = jnp.asarray(ntt_mfa._packed_stage_twiddles(F, c1, inv))[:, None]
    w3_c1 = jnp.asarray(ntt_mfa._packed_w3_twiddles(F, c1, inv))[:, None]
    tw_r1 = jnp.asarray(ntt_mfa._packed_stage_twiddles(F, r1, inv))[:, None]
    w3_r1 = jnp.asarray(ntt_mfa._packed_w3_twiddles(F, r1, inv))[:, None]
    tw_c2 = jnp.asarray(ntt_mfa._packed_stage_twiddles(F, c2, fwd))[:, None]
    w3_c2 = jnp.asarray(ntt_mfa._packed_w3_twiddles(F, c2, fwd))[:, None]
    tw_r2 = jnp.asarray(ntt_mfa._packed_stage_twiddles(F, r2, fwd))[:, None]
    w3_r2 = jnp.asarray(ntt_mfa._packed_w3_twiddles(F, r2, fwd))[:, None]
    seed1, t01 = ntt_mfa._colpass_seeds(F, k, c1, inv, True, tr)
    seed1 = jnp.asarray(seed1)
    t01 = jnp.asarray(t01).reshape(r1 // tr, c1, 1)
    seed2, t02 = ntt_mfa._colpass_seeds(F, k, c2, fwd, False, tr)
    seed2 = jnp.asarray(seed2)
    t02 = jnp.asarray(t02).reshape(r2 // tr, c2, 1)
    pcol2, prow2 = ntt_mfa._pre_mul_tables(F, w_n % field.p, c2, r2, tr)
    pcol2 = jnp.asarray(pcol2)[:, None]
    prow2 = jnp.asarray(prow2)
    cparams = ntt_mfa._cparams()

    def pass_a1(x_pairs):
        x3 = x_pairs.reshape(c1, r1, wu)
        return pl.pallas_call(
            functools.partial(ntt_mfa._col_kernel_wire16, field=field,
                              c=c1, radix=4),
            grid=(r1 // tr, wu // tl),
            in_specs=[
                pl.BlockSpec((c1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c1, tr), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c1, 1), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c1, tr, tl), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tr, c1, tl), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tr, c1, tl), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((r1, c1, wu), jnp.uint32),
                jax.ShapeDtypeStruct((r1, c1, wu), jnp.uint32),
            ),
            compiler_params=cparams,
        )(tw_c1, w3_c1, seed1, t01, x3)

    def seam(lo1, hi1):
        return pl.pallas_call(
            functools.partial(ntt_mfa._seam_kernel_wire16, field=field,
                              r1=r1, radix=4),
            grid=(c1 // tr, wu // tl),
            in_specs=[
                pl.BlockSpec((r1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c2, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c2, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c2, tr), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c2, 1), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c2, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tr), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r1, tr, tl), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r1, tr, tl), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tr, c2, tl), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tr, c2, tl), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((r2, c2, wu), jnp.uint32),
                jax.ShapeDtypeStruct((r2, c2, wu), jnp.uint32),
            ),
            compiler_params=cparams,
        )(tw_r1, w3_r1, tw_c2, w3_c2, seed2, t02, pcol2, prow2, lo1, hi1)

    tl8 = tl // 8

    def pass_b2(lo2, hi2):
        return pl.pallas_call(
            functools.partial(ntt_mfa._row_kernel_wire16, field=field,
                              r=r2, radix=4),
            grid=(c2 // tr, wu // tl),
            in_specs=[
                pl.BlockSpec((r2, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r2, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r2, tr, tl), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r2, tr, tl), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((r2, tr, tl), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r2, tr, tl8), lambda i, j: (j, 0, i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((r2, c2, wu), jnp.uint32),
                jax.ShapeDtypeStruct((wu // tl, r2, c2, tl8), jnp.uint32),
            ),
            compiler_params=cparams,
        )(tw_r2, w3_r2, lo2, hi2)

    t_a1 = measure("a1_only", lambda x: pass_a1(x)[0], pairs)
    t_seam = measure("a1_seam", lambda x: seam(*pass_a1(x))[0], pairs)
    t_b2 = measure("a1_seam_b2",
                   lambda x: pass_b2(*seam(*pass_a1(x)))[0], pairs)
    t_full = measure(
        "a1_seam_b2_moveaxis",
        lambda x: (lambda s, bt: (s.reshape(k, wu),
                                  jnp.moveaxis(bt, 0, 2).reshape(
                                      k, wu // 8)))(
            *pass_b2(*seam(*pass_a1(x))))[1], pairs)
    emit(deltas=dict(a1=round(t_a1, 4), seam=round(t_seam - t_a1, 4),
                     b2=round(t_b2 - t_seam, 4),
                     moveaxis=round(t_full - t_b2, 4)))


if __name__ == "__main__":
    main()
