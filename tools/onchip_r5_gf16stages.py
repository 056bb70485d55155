#!/usr/bin/env python
"""Round-5 GF16 field-pair per-pass breakdown (overlap directive).

Cumulative partial pipelines at the bench shape (k=2^13, L=2^15);
deltas of single-call medians locate the slow pass (dispatch cancels).
Memory bounds at 577 GB/s: A1 2 GB -> 3.5 ms; seam 2 GB -> 3.5 ms;
B2 2 GB -> 3.5 ms. Run: python tools/onchip_r5_gf16stages.py
"""
import gc
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from fastecc_tpu.fields import GF16  # noqa: E402
from fastecc_tpu.kernels import ntt_mfa  # noqa: E402
from fastecc_tpu.ntt import mul_prepared  # noqa: E402
from fastecc_tpu.utils.timer import median, time_samples  # noqa: E402

import functools  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    emit(device=str(jax.devices()[0]))
    k, lanes = 1 << 13, 1 << 15
    field = GF16
    w_n = field.root_of_order(2 * k)
    data = jax.block_until_ready(
        jax.random.bits(jax.random.key(2), (k, lanes), dtype=jnp.uint32)
        & jnp.uint32(0xFFFF))

    c1 = ntt_mfa._pair_default_c(k)
    r1 = k // c1
    c2, r2 = r1, c1
    tr, tl = ntt_mfa._tile_for(c1, r1, lanes)
    emit(shape=dict(k=k, lanes=lanes, c1=c1, r1=r1, tr=tr, tl=tl))
    F = field.name
    inv, fwd = True, False
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
    pcol2, prow2 = jnp.asarray(pcol2)[:, None], jnp.asarray(prow2)
    cparams = ntt_mfa._cparams()

    def vec_specs(c):
        return [
            pl.BlockSpec((c, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, tr), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    def pass_a1(x):
        x3 = x.reshape(c1, r1, lanes)
        return pl.pallas_call(
            functools.partial(ntt_mfa._col_kernel, field=field, c=c1,
                              radix=4),
            grid=(r1 // tr, lanes // tl),
            in_specs=vec_specs(c1) + [
                pl.BlockSpec((c1, tr, tl), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tr, c1, tl), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((r1, c1, lanes), jnp.uint32),
            compiler_params=cparams,
        )(tw_c1, w3_c1, seed1, t01, x3)

    def seam(col1):
        s_specs = [
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
        ]
        return pl.pallas_call(
            functools.partial(ntt_mfa._seam_kernel, field=field, r1=r1,
                              radix=4),
            grid=(c1 // tr, lanes // tl),
            in_specs=s_specs,
            out_specs=pl.BlockSpec((tr, c2, tl), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((r2, c2, lanes), jnp.uint32),
            compiler_params=cparams,
        )(tw_r1, w3_r1, tw_c2, w3_c2, seed2, t02, pcol2, prow2, col1)

    def pass_b2(col2):
        return pl.pallas_call(
            functools.partial(ntt_mfa._row_kernel, field=field, r=r2,
                              radix=4),
            grid=(c2 // tr, lanes // tl),
            in_specs=[
                pl.BlockSpec((r2, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r2, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r2, tr, tl), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((r2, tr, tl), lambda i, j: (0, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((r2, c2, lanes), jnp.uint32),
            compiler_params=cparams,
        )(tw_r2, w3_r2, col2)

    stages = {
        "a1": lambda x: pass_a1(x),
        "a1_seam": lambda x: seam(pass_a1(x)),
        "full": lambda x: pass_b2(seam(pass_a1(x))),
    }
    meds = {}
    for name, fn in stages.items():
        f = jax.jit(fn)
        s = time_samples(f, data, iters=5)
        meds[name] = median(s)
        emit(metric=f"gf16_{name}", single_s=round(meds[name], 4),
             s=[round(v, 4) for v in s])
        jax.clear_caches()
        gc.collect()
    emit(deltas=dict(a1=round(meds["a1"], 4),
                     seam=round(meds["a1_seam"] - meds["a1"], 4),
                     b2=round(meds["full"] - meds["a1_seam"], 4)))


if __name__ == "__main__":
    main()
