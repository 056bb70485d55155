#!/usr/bin/env python
"""Round-5 emit_pipeline A/B (the overlap tool the round-3/4 verdicts
named): pass B2 of the GF16 field pair rewritten with a MANUAL
pltpu.emit_pipeline over HBM refs, vs the production auto-pipelined
pallas_call, at the bench shape. If manual pipelining cannot beat the
automatic double-buffering, the remaining GF16 gap is VPU-serial
compute (stage arithmetic + relayouts), not scheduling.
Run: python tools/onchip_r5_emit.py
"""
import functools
import gc
import json
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from fastecc_tpu.fields import GF16  # noqa: E402
from fastecc_tpu.kernels import ntt_mfa  # noqa: E402
from fastecc_tpu.utils.timer import median, time_samples  # noqa: E402


def emit_row(**kw):
    print(json.dumps(kw), flush=True)


def main():
    emit_row(device=str(jax.devices()[0]))
    k, lanes = 1 << 13, 1 << 15
    field = GF16
    c1 = ntt_mfa._pair_default_c(k)
    r1 = k // c1
    c2, r2 = r1, c1
    tr, tl = ntt_mfa._tile_for(c1, r1, lanes)
    F = field.name
    tw_r2 = jnp.asarray(
        ntt_mfa._packed_stage_twiddles(F, r2, False))[:, None]
    w3_r2 = jnp.asarray(ntt_mfa._packed_w3_twiddles(F, r2, False))[:, None]
    col2 = jax.block_until_ready(
        jax.random.bits(jax.random.key(7), (r2, c2, lanes),
                        dtype=jnp.uint32) % jnp.uint32(field.p))
    grid = (c2 // tr, lanes // tl)

    def b2_auto(x):
        return pl.pallas_call(
            functools.partial(ntt_mfa._row_kernel, field=field, r=r2,
                              radix=4),
            grid=grid,
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
            compiler_params=ntt_mfa._cparams(),
        )(tw_r2, w3_r2, x)

    def b2_emit(x):
        def outer(tw_ref, w3_ref, x_hbm, out_hbm):
            def inner(x_blk, out_blk):
                ntt_mfa._row_kernel(tw_ref, w3_ref, x_blk, out_blk,
                                    field=field, r=r2, radix=4)

            pipe = pltpu.emit_pipeline(
                inner, grid=grid,
                in_specs=[pl.BlockSpec((r2, tr, tl),
                                       lambda i, j: (0, i, j))],
                out_specs=[pl.BlockSpec((r2, tr, tl),
                                        lambda i, j: (0, i, j))])
            pipe(x_hbm, out_hbm)

        return pl.pallas_call(
            outer,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((r2, c2, lanes), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(tw_r2, w3_r2, x)

    fa = jax.jit(b2_auto)
    fe = jax.jit(b2_emit)
    ya = fa(col2)
    ye = fe(col2)
    import numpy as np
    ok = bool(np.array_equal(np.asarray(ya), np.asarray(ye)))
    emit_row(check="b2_emit_bit_exact", ok=ok)
    del ya, ye
    if not ok:
        raise SystemExit("emit-pipeline B2 wrong on chip")
    for name, f in (("auto", fa), ("emit", fe)):
        s = time_samples(f, col2, iters=5)
        emit_row(metric=f"b2_{name}", single_s=round(median(s), 4),
                 s=[round(v, 4) for v in s])
        jax.clear_caches()
        gc.collect()


if __name__ == "__main__":
    main()
