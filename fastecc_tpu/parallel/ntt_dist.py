"""Mesh-sharded four-step NTT: one transform spanning devices/hosts.

This is the rebuild's replacement for the reference's cache-blocked MFA
NTT + OpenMP (SURVEY.md C9/C19->C20): the same four-step decomposition,
but the matrix transposes between phases are ``jax.lax.all_to_all``
collectives over the ``coeff`` mesh axis (ICI), so a single 2^20-point
GF(p) transform spans N >= 2 hosts ([BASELINE] north star + config :11).

Decomposition (same convention as ntt.ntt_four_step, n = r + R*c,
k = k_c + C*k_r, natural order in and out, 'coeff' axis size D):

  local view start      [C/D, R, L]   (natural input, c-slabs per device)
  all_to_all #1    ->   [C, R/D, L]   localize the c axis
  local NTT_C (axis 0)               Stockham, full C on-device
  twiddle w_N^(k_c * r)              host table, sharded over r
  all_to_all #2    ->   [C/D, R, L]   localize the r axis
  local NTT_R (axis 1)               full R on-device
  transpose+reshape ->  [N/D, L]      natural output, k_r-slabs per device

Lanes (axis 1) shard over the ``block`` mesh axis with no communication.

The distributed RS encode uses the coset trick (rs.encode_parity): both
NTTs are the same length k, so the whole encode needs exactly the
all_to_alls of two transforms and zero resharding between them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import gf
from ..fields import FieldSpec
from ..ntt import _four_step_twiddles, _log2, mul_prepared, ntt
from ..rs import _check_kn


def _local_ntt(y, field: FieldSpec, inverse: bool, use_pallas: bool):
    """Per-device NTT along axis 0 of a [T, A, L] shard-local block.

    Trailing axes are independent lanes, so flatten them and run the fused
    two-pass Pallas kernel when the MESH devices are TPUs (the staged jnp
    path would cost log2(T) HBM passes per local transform); on CPU
    meshes and for unsupported shapes, the staged jnp path. Bit-exact
    either way. ``use_pallas`` must come from the mesh's device platform,
    NOT jax.default_backend(): a CPU-device mesh on a TPU-default process
    (cli scaling / dryrun on a short-chip host) would otherwise emit
    pallas_call into a CPU compilation and fail.
    """
    from ..kernels import ntt_mfa

    t, a, lanes = y.shape
    y2 = y.reshape(t, a * lanes)
    if use_pallas and ntt_mfa._supported(t, a * lanes):
        out = ntt_mfa.ntt_pallas(y2, field, inverse=inverse, scale=False)
    else:
        out = ntt(y2, field, inverse=inverse, scale=False)
    return out.reshape(t, a, lanes)


def _split_dims(n: int, d: int, c_dim: int | None):
    t = _log2(n)
    if c_dim is None:
        c_dim = max(d, 1 << (t // 2))
    r_dim = n // c_dim
    assert c_dim * r_dim == n
    assert c_dim % d == 0 and r_dim % d == 0, (
        f"coeff axis {d} must divide both C={c_dim} and R={r_dim} "
        f"(need N >= D^2; N={n}, D={d})")
    return c_dim, r_dim


def ntt_sharded(x, field: FieldSpec, mesh: Mesh, inverse: bool = False,
                c_dim: int | None = None, scale: bool = True,
                input_transposed: bool = False,
                output_transposed: bool = False):
    """N-point NTT along axis 0 of [N, L], sharded P('coeff', 'block').

    Bit-exact equal to the single-chip ``ntt.ntt`` (natural order in/out);
    input may have any sharding (constrained on entry), output is
    P('coeff', 'block').

    Transposed-layout handoff (the all_to_all fusion): the four-step's
    final collective only re-shards the finished natural-order result
    from inner-axis (k_c) to outer-axis (k) slabs — the VALUES are done
    after the second local NTT. ``output_transposed=True`` skips it and
    returns the natural array viewed [R, C, L] with the INNER axis
    sharded (P(None, 'coeff', 'block')); ``input_transposed=True``
    accepts exactly that layout ([A, B, L], logical m = A-major) and
    skips its own first collective by choosing the split (C=A, R=B).
    Chaining transform -> elementwise -> transform through this handoff
    saves two of six all_to_alls per pair — the iNTT->coset-NTT seam in
    the distributed RS encode and the iNTT->NTT seam in decode.
    """
    d = mesh.shape["coeff"]
    lanes = x.shape[-1]
    if input_transposed:
        assert x.ndim == 3, "transposed layout is [A, B, L]"
        c_in, r_in = x.shape[0], x.shape[1]   # split is fixed by layout
        assert c_dim is None or c_dim == c_in
        c_dim, r_dim = c_in, r_in
        n = c_dim * r_dim
        assert c_dim % d == 0 and r_dim % d == 0, (
            f"coeff axis {d} must divide both axes of the transposed "
            f"input {x.shape[:2]}")
    else:
        n = x.shape[0]
        if d > 1:
            c_dim, r_dim = _split_dims(n, d, c_dim)
    use_pallas = mesh.devices.flat[0].platform == "tpu"

    if d == 1:
        xn = x.reshape(n, lanes)   # transposed layout IS natural, row-major
        out = _local_ntt(xn[:, None, :], field, inverse,
                         use_pallas)[:, 0, :]
        if inverse and scale:
            out = gf.mul_const(field, out, field.inv_host(n))
        if output_transposed:
            cd = c_dim or 1 << (_log2(n) // 2)
            return jax.lax.with_sharding_constraint(
                out.reshape(n // cd, cd, lanes),
                NamedSharding(mesh, P(None, "coeff", "block")))
        return jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P("coeff", "block")))

    tw = jnp.asarray(_four_step_twiddles(field.name, n, c_dim, inverse))

    def body(xl, twl):
        # xl: [C/D, R, L_b] (c-slab), twl: [C, R/D] (r-slab of the table)
        if input_transposed:
            y = xl                                       # [C, R/D, L_b]
        else:
            y = jax.lax.all_to_all(xl, "coeff", split_axis=1,
                                   concat_axis=0, tiled=True)
        y = _local_ntt(y, field, inverse, use_pallas)    # axis 0: c -> k_c
        y = mul_prepared(field, y, twl[:, :, None])      # w_N^(k_c * r)
        y = jax.lax.all_to_all(y, "coeff", split_axis=0, concat_axis=1,
                               tiled=True)               # [C/D, R, L_b]
        y = jnp.moveaxis(y, 1, 0)                        # [R, C/D, L_b]
        y = _local_ntt(y, field, inverse, use_pallas)    # axis 0: r -> k_r
        if output_transposed:
            if inverse and scale:
                y = gf.mul_const(field, y, field.inv_host(n))
            return y                                     # [R, C/D, L_b]
        y = jax.lax.all_to_all(y, "coeff", split_axis=0, concat_axis=1,
                               tiled=True)               # [R/D, C, L_b]
        # local slab is k = k_c + C*k_r for k_r in this device's range:
        # row-major reshape gives the natural contiguous k-slab.
        out = y.reshape((r_dim // d) * c_dim, -1)
        if inverse and scale:
            out = gf.mul_const(field, out, field.inv_host(n))
        return out

    # check_vma=False: Pallas out_shapes carry no varying-mesh-axes info,
    # which the vma checker (default-on) rejects inside shard_map.
    in_spec = (P(None, "coeff", "block") if input_transposed
               else P("coeff", None, "block"))
    out_spec = (P(None, "coeff", "block") if output_transposed
                else P("coeff", "block"))
    shmap = jax.shard_map(
        body, mesh=mesh, in_specs=(in_spec, P(None, "coeff")),
        out_specs=out_spec, check_vma=False)
    xr = jax.lax.with_sharding_constraint(
        x if input_transposed else x.reshape(c_dim, r_dim, lanes),
        NamedSharding(mesh, in_spec))
    out = shmap(xr, tw)
    if output_transposed:
        return out                                       # [R, C, L] global
    return out.reshape(n, lanes)


ntt_sharded_jit = jax.jit(
    ntt_sharded, static_argnames=("field", "mesh", "inverse", "c_dim",
                                  "scale", "input_transposed",
                                  "output_transposed"))


def ntt_sharded_overlap(x, field: FieldSpec, mesh: Mesh,
                        inverse: bool = False, c_dim: int | None = None,
                        scale: bool = True, chunks: int = 2):
    """Collective/compute-overlap variant of :func:`ntt_sharded`
    (software-pipelined double buffering).

    The lane axis is split into ``chunks`` independent slices inside the
    shard_map body, and each phase issues chunk i+1's all_to_all BEFORE
    computing chunk i — the collective and the local NTT have no data
    dependence, so the XLA scheduler is free to run the ICI transfer
    under the VPU work (the classic overlap structure; on one chip this
    is unobservable, on a pod it hides up to the full transpose cost).
    Bit-exact equal to ntt_sharded (test-enforced on the virtual mesh).
    """
    n, lanes = x.shape
    d = mesh.shape["coeff"]
    if d == 1 or chunks <= 1:
        return ntt_sharded(x, field, mesh, inverse=inverse, c_dim=c_dim,
                           scale=scale)
    c_dim, r_dim = _split_dims(n, d, c_dim)
    b = mesh.shape.get("block", 1)
    assert lanes % (b * chunks) == 0, (
        f"lanes {lanes} must split into {chunks} chunks per block shard")
    tw = jnp.asarray(_four_step_twiddles(field.name, n, c_dim, inverse))
    use_pallas = mesh.devices.flat[0].platform == "tpu"

    def a2a_in(c):
        return jax.lax.all_to_all(c, "coeff", split_axis=1, concat_axis=0,
                                  tiled=True)

    def a2a_mid(c):
        return jax.lax.all_to_all(c, "coeff", split_axis=0, concat_axis=1,
                                  tiled=True)

    def body(xl, twl):
        cs = jnp.split(xl, chunks, axis=2)
        # phase 1: prefetch chunk i+1's transpose while transforming i
        nxt = a2a_in(cs[0])
        mids = []
        for i in range(chunks):
            cur, nxt = nxt, (a2a_in(cs[i + 1]) if i + 1 < chunks else None)
            y = _local_ntt(cur, field, inverse, use_pallas)
            mids.append(mul_prepared(field, y, twl[:, :, None]))
        # phase 2: same structure for the second transpose + row NTTs
        nxt = a2a_mid(mids[0])
        outs = []
        for i in range(chunks):
            cur, nxt = nxt, (a2a_mid(mids[i + 1]) if i + 1 < chunks
                             else None)
            y = _local_ntt(jnp.moveaxis(cur, 1, 0), field, inverse,
                           use_pallas)
            y = jax.lax.all_to_all(y, "coeff", split_axis=0,
                                   concat_axis=1, tiled=True)
            outs.append(y.reshape((r_dim // d) * c_dim, -1))
        out = jnp.concatenate(outs, axis=1)
        if inverse and scale:
            out = gf.mul_const(field, out, field.inv_host(n))
        return out

    shmap = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("coeff", None, "block"), P(None, "coeff")),
        out_specs=P("coeff", "block"), check_vma=False)
    xr = jax.lax.with_sharding_constraint(
        x.reshape(c_dim, r_dim, lanes),
        NamedSharding(mesh, P("coeff", None, "block")))
    return shmap(xr, tw).reshape(n, lanes)


ntt_sharded_overlap_jit = jax.jit(
    ntt_sharded_overlap, static_argnames=("field", "mesh", "inverse",
                                          "c_dim", "scale", "chunks"))


def encode_parity_sharded(data, field: FieldSpec, mesh: Mesh,
                          n: int | None = None):
    """Distributed RS parity: iNTT_k -> coset twiddle -> NTT_k, all
    sharded; matches rs.encode_parity bit-exactly (row order included).

    Communication: the iNTT hands its result to each coset NTT in the
    transposed layout (see ntt_sharded), so the seam between them costs
    ZERO collectives — the whole c=2 encode runs 4 all_to_alls instead of
    the naive 6 (2 per transform instead of 3). The iNTT's k^-1 scale is
    folded into the coset twiddle table (rs._coset_twiddles_scaled), and
    the coset multiply itself is an elementwise op on the sharded layout.
    """
    from ..rs import _coset_twiddles_scaled

    k = data.shape[0]
    n = 2 * k if n is None else n
    _check_kn(k, n)
    c = n // k
    lanes = data.shape[1]
    d = mesh.shape["coeff"]
    spec = NamedSharding(mesh, P("coeff", "block"))
    coeffs_t = ntt_sharded(data, field, mesh, inverse=True, scale=False,
                           output_transposed=True)       # [R, C, L]
    r_dim, c_dim = coeffs_t.shape[0], coeffs_t.shape[1]
    tws = jnp.asarray(_coset_twiddles_scaled(field.name, n, k))
    cosets = []
    for r in range(1, c):
        # natural index m = k_c + C*k_r: the [k] table viewed [R, C]
        tw_t = jax.lax.with_sharding_constraint(
            tws[r - 1].reshape(r_dim, c_dim, 1),
            NamedSharding(mesh, P(None, "coeff", None)))
        prod = mul_prepared(field, coeffs_t, tw_t)
        cosets.append(ntt_sharded(prod, field, mesh,
                                  input_transposed=True))
    stacked = jnp.stack(cosets, axis=1)                  # [k, c-1, L]
    out = stacked.reshape(n - k, lanes)
    return jax.lax.with_sharding_constraint(out, spec)


encode_parity_sharded_jit = jax.jit(
    encode_parity_sharded, static_argnames=("field", "mesh", "n"))


def decode_prepared_sharded(codeword, mask, l_eval_prep, lp_inv_prep,
                            field: FieldSpec, mesh: Mesh):
    """Distributed erasure decode (device half), sharded P('coeff','block').

    Same math as decode.decode_prepared — multiply by the locator
    evaluations (zero at erased rows, so masking is implicit), iNTT_n,
    the UNSHIFTED x*d/dx multiply, NTT_n, Forney divide by the x*l'
    table — with both [n, lanes] transforms running as mesh-sharded
    four-step NTTs (all_to_all over 'coeff'). The [n] tables come from
    decode.prepare_decode_tables. Bit-exact equal to the single-device
    path (test-enforced on the virtual CPU mesh).
    """
    from ..decode import _xderiv_consts

    n = codeword.shape[0]
    spec_cw = NamedSharding(mesh, P("coeff", "block"))
    spec_vec = NamedSharding(mesh, P("coeff"))
    cw = jax.lax.with_sharding_constraint(codeword, spec_cw)
    mask = jax.lax.with_sharding_constraint(mask, spec_vec)
    l_eval_prep = jax.lax.with_sharding_constraint(l_eval_prep, spec_vec)
    lp_inv_prep = jax.lax.with_sharding_constraint(lp_inv_prep, spec_vec)

    maskb = (mask == 1)[:, None]
    h_eval = gf.mul_prepared_device(field, cw, l_eval_prep[:, None])
    # transposed-layout seam between the two transforms: the derivative
    # multiply is elementwise, so it runs on the inner-axis-sharded
    # intermediate and the iNTT->NTT pair costs 4 all_to_alls, not 6
    h_coeffs_t = ntt_sharded(h_eval, field, mesh, inverse=True,
                             output_transposed=True)     # [R, C, L]
    r_dim, c_dim = h_coeffs_t.shape[0], h_coeffs_t.shape[1]
    dx = jnp.asarray(_xderiv_consts(field.name, n))
    dx_t = jax.lax.with_sharding_constraint(
        dx.reshape(r_dim, c_dim, 1),
        NamedSharding(mesh, P(None, "coeff", None)))
    h_der_t = gf.mul_prepared_device(field, h_coeffs_t, dx_t)
    hp_eval = ntt_sharded(h_der_t, field, mesh, input_transposed=True)
    recovered = gf.mul_prepared_device(field, hp_eval, lp_inv_prep[:, None])
    out = jnp.where(maskb, recovered, cw)
    return jax.lax.with_sharding_constraint(out, spec_cw)


decode_prepared_sharded_jit = jax.jit(
    decode_prepared_sharded, static_argnames=("field", "mesh"))


def decode_sharded(codeword, erased_idx, field: FieldSpec, mesh: Mesh):
    """Full distributed decode: host-built locator tables + sharded device
    program. ``erased_idx`` must be concrete host values (numpy)."""
    from ..decode import prepare_decode_tables

    n = codeword.shape[0]
    mask, lp, ip = prepare_decode_tables(erased_idx, n, field)
    return decode_prepared_sharded_jit(codeword, mask, lp, ip, field, mesh)
