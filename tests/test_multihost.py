"""Multi-controller (multi-process) sharded codec runs — config :11 shape.

Spawns separate OS processes, each owning its own slice of virtual CPU
devices, and runs one NTT, one full RS encode, and one erasure decode
over a mesh whose axes span the process boundary: the all_to_all
transposes cross processes over Gloo (the CPU stand-in for DCN). This
exercises the real multi-controller code path (jax.distributed.initialize
+ make_array_from_callback + cross-process collectives); a TPU pod swaps
the backend, not the program ([BASELINE] config :11, docs/DISTRIBUTED.md).

Two geometries, per the round-3 verdict directive 8:
- 2 processes x 4 devices, mesh (8, 1): one transform spans both
  processes on the coeff axis (round-2 shape).
- 4 processes x 1 device, mesh (2, 2): BOTH mesh axes cross process
  boundaries — the coeff all_to_all and the block-axis sharding each
  ride Gloo, the 2x2 coeff-x-block process grid.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    proc_id = int(sys.argv[1]); port = sys.argv[2]
    nprocs = int(sys.argv[3]); local_devs = int(sys.argv[4])
    mesh_coeff = int(sys.argv[5]); mesh_block = int(sys.argv[6])
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devs}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=proc_id)
    import numpy as np, jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fastecc_tpu.fields import GF32
    from fastecc_tpu.ntt import ntt_host
    from fastecc_tpu.parallel import make_mesh
    from fastecc_tpu.parallel.ntt_dist import (
        encode_parity_sharded_jit, ntt_sharded_jit)

    assert jax.process_count() == nprocs
    assert jax.device_count() == nprocs * local_devs
    mesh = make_mesh(mesh_coeff, mesh_block)
    n, lanes = 1 << 10, 8
    rng = np.random.default_rng(0)
    x = rng.integers(0, GF32.p, (n, lanes), dtype=np.uint64).astype(
        np.uint32)
    sh = NamedSharding(mesh, P("coeff", "block"))
    xg = jax.make_array_from_callback((n, lanes), sh, lambda i: x[i])
    y = ntt_sharded_jit(xg, GF32, mesh)
    want = ntt_host(x, GF32)
    assert all((np.asarray(s.data) == want[s.index]).all()
               for s in y.addressable_shards), "NTT shard mismatch"

    k = n // 2
    dg = jax.make_array_from_callback((k, lanes), sh, lambda i: x[:k][i])
    par = encode_parity_sharded_jit(dg, GF32, mesh, n)
    from fastecc_tpu import rs
    pw = np.asarray(rs.encode_parity_jit(jnp.asarray(x[:k]), GF32, n))
    assert all((np.asarray(s.data) == pw[s.index]).all()
               for s in par.addressable_shards), "encode shard mismatch"

    # decode leg: garble n-k rows, recover across ALL processes
    # (the fused 4-collective two-transform pipeline over Gloo)
    from fastecc_tpu.decode import prepare_decode_tables
    from fastecc_tpu.parallel.ntt_dist import decode_prepared_sharded_jit
    cw = np.asarray(rs.encode_jit(jnp.asarray(x[:k]), GF32, n))
    e = n - k
    erased = np.sort(rng.choice(n, size=e, replace=False))
    garbled = cw.copy()
    garbled[erased] = rng.integers(0, GF32.p, (e, lanes),
                                   dtype=np.uint64).astype(np.uint32)
    mask, lp, ip = (np.asarray(t) for t in
                    prepare_decode_tables(erased, n, GF32,
                                          locator="host"))
    vsh = NamedSharding(mesh, P("coeff"))
    def gv(a, spec):
        return jax.make_array_from_callback(a.shape, spec,
                                            lambda i: a[i])
    out = decode_prepared_sharded_jit(
        gv(garbled, sh), gv(mask, vsh), gv(lp, vsh), gv(ip, vsh),
        GF32, mesh)
    assert all((np.asarray(s.data) == cw[s.index]).all()
               for s in out.addressable_shards), "decode shard mismatch"
    print(f"proc {proc_id}: OK")
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_controllers(tmp_path, nprocs: int, local_devs: int,
                     mesh_coeff: int, mesh_block: int):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = str(_free_port())
    env = dict(os.environ)
    # the workers configure their own backend; drop conftest's influence
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    argv_tail = [port, str(nprocs), str(local_devs), str(mesh_coeff),
                 str(mesh_block)]
    procs = [subprocess.Popen(
                 [sys.executable, str(worker), str(i)] + argv_tail,
                 env=env, stdout=subprocess.PIPE,
                 stderr=subprocess.STDOUT, text=True)
             for i in range(nprocs)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=550)
            outs.append(out)
    finally:
        # a timeout on one proc must not orphan the rest (they hold the
        # coordinator port and would poison later runs)
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i}: OK" in out


def test_two_controller_sharded_codec(tmp_path):
    """2 procs x 4 devices, mesh (8,1): coeff axis spans both."""
    _run_controllers(tmp_path, nprocs=2, local_devs=4,
                     mesh_coeff=8, mesh_block=1)


def test_cli_scaling_multiproc_row(tmp_path, capsys):
    """`cli scaling --procs 4 --update-baseline` emits the structural
    2x2 row (phase walls + all_to_all counts + bit-exactness) and
    appends the virtual-tagged line to BASELINE.md (round-5 verdict
    directive 7)."""
    import json as _json

    from fastecc_tpu import cli
    bp = tmp_path / "BASELINE.md"
    bp.write_text("# BASELINE\n")
    rc = cli.main(["scaling", "--procs", "4", "--update-baseline",
                   "--baseline-path", str(bp)])
    assert rc == 0
    row = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["virtual"] and row["bit_exact"]
    assert row["all_to_all"] == {"ntt": 3, "encode": 4, "decode": 4}
    text = bp.read_text()
    assert "Multihost structural proxies" in text
    assert "4-process 2x2 Gloo mesh" in text


def test_four_controller_2x2_mesh(tmp_path):
    """4 procs x 1 device, mesh (2,2): BOTH axes cross processes — the
    coeff all_to_all AND the block-axis sharding ride Gloo (verdict r3
    directive 8, the 2x2 coeff-x-block process grid)."""
    _run_controllers(tmp_path, nprocs=4, local_devs=1,
                     mesh_coeff=2, mesh_block=2)
