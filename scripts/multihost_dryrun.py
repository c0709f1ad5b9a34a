"""Multi-host dryrun: N real processes, one mesh over DCN + ICI (simulated).

Spawns N child processes, each with `chips` virtual CPU devices, joined into
one JAX multi-controller job via jax.distributed.initialize. Every process
runs the SAME SPMD program (the TP-fused engine) over the GLOBAL
(1, hosts*chips) model mesh — per-layer psums cross the simulated DCN
boundary — and over a (hosts, chips) data×model mesh (GSPMD fallback path).
Process 0 checks TP logits against a locally-computed single-host reference.

Usage: python scripts/multihost_dryrun.py [n_hosts] [chips_per_host]
Exit 0 and a final "multihost_dryrun OK" line on success.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child(n_hosts: int, chips: int, proc_id: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={chips}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ggllm_tpu.parallel.mesh import init_distributed, make_mesh

    init_distributed(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=n_hosts, process_id=proc_id)
    assert jax.process_count() == n_hosts
    assert len(jax.devices()) == n_hosts * chips
    assert len(jax.local_devices()) == chips

    import numpy as np

    from ggllm_tpu.core.config import EngineConfig, FalconHParams
    from ggllm_tpu.core.dtypes import GGMLType
    from ggllm_tpu.engine.engine import FalconEngine
    from ggllm_tpu.io.ggcc import read_model
    from ggllm_tpu.io.loader import load_params
    from ggllm_tpu.utils.synthetic import write_tiny_model
    import tempfile

    cfg = EngineConfig(n_ctx=64, n_batch=16, kv_dtype="float32",
                       compute_dtype="float32", weight_mode="fused")
    with tempfile.TemporaryDirectory() as td:
        # every process writes the identical file (same seed)
        path = os.path.join(td, "m.ggcc")
        write_tiny_model(path, FalconHParams.tiny(), ftype_2d=GGMLType.Q8_0,
                         seed=77)
        mf = read_model(path)
        prompt = [5, 17, 130, 42, 99, 260, 31, 7]

        # single-host reference on this process's local view (replicated
        # weights, no mesh) — purely host-side comparison data
        cfg_ref = EngineConfig(n_ctx=64, n_batch=16, kv_dtype="float32",
                               compute_dtype="float32", weight_mode="fused",
                               kernel_layout=True)
        ref_logits = FalconEngine(
            mf.hparams, load_params(mf, cfg_ref), cfg_ref).eval(prompt)

        # 1) cross-host TP: ONE model axis spanning all hosts' chips — the
        #    per-layer psum crosses the DCN boundary (180B pattern)
        tp_mesh = make_mesh(data=1, model=n_hosts * chips)
        tp_engine = FalconEngine(
            mf.hparams, load_params(mf, cfg, mesh=tp_mesh), cfg, mesh=tp_mesh)
        assert tp_engine.tp_plan is not None
        tp_logits = tp_engine.eval(prompt)
        scale = np.abs(ref_logits).max() + 1e-6
        np.testing.assert_allclose(tp_logits / scale, ref_logits / scale,
                                   atol=5e-4)
        tp_engine.eval([int(np.argmax(tp_logits))])  # decode step

        # 2) (hosts, chips) = (data, model) mesh: model collectives stay
        #    intra-host, data axis crosses DCN (GSPMD fallback path)
        dm_mesh = make_mesh(data=n_hosts, model=chips)
        dm_engine = FalconEngine(
            mf.hparams, load_params(mf, cfg), cfg, batch_size=n_hosts,
            mesh=dm_mesh)
        dm_logits = dm_engine.eval(prompt)
        np.testing.assert_allclose(dm_logits / scale, ref_logits / scale,
                                   atol=5e-4)

    if proc_id == 0:
        print(f"multihost child OK: {n_hosts} hosts x {chips} chips, "
              f"TP-over-DCN + (data x model)", flush=True)


def main(n_hosts: int = 2, chips: int = 4) -> None:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for i in range(n_hosts):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "--child", str(n_hosts), str(chips),
             str(i), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        if p.returncode != 0:
            ok = False
            print(f"--- process {i} failed (rc={p.returncode}) ---")
            print(out.decode(errors="replace")[-4000:])
        elif i == 0:
            tail = out.decode(errors="replace").strip().splitlines()
            print("\n".join(tail[-2:]))
    if not ok:
        sys.exit(1)
    print(f"multihost_dryrun OK: {n_hosts} processes x {chips} devices")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
              int(sys.argv[5]))
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 2,
             int(sys.argv[2]) if len(sys.argv) > 2 else 4)
