#!/usr/bin/env python3
"""Multi-PROCESS ``jax.distributed`` smoke on CPU — no TPU pod required.

The multi-host story (SURVEY §5.8) previously rested on a single-process
8-device dryrun plus analysis; this tool actually crosses a process
boundary: it launches ``--num-processes`` worker subprocesses on localhost,
each owning ``--local-devices`` virtual CPU devices, initializes
``jax.distributed`` (the same coordinator/barrier/collective machinery a
TPU pod uses, with DCN replaced by localhost gRPC), builds ONE global mesh
``{"data": num_processes, "signal": local_devices}``, and runs the
signal-sharded MODWT forward + inverse across it.

What this validates that the single-process dryrun cannot:
  * ``parallel.mesh.init_distributed`` really initializes and the global
    device list assembles across processes;
  * ``modwt_sharded``'s per-level halo ``ppermute`` executes across a
    process boundary (the ring's wrap edges live on different processes);
  * global arrays assemble from per-process shards
    (``jax.make_array_from_callback``) and parity holds: each process
    checks its addressable output shards against the single-device oracle
    and the cross-process roundtrip reproduces the input.

Usage:
    python tools/distributed_smoke.py                 # 2 procs × 4 devices
    python tools/distributed_smoke.py --num-processes 2 --local-devices 2 \
        --n 4096 --batch 4

Exit code 0 and a final ``{"ok": true, ...}`` JSON line on success.
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


# ---------------------------------------------------------------------------
# Worker (runs in each subprocess)
# ---------------------------------------------------------------------------

def worker(args) -> None:
    # Config updates (not env vars): a sitecustomize in this image re-pins
    # JAX_PLATFORMS at interpreter start, so the platform/device-count/
    # collectives choices must go through jax.config before first backend
    # use.  "gloo" is the CPU cross-process collectives backend — without
    # it the CPU client initializes single-process and ignores the
    # coordination service.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_enable_x64", True)

    sys.path.insert(0, str(REPO))
    from jwave_pro_tpu.parallel.mesh import init_distributed

    init_distributed(coordinator_address=args.coordinator,
                     num_processes=args.num_processes,
                     process_id=args.process_id)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import jwave_pro_tpu as jw
    from jwave_pro_tpu.parallel import make_mesh
    from jwave_pro_tpu.parallel.sharded import imodwt_sharded, modwt_sharded

    assert jax.process_count() == args.num_processes, (
        f"process_count={jax.process_count()} != {args.num_processes}")
    n_dev = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_dev == args.num_processes * n_local, (n_dev, n_local)

    # data axis = process boundary (DCN analog), signal axis = within-process
    # (ICI analog) — the layout init_distributed's docstring prescribes.
    # With batch < data-axis size this would fail; keep batch % procs == 0.
    mesh = make_mesh({"data": args.num_processes, "signal": n_local})
    w = jw.wavelet("Daubechies 4")
    level = args.level

    # Same full array in every process (same seed); the global device array
    # is assembled from per-process shards via make_array_from_callback.
    x_np = np.random.default_rng(7).standard_normal(
        (args.batch, args.n)).astype(np.float64)
    sharding = NamedSharding(mesh, P("data", "signal"))
    x = jax.make_array_from_callback(x_np.shape, sharding,
                                     lambda idx: x_np[idx])

    fwd = jax.jit(lambda v: modwt_sharded(v, w, level, mesh))
    inv = jax.jit(lambda c: imodwt_sharded(c, w, mesh))
    coeffs = fwd(x)
    back = inv(coeffs)

    # Parity 1: every ADDRESSABLE shard of the sharded forward matches the
    # single-device oracle computed on the replicated numpy input.
    oracle = np.asarray(jw.modwt(jnp.asarray(x_np), w, level,
                                 method="direct"))
    worst = 0.0
    for shard in coeffs.addressable_shards:
        ref = oracle[tuple(shard.index)]
        worst = max(worst, float(np.max(np.abs(np.asarray(shard.data) - ref))))

    # Parity 2: cross-process roundtrip reproduces the input.
    rt = 0.0
    for shard in back.addressable_shards:
        ref = x_np[tuple(shard.index)]
        rt = max(rt, float(np.max(np.abs(np.asarray(shard.data) - ref))))

    # Parity 3: a psum crossing the process boundary agrees with numpy.
    total = float(jnp.sum(coeffs[level]))
    ref_total = float(np.sum(oracle[level]))
    sum_err = abs(total - ref_total) / max(abs(ref_total), 1e-30)

    ok = worst < 1e-10 and rt < 1e-10 and sum_err < 1e-10
    print(json.dumps({
        "process": args.process_id, "devices": n_dev, "local": n_local,
        "fwd_max_abs_err": worst, "roundtrip_max_abs_err": rt,
        "global_sum_rel_err": sum_err, "ok": ok,
    }), flush=True)
    if not ok:
        sys.exit(1)


# ---------------------------------------------------------------------------
# Launcher
# ---------------------------------------------------------------------------

def launch(args) -> int:
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    procs = []
    for pid in range(args.num_processes):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={args.local_devices} "
            + env.get("XLA_FLAGS", ""))
        env.pop("JAX_PLATFORM_NAME", None)
        cmd = [sys.executable, __file__, "--worker",
               "--coordinator", coordinator,
               "--num-processes", str(args.num_processes),
               "--process-id", str(pid),
               "--local-devices", str(args.local_devices),
               "--n", str(args.n), "--batch", str(args.batch),
               "--level", str(args.level)]
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=str(REPO)))
    results, rc = [], 0
    for p in procs:
        try:
            out, err = p.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            rc = 2
        if p.returncode:
            rc = rc or p.returncode
        for line in out.splitlines():
            line = line.strip()
            if line.startswith("{"):
                results.append(json.loads(line))
        if p.returncode:
            sys.stderr.write(err[-2000:] + "\n")
    ok = rc == 0 and len(results) == args.num_processes and all(
        r["ok"] for r in results)
    print(json.dumps({
        "ok": ok, "num_processes": args.num_processes,
        "local_devices": args.local_devices,
        "global_devices": args.num_processes * args.local_devices,
        "results": results,
    }))
    return 0 if ok else (rc or 1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--level", type=int, default=5)
    ap.add_argument("--timeout", type=float, default=600.0)
    args = ap.parse_args()
    if args.worker:
        worker(args)
        return 0
    return launch(args)


if __name__ == "__main__":
    sys.exit(main())
