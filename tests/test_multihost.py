"""Multi-host (multi-process) data-parallel CI coverage.

The reference never tests DDP in CI (SURVEY.md §4: "Multi-GPU / multi-node:
NOT tested"); this does better — a genuine 2-process jax.distributed run
over Gloo CPU collectives, driving the full Trainer (striped loaders, global
mesh, replicated params, implicit grad all-reduce).
"""

import os
import socket
import subprocess
import sys


WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_trainer():
    port = _free_port()
    env = {
        **os.environ,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_PLATFORMS": "cpu",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        fields = dict(kv.split("=") for kv in line.split()[1:])
        results[fields["pid"]] = fields
    # replicated state must be bit-identical across hosts; so must the
    # (replicated) loss and eval metrics
    assert results["0"]["checksum"] == results["1"]["checksum"]
    assert results["0"]["loss"] == results["1"]["loss"]
    assert results["0"]["ndcg"] == results["1"]["ndcg"]
    assert float(results["0"]["ndcg"]) >= 0.0
