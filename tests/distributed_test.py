"""Multi-host bring-up test: 2 real processes, one global 8-device mesh.

The TPU-native analogue of the reference running a real websocket server
inside the test suite (tests/common.py:225-241): two OS processes join via
jax.distributed (Gloo CPU collectives), build a global mesh of 2x4 virtual
CPU devices, and run identical aggregation passes; each process's devices
own a distinct row shard and the replica merge reduces across processes.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
sys.path.insert(0, {repo!r})
import vaex_tpu.parallel.distributed as vdist
vdist.initialize("127.0.0.1:" + port, num_processes=2, process_id=pid)
assert vdist.is_initialized()
assert vdist.process_count() == 2 and vdist.process_index() == pid

import numpy as np
import vaex_tpu as vaex
from vaex_tpu.execution import ExecutorLocal, set_main_executor
from vaex_tpu.parallel.mesh import mesh_process_count

mesh = vdist.global_mesh()
assert mesh.devices.size == 8, mesh
assert mesh_process_count(mesh) == 2
set_main_executor(ExecutorLocal(mesh=mesh))

rng = np.random.RandomState(0)
n = 10_000
x = rng.normal(0, 1, n)
v = rng.uniform(0, 1, n)
df = vaex.from_arrays(x=x, v=v)
count = np.asarray(df.count(binby="x", limits=[-3, 3], shape=16), dtype=np.float64)
total = float(df.sum("v", selection="x > 0"))
mean = np.nan_to_num(np.asarray(df.mean("v", binby="x", limits=[-3, 3], shape=8),
                                dtype=np.float64))
n_passes = df.executor.passes
print("RESULT " + json.dumps(dict(pid=pid, count=count.tolist(), sum=total,
                                  mean=mean.tolist(), passes=n_passes)), flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_global_mesh(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO))
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_THREADS")}
    procs = [subprocess.Popen([sys.executable, str(script), str(pid), port],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True, env=env, cwd=str(tmp_path))
             for pid in (0, 1)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}

    # numpy oracle
    rng = np.random.RandomState(0)
    n = 10_000
    x = rng.normal(0, 1, n)
    v = rng.uniform(0, 1, n)
    edges = np.linspace(-3, 3, 17)
    inside = (x >= -3) & (x < 3)
    ref_count, _ = np.histogram(x[inside], bins=edges)
    got = np.asarray(results[0]["count"])
    # parity: max value may land in the overflow edge bin
    assert abs(got.sum() - inside.sum()) <= 2
    np.testing.assert_allclose(got[:-1], ref_count[:-1], atol=2)
    assert results[0]["sum"] == pytest.approx(v[x > 0].sum(), rel=1e-6)
    # both processes compute identical results (SPMD)
    assert results[0]["count"] == results[1]["count"]
    assert results[0]["sum"] == pytest.approx(results[1]["sum"], rel=0)
    assert results[0]["mean"] == results[1]["mean"]
