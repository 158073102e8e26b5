"""Multi-process (multi-host analogue) execution: 2 CPU processes x 4
virtual devices, Gloo collectives over the process boundary.

Exercises the REAL multi-host code path (SURVEY.md section 2.3 /
BASELINE config 5): ``jax.distributed.initialize``, a global 8-device
``pixels`` mesh spanning both processes, process-local data feeding
(``make_array_from_process_local_data``), the sharded palette pipeline
with process-spanning ``psum``, per-strip dither, and local result
readback. Compared against the same program on a single-process 8-device
mesh — identical mesh partitioning, so palettes must agree tightly.
"""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np

REPO = str(pathlib.Path(__file__).resolve().parent.parent)

WORKER = r"""
import os, sys
port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
import numpy as np
sys.path.insert(0, %(repo)r)
from patolette_tpu.parallel import distributed as D

mesh = D.make_global_mesh()
assert mesh.devices.size == 8, mesh.devices

W, H, P = 16, 32, 8
n = W * H
rng = np.random.default_rng(0)
colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
weights = rng.uniform(1, 2, (n,)).astype(np.float32)

half = n // 2
lo, hi = pid * half, (pid + 1) * half
channels = D.put_planar_local(colors[lo:hi], mesh, n)
w = D.put_pixels_local(weights[lo:hi], mesh, n)

fn = D.quantize_palette_distributed(
    mesh, P, color_space=2, kmeans_niter=2, seed=1234, planar=True,
    with_map=True,
)
pal, valid, pmap = fn(channels, w)

dfn = D.dither_distributed(mesh, W, H, 2, segment=64, planar=True)
dmap = dfn(channels, pal, valid)

if pid == 0:
    np.save(f"{outdir}/pal.npy", np.asarray(pal))
    np.save(f"{outdir}/valid.npy", np.asarray(valid))
np.save(f"{outdir}/map{pid}.npy", D.local_shard(pmap))
np.save(f"{outdir}/dmap{pid}.npy", D.local_shard(dmap))
print(f"pid={pid} done", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_matches_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER % {"repo": REPO})

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("PYTEST_CURRENT_TEST", None)

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    pal2 = np.load(tmp_path / "pal.npy")
    valid2 = np.load(tmp_path / "valid.npy")
    map2 = np.concatenate(
        [np.load(tmp_path / "map0.npy"), np.load(tmp_path / "map1.npy")]
    )
    dmap2 = np.concatenate(
        [np.load(tmp_path / "dmap0.npy"), np.load(tmp_path / "dmap1.npy")]
    )

    # single-process 8-device reference: identical mesh partitioning
    import jax

    from patolette_tpu.parallel import distributed as D
    from patolette_tpu.parallel import mesh as PM

    assert len(jax.devices()) == 8
    mesh = PM.make_mesh()
    W, H, P = 16, 32, 8
    n = W * H
    rng = np.random.default_rng(0)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    weights = rng.uniform(1, 2, (n,)).astype(np.float32)
    channels = PM.put_planar_sharded(colors, mesh)
    w = PM.put_vector_sharded(weights, mesh)
    fn = PM.quantize_palette_sharded(
        mesh, P, color_space=2, kmeans_niter=2, seed=1234, planar=True,
        with_map=True,
    )
    pal1, valid1, pmap1 = fn(channels, w)
    dmap1 = PM.dither_sharded(mesh, W, H, 2, segment=64, planar=True)(
        channels, pal1, valid1
    )

    np.testing.assert_array_equal(np.asarray(valid1), valid2)
    np.testing.assert_allclose(np.asarray(pal1), pal2, atol=1e-5)
    assert (np.asarray(pmap1) == map2).mean() > 0.999
    assert (np.asarray(dmap1) == dmap2).mean() > 0.999
