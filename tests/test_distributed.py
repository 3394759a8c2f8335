"""Multi-process (fake 2-host) cluster: jax.distributed.initialize on CPU
with virtual devices per process — validates the multi-host entry path
(parallel/distributed.py) end to end: global mesh spanning processes,
host-local batch assembly, psum'd gradients, identical replicated updates.
SURVEY.md §4 fake-cluster harness; VERDICT round-1 item 6."""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
import jax.numpy as jnp
import numpy as np
from bilateral_driving_tpu.parallel import data_parallel, distributed
from bilateral_driving_tpu.data import synthetic
from bilateral_driving_tpu.train import density, setup, trainer

pid = int(sys.argv[1])
ok = distributed.maybe_initialize(distributed.DistConfig(
    coordinator=%(coord)r, num_processes=2, process_id=pid))
assert ok, "not multi-process"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

key = jax.random.key(0)
W, H = 32, 32
cfg = trainer.TrainerConfig(
    background_model="vanilla", sky_model="none", affine_model="none",
    isect_capacity=2 ** 11, interpret=True, num_images=8, num_frames=8,
    sh_degree=0, density=density.DensityConfig(refine_interval=10000),
    w_depth=0.0)
scene = synthetic.make_scene(key, num_bg=200, num_frames=8, width=W, height=H)
params = setup.build_models(key, cfg)
bg, mask = setup.build_background(key, 256, scene.bg_means, scene.bg_colors,
                                  sh_degree=0)
params["Background"] = bg
masks = {"Background": mask}; aux = {"Background": {}}
statics = {"Background": {}}

mesh = distributed.global_mesh()
# every process builds ONLY its local devices' images (4 of the global 8)
local_frames = range(pid * 4, pid * 4 + 4)
batches = [synthetic.make_batch(scene, f,
                                jax.random.uniform(jax.random.fold_in(key, f),
                                                   (H, W, 3)))
           for f in local_frames]
stacked_local = jax.tree.map(lambda *xs: np.stack([np.asarray(x)
                                                   for x in xs]), *batches)
gbatch = distributed.host_local_batch_to_global(stacked_local, mesh)

state = trainer.init_state(key, cfg, params, masks, aux)
step = data_parallel.parallel_train_step(cfg, statics, mesh)
state, metrics = step(state, gbatch)
loss = float(metrics["loss"])
assert np.isfinite(loss), loss
# replicated params must stay identical across processes: print a digest
digest = float(jnp.sum(jnp.abs(state.params["Background"]["means"])))
print(f"DIST_OK pid={pid} loss={loss:.6f} digest={digest:.6f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_cpu_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO,
                                "coord": f"127.0.0.1:{port}"})
    # strip the axon TPU-tunnel trigger too: its sitecustomize registers a
    # PJRT backend at interpreter start, which forbids the later
    # jax.distributed.initialize() ("must be called before any JAX calls")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
           and not k.startswith("PALLAS_AXON")}
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "DIST_OK" in out, out[-3000:]
    # both processes computed the identical replicated update
    d0 = [l for l in outs[0].splitlines() if "DIST_OK" in l][0].split()[-1]
    d1 = [l for l in outs[1].splitlines() if "DIST_OK" in l][0].split()[-1]
    assert d0 == d1, (d0, d1)
