#!/usr/bin/env python
"""TRUE multi-process jax.distributed smoke run (VERDICT r2 item #5).

The reference's launcher rendezvouses real OS processes over NCCL
(DGDE/engine/launch.py:50-68: mp.spawn -> dist.init_process_group). The
TPU-native equivalent is ``jax.distributed.initialize``; until round 3 that
path (parallel/mesh.py:initialize_distributed) had never executed with
process_count > 1 — all data-parallel evidence was single-process
8-virtual-device. This script spawns 2 REAL processes on localhost, each
with 4 virtual CPU devices, rendezvouses them through the coordinator, and:

1. runs 3 jitted data-parallel train steps of the DGDE detector over the
   global 8-device mesh, with each process feeding only its local half of
   the global batch (jax.make_array_from_process_local_data) — the psum
   gradient all-reduce and SyncBN batch moments cross the process boundary;
2. checks the resulting loss matches a single-process 8-device run of the
   same global batch to float tolerance (DDP-equivalence, the cross-process
   version of tests/test_train_step.py:111);
3. exercises the sharded-eval gather: each process writes its KITTI txt
   shard, hits the sync_global_devices barrier, and process 0 verifies all
   shards (the reference's pickled all_gather path, utils/comm.py:140-175).

Writes docs/MULTIPROC.md with the transcript.

Usage: python tools/multiprocess_smoke.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# ---------------------------------------------------------------------------
# worker
# ---------------------------------------------------------------------------


def worker(coordinator: str, num_procs: int, pid: int, workdir: str):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator, num_procs, pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dcd_tpu.config import dgde_run_config
    from dcd_tpu.data import synthetic
    from dcd_tpu.data.target_encoder import collate, encode_targets
    from dcd_tpu.engine.train import create_train_state, make_train_step
    from dcd_tpu.parallel import make_mesh, replicate

    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    base = dgde_run_config()
    cfg = dataclasses.replace(
        base,
        input=dataclasses.replace(base.input, height_train=64, width_train=96),
        datasets=dataclasses.replace(base.datasets, max_objects=6),
        model=dataclasses.replace(
            base.model,
            pretrain=False,
            head=dataclasses.replace(base.model.head, num_channel=16, pairs_topk=64),
            backbone=dataclasses.replace(base.model.backbone, channels=(4, 8, 8, 8, 8, 8)),
        ),
    )

    # deterministic global batch of 8; every process encodes all samples
    # (cheap at this size) but CONTRIBUTES only its local half to device
    # memory — exactly the multi-host input-pipeline pattern
    samples = [
        encode_targets(
            *synthetic.make_scene(seed=s, num_objs=3, image_size=(90, 60)),
            cfg, img_id=f"{s:06d}",
        )
        for s in range(8)
    ]
    global_batch = {k: v for k, v in collate(samples).items() if not isinstance(v, list)}

    mesh = make_mesh()  # all 8 global devices
    sharding = NamedSharding(mesh, P("data"))
    lo, hi = pid * 4, (pid + 1) * 4

    def to_global(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x[lo:hi]), x.shape
        )

    batch = {k: to_global(v) for k, v in global_batch.items()}

    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = replicate(state, mesh)
    step_fn = jax.jit(make_train_step(cfg, model))

    losses = []
    for _ in range(3):
        state, logs = step_fn(state, batch)
        # total_loss is replicated over the global mesh; read this
        # process's addressable replica
        losses.append(float(np.asarray(logs["total_loss"].addressable_data(0))))

    # ---- sharded-eval gather over the shared filesystem ----
    out_dir = os.path.join(workdir, "inference")
    os.makedirs(out_dir, exist_ok=True)
    my_images = list(range(pid, 6, num_procs))  # InferenceSampler striding
    for i in my_images:
        with open(os.path.join(out_dir, f"{i:06d}.txt"), "w") as f:
            f.write(f"Car -1 -1 0.0 0 0 10 10 1.5 1.6 3.9 0 1 {10 + i} 0.0 0.9\n")
    multihost_utils.sync_global_devices("dcd_eval_gather_smoke")

    if pid == 0:
        txts = sorted(os.listdir(out_dir))
        assert len(txts) == 6, txts  # both processes' shards visible
        with open(os.path.join(workdir, "result.json"), "w") as f:
            json.dump(
                {
                    "process_count": jax.process_count(),
                    "global_devices": jax.device_count(),
                    "local_devices": len(jax.local_devices()),
                    "losses": losses,
                    "eval_txt_shards": len(txts),
                },
                f,
            )
    multihost_utils.sync_global_devices("dcd_done")


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def single_process_reference() -> list:
    """Same 3 steps on a single process with 8 virtual devices."""
    code = r"""
import json, sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses
import numpy as np, jax.numpy as jnp
from dcd_tpu.config import dgde_run_config
from dcd_tpu.data import synthetic
from dcd_tpu.data.target_encoder import collate, encode_targets
from dcd_tpu.engine.train import create_train_state, make_train_step
from dcd_tpu.parallel import make_mesh, replicate, shard_batch
base = dgde_run_config()
cfg = dataclasses.replace(
    base,
    input=dataclasses.replace(base.input, height_train=64, width_train=96),
    datasets=dataclasses.replace(base.datasets, max_objects=6),
    model=dataclasses.replace(
        base.model, pretrain=False,
        head=dataclasses.replace(base.model.head, num_channel=16, pairs_topk=64),
        backbone=dataclasses.replace(base.model.backbone, channels=(4, 8, 8, 8, 8, 8)),
    ),
)
samples = [encode_targets(*synthetic.make_scene(seed=s, num_objs=3, image_size=(90, 60)),
                          cfg, img_id=f"{s:06d}") for s in range(8)]
batch = {k: v for k, v in collate(samples).items() if not isinstance(v, list)}
mesh = make_mesh()
batch = shard_batch(batch, mesh)
model, state = create_train_state(cfg, jax.random.PRNGKey(0))
state = replicate(state, mesh)
step_fn = jax.jit(make_train_step(cfg, model))
losses = []
for _ in range(3):
    state, logs = step_fn(state, batch)
    losses.append(float(logs["total_loss"]))
print("LOSSES=" + json.dumps(losses))
""" % {"repo": REPO}
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        cwd=REPO, timeout=1200,
    )
    if out.returncode != 0:
        print(out.stdout, out.stderr)
        raise RuntimeError("single-process reference failed")
    for line in out.stdout.splitlines():
        if line.startswith("LOSSES="):
            return json.loads(line[len("LOSSES="):])
    raise RuntimeError("no losses in output")


def main():
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        coordinator, num, pid, workdir = (
            sys.argv[i + 1], int(sys.argv[i + 2]), int(sys.argv[i + 3]), sys.argv[i + 4]
        )
        worker(coordinator, num, pid, workdir)
        return

    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    workdir = tempfile.mkdtemp(prefix="dcd_mp_")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             coordinator, "2", str(pid), workdir],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(f"--- worker {pid} failed ---\n{out}")
            sys.exit(1)

    with open(os.path.join(workdir, "result.json")) as f:
        result = json.load(f)
    print("multi-process result:", json.dumps(result))

    ref_losses = single_process_reference()
    print("single-process losses:", ref_losses)
    import numpy as np

    ok = np.allclose(result["losses"], ref_losses, rtol=5e-4)
    md = [
        "# MULTIPROC — true 2-process jax.distributed run (localhost CPU)",
        "",
        "Produced by `python tools/multiprocess_smoke.py`: two OS processes,",
        "4 virtual CPU devices each, rendezvoused via jax.distributed",
        "(coordinator on 127.0.0.1) — the TPU-native analogue of the",
        "reference's mp.spawn + NCCL init_process_group",
        "(DGDE/engine/launch.py:50-68). Each process contributed its local",
        "half of the global batch; XLA inserted the cross-process gradient",
        "all-reduce and SyncBN moment reduction; the sharded-eval txt gather",
        "+ sync_global_devices barrier ran across processes",
        "(tools/train_dgde.py:252-266 path).",
        "",
        f"- process_count: {result['process_count']}, global devices: "
        f"{result['global_devices']} (4 local x 2)",
        f"- 3-step train losses (2-proc):   {[round(x, 6) for x in result['losses']]}",
        f"- 3-step train losses (1-proc, same global batch): "
        f"{[round(x, 6) for x in ref_losses]}",
        f"- eval txt shards gathered on process 0: {result['eval_txt_shards']}/6",
        f"- DDP-equivalence (rtol 5e-4): {'PASS' if ok else 'FAIL'}",
        "",
    ]
    with open(os.path.join(REPO, "docs", "MULTIPROC.md"), "w") as f:
        f.write("\n".join(md))
    print("wrote docs/MULTIPROC.md:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
