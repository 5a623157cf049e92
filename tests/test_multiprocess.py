"""True multi-process data parallelism over jax.distributed (2 local
processes, CPU backend) — the multi-host smoke test SURVEY §4 notes the
reference entirely lacks.  Each process owns 4 virtual devices; the
global mesh spans 8; the jitted train step runs on a globally-sharded
batch and both processes must agree on the loss."""

import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from nope_tpu.utils.env import enable_compilation_cache
enable_compilation_cache()  # warm suite runs skip the worker recompiles
pid = int(sys.argv[1])
jax.distributed.initialize(
    coordinator_address="localhost:{port}", num_processes=2, process_id=pid,
    local_device_ids=list(range(4)),
    # this box has ONE core: when the suite runs alongside other heavy
    # processes a worker can be descheduled past the default 100 s
    # heartbeat window and the coordinator declares it dead (observed);
    # the workers are compute-starved, not crashed — give them slack
    heartbeat_timeout_seconds=600, shutdown_timeout_seconds=900,
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nope_tpu.models.unet import PoseUNet
from nope_tpu.models.vae import StableDiffusionVAE
from nope_tpu.tasks.pose_conditional import PoseConditionalTask, TaskConfig
from nope_tpu.training.optim import make_optimizer
from nope_tpu.training.train_state import create_train_state, make_train_step
from nope_tpu.parallel.mesh import create_mesh, DATA_AXIS
from nope_tpu.geometry import rotations

IMG = 32
task = PoseConditionalTask(
    PoseUNet(u_net_dim=8, channels=4, dim_mults=(1, 2), resnet_block_groups=4),
    StableDiffusionVAE(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                       latent_channels=4, groups=4),
    TaskConfig(),
)
tx = make_optimizer(warm_up_steps=5)
state = create_train_state(task, tx, jax.random.key(0), image_size=IMG)
step_fn = make_train_step(task, tx)

mesh = create_mesh(data=8, template=1)
from nope_tpu.parallel.mesh import process_barrier
# replicating the state across the global mesh runs a cross-process
# assert_equal all-gather — the process's FIRST Gloo collective; align
# ranks past the model-init compile skew first
process_barrier("replicate")
state = jax.device_put(state, NamedSharding(mesh, P()))

# identical global batch on both processes; each owns its local shard
rng = np.random.default_rng(0)
B = 8
mats = np.asarray(rotations.random_rotations(jax.random.key(1), B))
global_batch = {
    "query": rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32),
    "reference": rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32),
    "relativeR": np.asarray(rotations.matrix_to_rotation_6d(jnp.asarray(mats))),
    "relativeR_inv": np.asarray(
        rotations.matrix_to_rotation_6d(jnp.swapaxes(jnp.asarray(mats), -1, -2))
    ),
}
sharding = NamedSharding(mesh, P(DATA_AXIS))

def put_global(x):
    return jax.make_array_from_process_local_data(sharding, x[pid * 4 : (pid + 1) * 4])

from nope_tpu.parallel.mesh import process_barrier
# make_array_from_process_local_data performs the process's FIRST Gloo
# collective; align ranks past the init-compile skew before it
process_barrier("batch")
batch = {"ds": {k: put_global(v) for k, v in global_batch.items()}}
# compile FIRST (warm-vs-cold cache skew between ranks exceeds Gloo's
# 30 s rendezvous timeout), then align ranks, then execute
compiled = step_fn.lower(state, batch).compile()
process_barrier("train")
state, metrics = compiled(state, batch)
loss = float(metrics["loss/train_avg"])
print(f"RESULT pid={pid} loss={loss:.6f}", flush=True)
# align before interpreter exit: rank skew beyond the distributed
# runtime's 5-minute shutdown-barrier deadline fails the whole job
process_barrier("exit", timeout_ms=900_000)
"""


_EVAL_WORKER = r"""
import os, sys, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from nope_tpu.utils.env import enable_compilation_cache
enable_compilation_cache()  # warm suite runs skip the worker recompiles
pid = int(sys.argv[1])
save_dir = sys.argv[2]
jax.distributed.initialize(
    coordinator_address="localhost:{port}", num_processes=2, process_id=pid,
    local_device_ids=list(range(4)),
    # this box has ONE core: when the suite runs alongside other heavy
    # processes a worker can be descheduled past the default 100 s
    # heartbeat window and the coordinator declares it dead (observed);
    # the workers are compute-starved, not crashed — give them slack
    heartbeat_timeout_seconds=600, shutdown_timeout_seconds=900,
)

import numpy as np
import jax.numpy as jnp

from nope_tpu.models.unet import PoseUNet
from nope_tpu.models.vae import StableDiffusionVAE
from nope_tpu.tasks.pose_conditional import PoseConditionalTask, TaskConfig
from nope_tpu.evaluation.geodesic import evaluate_geodesic
from nope_tpu.geometry import rotations

IMG, N, B = 32, 8, 2
task = PoseConditionalTask(
    PoseUNet(u_net_dim=8, channels=4, dim_mults=(1, 2), resnet_block_groups=4),
    StableDiffusionVAE(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                       latent_channels=4, groups=4),
    TaskConfig(),
)
params = task.init(jax.random.key(0), image_size=IMG)

grid = np.asarray(rotations.random_rotations(jax.random.key(5), N))
def make_batch(seed):
    rng = np.random.default_rng(seed)
    gt = np.asarray(rotations.random_rotations(jax.random.key(seed), B))
    rel6 = np.asarray(rotations.matrix_to_rotation_6d(jnp.asarray(gt)))
    bank = np.asarray(rotations.matrix_to_rotation_6d(jnp.asarray(grid)))
    return {
        "query": rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32),
        "reference": rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32),
        "gt_relativeR": rel6.astype(np.float32),
        "all_relativeR": np.tile(bank[None], (B, 1, 1)).astype(np.float32),
        "query_pose": gt.astype(np.float32),
        "template_poses": np.tile(grid[None], (B, 1, 1, 1)).astype(np.float32),
        "symmetry": np.zeros(B, np.int32),
    }

# DISJOINT shards per process: rank0 scores batch seed 10, rank1 seed 20
loader = [make_batch(10 + 10 * pid)]
local = evaluate_geodesic(task, params, loader, save_dir=None, sync_processes=False)
merged = evaluate_geodesic(task, params, loader, save_dir=save_dir,
                           tag="mp", sync_processes=True)
print("RESULT " + json.dumps({"pid": pid, "local": local, "merged": merged}), flush=True)
from nope_tpu.parallel.mesh import process_barrier
process_barrier("exit", timeout_ms=900_000)  # see _WORKER exit note
"""


_CKPT_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from nope_tpu.utils.env import enable_compilation_cache
enable_compilation_cache()  # warm suite runs skip the worker recompiles
pid = int(sys.argv[1])
phase, ckpt_dir = sys.argv[2], sys.argv[3]
jax.distributed.initialize(
    coordinator_address="localhost:{port}", num_processes=2, process_id=pid,
    local_device_ids=list(range(4)),
    # this box has ONE core: when the suite runs alongside other heavy
    # processes a worker can be descheduled past the default 100 s
    # heartbeat window and the coordinator declares it dead (observed);
    # the workers are compute-starved, not crashed — give them slack
    heartbeat_timeout_seconds=600, shutdown_timeout_seconds=900,
)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nope_tpu.models.unet import PoseUNet
from nope_tpu.models.vae import StableDiffusionVAE
from nope_tpu.tasks.pose_conditional import PoseConditionalTask, TaskConfig
from nope_tpu.training.optim import make_optimizer
from nope_tpu.training.train_state import create_train_state, make_train_step
from nope_tpu.training.checkpoint import CheckpointManager
from nope_tpu.parallel.mesh import create_mesh, DATA_AXIS
from nope_tpu.geometry import rotations

IMG = 32
task = PoseConditionalTask(
    PoseUNet(u_net_dim=8, channels=4, dim_mults=(1, 2), resnet_block_groups=4),
    StableDiffusionVAE(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                       latent_channels=4, groups=4),
    TaskConfig(),
)
tx = make_optimizer(warm_up_steps=3)
step_fn = make_train_step(task, tx)
mesh = create_mesh(data=8, template=1)
replicated = NamedSharding(mesh, P())
sharding = NamedSharding(mesh, P(DATA_AXIS))

def fresh_state():
    from nope_tpu.parallel.mesh import process_barrier
    state = create_train_state(task, tx, jax.random.key(0), image_size=IMG)
    # the replication device_put all-gathers for an equality check —
    # align ranks past the init-compile skew first
    process_barrier("replicate")
    return jax.device_put(state, replicated)

def global_batch(step):
    # deterministic pure function of the step; identical on both ranks
    rng = np.random.default_rng(500 + step)
    B = 8
    mats = np.asarray(rotations.random_rotations(jax.random.key(step), B))
    full = {
        "query": rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32),
        "reference": rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32),
        "relativeR": np.asarray(rotations.matrix_to_rotation_6d(jnp.asarray(mats))),
        "relativeR_inv": np.asarray(
            rotations.matrix_to_rotation_6d(jnp.swapaxes(jnp.asarray(mats), -1, -2))
        ),
    }
    def put(x):
        return jax.make_array_from_process_local_data(
            sharding, x[pid * 4 : (pid + 1) * 4]
        )
    return {"ds": {k: put(v) for k, v in full.items()}}

def run_steps(state, lo, hi):
    from nope_tpu.parallel.mesh import process_barrier
    # global_batch -> make_array_from_process_local_data is the first
    # Gloo collective; align ranks past the init-compile skew
    process_barrier("batch")
    losses = []
    compiled = None
    for step in range(lo, hi):
        batch = global_batch(step)
        if compiled is None:
            # compile before the barrier: rank compile-time skew (warm vs
            # cold cache) exceeds Gloo's 30 s rendezvous timeout
            compiled = step_fn.lower(state, batch).compile()
            process_barrier("train")
        state, metrics = compiled(state, batch)
        losses.append(float(metrics["loss/train_avg"]))
    return state, losses

mgr = CheckpointManager(ckpt_dir, save_interval_steps=1)
if phase == "interrupt":
    state, losses = run_steps(fresh_state(), 0, 4)
    # coordinated multi-process orbax save: every rank participates
    saved = mgr.save(4, state, force=True)
    mgr.wait()
    assert saved, "coordinated save did not happen"
    print(f"RESULT pid={pid} losses={losses}", flush=True)
    # die abruptly: no manager close, no distributed shutdown
    sys.stdout.flush()
    os._exit(0)
elif phase == "resume":
    latest = mgr.latest_step()
    assert latest == 4, latest
    state = mgr.restore(fresh_state(), step=latest)
    assert int(state.step) == 4
    state, losses = run_steps(state, 4, 8)
    print(f"RESULT pid={pid} losses={losses}", flush=True)
    from nope_tpu.parallel.mesh import process_barrier
    process_barrier("exit", timeout_ms=900_000)
elif phase == "straight":
    state, losses = run_steps(fresh_state(), 0, 8)
    print(f"RESULT pid={pid} losses={losses}", flush=True)
    from nope_tpu.parallel.mesh import process_barrier
    process_barrier("exit", timeout_ms=900_000)
"""


_STREAM_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from nope_tpu.utils.env import enable_compilation_cache
enable_compilation_cache()  # warm suite runs skip the worker recompiles
pid = int(sys.argv[1])
jax.distributed.initialize(
    coordinator_address="localhost:{port}", num_processes=2, process_id=pid,
    local_device_ids=list(range(4)),
    # this box has ONE core: when the suite runs alongside other heavy
    # processes a worker can be descheduled past the default 100 s
    # heartbeat window and the coordinator declares it dead (observed);
    # the workers are compute-starved, not crashed — give them slack
    heartbeat_timeout_seconds=600, shutdown_timeout_seconds=900,
)

import json
import numpy as np
import jax.numpy as jnp

from nope_tpu.models.unet import PoseUNet
from nope_tpu.models.vae import StableDiffusionVAE
from nope_tpu.tasks.pose_conditional import PoseConditionalTask, TaskConfig
from nope_tpu.parallel.mesh import create_mesh, TEMPLATE_AXIS
from nope_tpu.parallel.eval import make_sharded_streaming_eval_fn
from nope_tpu.geometry import rotations

IMG, N, B = 32, 16, 2
task = PoseConditionalTask(
    PoseUNet(u_net_dim=8, channels=4, dim_mults=(1, 2), resnet_block_groups=4),
    StableDiffusionVAE(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                       latent_channels=4, groups=4),
    TaskConfig(),
)
params = task.init(jax.random.key(0), image_size=IMG)

# template axis = 8 spans BOTH processes (4 local devices each):
# each process's devices own two pose-grid slices, the all-gather of
# similarity rows crosses the process boundary
mesh = create_mesh(data=1, template=8)
assert mesh.shape[TEMPLATE_AXIS] == 8

rng = np.random.default_rng(3)
reference = rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)
query = rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)
mats = rotations.random_rotations(jax.random.key(5), B * N)
bank_R = np.asarray(
    rotations.matrix_to_rotation_6d(mats), np.float32
).reshape(B, N, 6)

run = make_sharded_streaming_eval_fn(task, mesh, chunk_size=2)
sim, idx = run(params, reference, query, bank_R)
# replicated outputs: every process holds the full arrays
sim_np = np.asarray(sim).astype(np.float64)
idx_np = np.asarray(idx)

# single-device oracle computed process-locally on device 0
local_sim, local_idx = jax.jit(
    lambda p, q, r, bR: task.retrieve_streaming(p, q, r, bR, chunk_size=4)
)(params, jnp.asarray(query), jnp.asarray(reference), jnp.asarray(bank_R))
ok_sim = bool(np.allclose(sim_np, np.asarray(local_sim), atol=1e-5))
ok_idx = bool(np.array_equal(idx_np, np.asarray(local_idx)))
print("RESULT " + json.dumps(
    {"pid": pid, "ok_sim": ok_sim, "ok_idx": ok_idx,
     "sim0": [float(x) for x in sim_np[0][:4]]}), flush=True)
from nope_tpu.parallel.mesh import process_barrier
process_barrier("exit", timeout_ms=900_000)  # see _WORKER exit note
"""


_GRAIN_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import numpy as np

IMG = 32

class PairsDataset:
    '''numpy-only (grain worker processes must not touch jax): items are
    a deterministic function of (epoch, index); rotations via Rodrigues.'''
    def __init__(self):
        self._epoch = 0
    def __len__(self):
        return 32
    def set_epoch(self, epoch):
        self._epoch = epoch
    def __getitem__(self, i):
        rng = np.random.default_rng(1000 * self._epoch + i)
        axis = rng.normal(size=3); axis /= np.linalg.norm(axis)
        ang = rng.uniform(0, np.pi)
        K = np.array([[0, -axis[2], axis[1]],
                      [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)
        return {
            "query": rng.uniform(-1, 1, (IMG, IMG, 3)).astype(np.float32),
            "reference": rng.uniform(-1, 1, (IMG, IMG, 3)).astype(np.float32),
            "R": R.astype(np.float32),
            "_idx": np.asarray(i, np.int64),
        }

if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    from nope_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()
    pid = int(sys.argv[1])
    jax.distributed.initialize(
        coordinator_address="localhost:{port}", num_processes=2, process_id=pid,
        local_device_ids=list(range(4)),
        heartbeat_timeout_seconds=600, shutdown_timeout_seconds=900,
    )
    assert jax.process_count() == 2

    import json
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nope_tpu.data.grain_pipeline import GrainLoader
    from nope_tpu.geometry import rotations
    from nope_tpu.models.unet import PoseUNet
    from nope_tpu.models.vae import StableDiffusionVAE
    from nope_tpu.tasks.pose_conditional import PoseConditionalTask, TaskConfig
    from nope_tpu.training.optim import make_optimizer
    from nope_tpu.training.train_state import create_train_state, make_train_step
    from nope_tpu.parallel.mesh import create_mesh, DATA_AXIS, process_barrier

    task = PoseConditionalTask(
        PoseUNet(u_net_dim=8, channels=4, dim_mults=(1, 2), resnet_block_groups=4),
        StableDiffusionVAE(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                           latent_channels=4, groups=4),
        TaskConfig(),
    )
    tx = make_optimizer(warm_up_steps=5)
    state = create_train_state(task, tx, jax.random.key(0), image_size=IMG)
    step_fn = make_train_step(task, tx)
    mesh = create_mesh(data=8, template=1)
    process_barrier("replicate")
    state = jax.device_put(state, NamedSharding(mesh, P()))
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    # grain input stack: 2 worker PROCESSES per jax process, record
    # space sharded across the 2 jax processes by ShardByJaxProcess
    loader = GrainLoader(PairsDataset(), batch_size=4, num_workers=2,
                         seed=11, shard_by_process=True)
    assert len(loader) == 4  # 32 records / 2 processes / batch 4

    def to_train_batch(local):
        ids = local.pop("_idx")
        R = jnp.asarray(local.pop("R"))
        local["relativeR"] = np.asarray(rotations.matrix_to_rotation_6d(R))
        local["relativeR_inv"] = np.asarray(
            rotations.matrix_to_rotation_6d(jnp.swapaxes(R, -1, -2)))
        # local shard (4) -> global device array (8 over the data axis)
        return {"ds": {
            k: jax.make_array_from_process_local_data(sharding, v)
            for k, v in local.items()
        }}, ids

    losses, seen = [], []
    compiled = None
    process_barrier("batch")
    for local in loader:
        batch, ids = to_train_batch(local)
        seen.extend(int(x) for x in ids)
        if compiled is None:
            compiled = step_fn.lower(state, batch).compile()
            process_barrier("train")
        state, metrics = compiled(state, batch)
        losses.append(float(metrics["loss/train_avg"]))
        if len(losses) == 2:
            break
    print("RESULT " + json.dumps({"pid": pid, "losses": losses, "seen": seen}),
          flush=True)
    process_barrier("exit", timeout_ms=900_000)
"""


def _run_workers(tmp_path, source, extra_args=()):
    import socket

    with socket.socket() as s:  # grab a free port; avoids collisions
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(source.replace("{port}", str(port)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + ":" + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), *extra_args],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert lines, out[-2000:]
        results.append(lines[0][len("RESULT "):])
    return results


@pytest.mark.skipif(
    os.environ.get("NOPE_TPU_SKIP_MULTIPROCESS") == "1",
    reason="multi-process test disabled",
)
def test_two_process_data_parallel_train_step(tmp_path):
    results = _run_workers(tmp_path, _WORKER)
    losses = [float(r.split("loss=")[1]) for r in results]
    # data-parallel processes must agree on the global loss
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    assert np.isfinite(losses).all()


@pytest.mark.skipif(
    os.environ.get("NOPE_TPU_SKIP_MULTIPROCESS") == "1",
    reason="multi-process test disabled",
)
def test_two_process_eval_merges_scores_and_rank_suffixes(tmp_path):
    """Each process evaluates a DISJOINT shard: merged scores must be
    identical on both ranks (and differ from either local-only score),
    prediction files must be rank-suffixed with no collisions."""
    import json

    save_dir = tmp_path / "preds"
    results = [json.loads(r) for r in
               _run_workers(tmp_path, _EVAL_WORKER, extra_args=(str(save_dir),))]
    by_pid = {r["pid"]: r for r in results}

    m0, m1 = by_pid[0]["merged"], by_pid[1]["merged"]
    for key in ("loss", "top1, accuracy_15", "top1, median", "num_images"):
        np.testing.assert_allclose(m0[key], m1[key], rtol=1e-6, err_msg=key)
    assert m0["num_images"] == 4.0  # 2 images per process, merged
    # shards are different data, so local medians differ from the merge
    locals_ = [by_pid[p]["local"]["top1, median"] for p in (0, 1)]
    assert not np.allclose(locals_[0], locals_[1])

    files = sorted(os.listdir(save_dir))
    assert "pred_mp_batch0_rank0.npz" in files
    assert "pred_mp_batch0_rank1.npz" in files


@pytest.mark.skipif(
    os.environ.get("NOPE_TPU_SKIP_MULTIPROCESS") == "1",
    reason="multi-process test disabled",
)
def test_two_process_coordinated_checkpoint_resume(tmp_path):
    """Two processes train with a COORDINATED orbax save, die abruptly
    (os._exit, no shutdown), two fresh processes restore the same
    checkpoint and continue — the resumed loss stream must be identical
    to an uninterrupted 2-process run (the multi-host elastic story the
    single-process test cannot cover)."""
    ckpt = str(tmp_path / "ckpt")

    def losses_of(results):
        out = {}
        for r in results:
            pid = int(r.split("pid=")[1].split(" ")[0])
            out[pid] = eval(r.split("losses=")[1])
        return out

    first = losses_of(
        _run_workers(tmp_path, _CKPT_WORKER, extra_args=("interrupt", ckpt))
    )
    resumed = losses_of(
        _run_workers(tmp_path, _CKPT_WORKER, extra_args=("resume", ckpt))
    )
    straight = losses_of(
        _run_workers(tmp_path, _CKPT_WORKER, extra_args=("straight", ckpt + "2"))
    )
    # ranks agree with each other in every phase
    for phase in (first, resumed, straight):
        np.testing.assert_allclose(phase[0], phase[1], rtol=1e-6)
    # pre-crash steps match the uninterrupted run's first half...
    np.testing.assert_allclose(first[0], straight[0][:4], rtol=1e-6)
    # ...and the resumed continuation matches its second half exactly:
    # restore really carried step counter + params + AdamW moments
    np.testing.assert_allclose(resumed[0], straight[0][4:], rtol=1e-6)


@pytest.mark.skipif(
    os.environ.get("NOPE_TPU_SKIP_MULTIPROCESS") == "1",
    reason="multi-process test disabled",
)
def test_two_process_grain_input_feeds_train_step(tmp_path):
    """VERDICT r3 #4: the grain input stack (worker PROCESSES +
    ShardByJaxProcess) feeds the real 2-process jitted train step — each
    jax process consumes a DISJOINT record shard, the globally-sharded
    batch assembles across processes, and both ranks agree on the loss."""
    import json

    results = [json.loads(r) for r in _run_workers(tmp_path, _GRAIN_WORKER)]
    by_pid = {r["pid"]: r for r in results}
    # data-parallel ranks agree on both steps' global loss
    np.testing.assert_allclose(by_pid[0]["losses"], by_pid[1]["losses"],
                               rtol=1e-6)
    assert len(by_pid[0]["losses"]) == 2
    assert np.isfinite(by_pid[0]["losses"]).all()
    # ShardByJaxProcess really sharded: disjoint records, 8 each
    s0, s1 = set(by_pid[0]["seen"]), set(by_pid[1]["seen"])
    assert len(by_pid[0]["seen"]) == len(by_pid[1]["seen"]) == 8
    assert not (s0 & s1), (s0, s1)
    assert s0 | s1 <= set(range(32))


@pytest.mark.skipif(
    os.environ.get("NOPE_TPU_SKIP_MULTIPROCESS") == "1",
    reason="multi-process test disabled",
)
def test_two_process_template_axis_streaming_eval(tmp_path):
    """The shard_map streaming eval on a mesh whose TEMPLATE axis spans
    the two processes (8-wide over 2x4 local devices): the cross-process
    all-gather of similarity rows must reproduce the single-device
    streaming result bit-for-bit on both ranks."""
    import json

    results = [json.loads(r) for r in _run_workers(tmp_path, _STREAM_WORKER)]
    by_pid = {r["pid"]: r for r in results}
    assert by_pid[0]["ok_sim"] and by_pid[0]["ok_idx"], by_pid[0]
    assert by_pid[1]["ok_sim"] and by_pid[1]["ok_idx"], by_pid[1]
    # both ranks hold the same replicated similarity rows
    np.testing.assert_allclose(by_pid[0]["sim0"], by_pid[1]["sim0"], rtol=1e-6)
