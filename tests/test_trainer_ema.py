"""Parameter EMA + monitored best-checkpoint selection (round 5).

Reference analogues: the EMA class the reference ships but never wires
into the NOPE recipe (`src/model/u_net/denoising_diffusion_pytorch/
model_utils.py:175-195`) and the Lightning ModelCheckpoint monitor/mode
knobs (`configs/callback/checkpoint/base.yaml:5-7`).  Here both are
product Trainer features: ``model.optim_config.ema_decay`` fuses the
EMA update into the jitted train step and evaluates/persists the EMA
stream alongside the instantaneous one; ``trainer.monitor`` +
``trainer.monitor_mode`` export a params-only best checkpoint whose
tracker survives process restarts (best.json).
"""

import json
import os.path as osp

import numpy as np
import pytest

TINY = [
    "model.img_size=32",
    "model.u_net.u_net_dim=8",
    "model.u_net.dim_mults=1,2",
    "model.u_net.resnet_block_groups=4",
    "model.encoder.block_out_channels=8,8,8,8",
    "model.encoder.layers_per_block=1",
    "model.encoder.norm_groups=4",
    "model.optim_config.warm_up_steps=2",
    "machine.batch_size=2",
    "machine.mesh_data=2",
    "machine.mesh_template=1",
    "trainer.num_sanity_val_steps=0",
    "trainer.media_every_n_steps=0",
    "trainer.log_every_n_steps=1",
]

IMG = 32


class SyntheticPairs:
    def __len__(self):
        return 16

    def __getitem__(self, i):
        import jax

        from nope_tpu.geometry import rotations

        rng = np.random.default_rng(i)
        mat = np.asarray(rotations.random_rotations(jax.random.key(i), 1))[0]
        return {
            "query": rng.uniform(-1, 1, (IMG, IMG, 3)).astype(np.float32),
            "reference": rng.uniform(-1, 1, (IMG, IMG, 3)).astype(np.float32),
            "relativeR": np.asarray(
                rotations.matrix_to_rotation_6d(mat), np.float32
            ),
            "relativeR_inv": np.asarray(
                rotations.matrix_to_rotation_6d(mat.T), np.float32
            ),
        }


def _batch(rng, key_seed=1):
    import jax
    import jax.numpy as jnp

    from nope_tpu.geometry import rotations

    mats = rotations.random_rotations(jax.random.key(key_seed), 2)
    return {
        "ds": {
            "query": jnp.asarray(
                rng.uniform(-1, 1, (2, IMG, IMG, 3)).astype(np.float32)
            ),
            "reference": jnp.asarray(
                rng.uniform(-1, 1, (2, IMG, IMG, 3)).astype(np.float32)
            ),
            "relativeR": rotations.matrix_to_rotation_6d(mats),
            "relativeR_inv": rotations.matrix_to_rotation_6d(
                jnp.swapaxes(mats, -1, -2)
            ),
        }
    }


def test_train_step_ema_numerics(rng):
    """The fused EMA stream must equal the closed form on the
    POST-update params (e_t = b*e_{t-1} + (1-b)*p_t, e_0 = p_0) and
    leave the optimisation itself bit-identical to the non-EMA step."""
    import jax
    import jax.numpy as jnp

    from nope_tpu.configs import load_config
    from nope_tpu.models.factory import build_task
    from nope_tpu.training.optim import make_optimizer
    from nope_tpu.training.train_state import create_train_state, make_train_step

    cfg = load_config(None, TINY)
    task = build_task(cfg.model)
    tx = make_optimizer(base_lr=1e-3, warm_up_steps=2)
    state0 = create_train_state(task, tx, jax.random.key(0), image_size=IMG)
    batch = _batch(rng)

    copy = lambda t: jax.tree.map(lambda x: jnp.array(x, copy=True), t)
    beta = 0.5

    # reference stream: plain step, EMA recomputed on the host
    step_plain = make_train_step(task, tx)
    s = copy(state0)
    ema_ref = copy(state0.unet_params)
    plain_losses = []
    for _ in range(3):
        s, m = step_plain(s, batch)
        plain_losses.append(float(m["loss/train_avg"]))
        ema_ref = jax.tree.map(
            lambda e, p: e * beta + p * (1.0 - beta), ema_ref, s.unet_params
        )

    # fused stream
    step_ema = make_train_step(task, tx, ema_decay=beta)
    s2 = copy(state0)
    ema = copy(state0.unet_params)
    for i in range(3):
        s2, m2, ema = step_ema(s2, batch, ema)
        assert np.isclose(
            float(m2["loss/train_avg"]), plain_losses[i], rtol=1e-6
        )

    for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(ema_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # the EMA genuinely lags the instantaneous params
    d = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(s2.unet_params))
    )
    assert d > 0.0


def test_checkpoint_ema_roundtrip(tmp_path):
    """``ema_params`` rides inside the orbax checkpoint; pre-EMA
    checkpoints restore with ``ema=None`` (the caller reseeds)."""
    import jax

    from nope_tpu.configs import load_config
    from nope_tpu.models.factory import build_task
    from nope_tpu.training.checkpoint import CheckpointManager
    from nope_tpu.training.optim import make_optimizer
    from nope_tpu.training.train_state import create_train_state

    cfg = load_config(None, TINY)
    task = build_task(cfg.model)
    tx = make_optimizer(warm_up_steps=2)
    state = jax.device_get(
        create_train_state(task, tx, jax.random.key(0), image_size=IMG)
    )
    ema = jax.tree.map(lambda x: x + 1.0 if x.dtype.kind == "f" else x,
                       state.unet_params)

    mgr = CheckpointManager(str(tmp_path / "ck"))
    assert mgr.save(2, state, force=True, ema_params=ema)
    mgr.wait()
    back, ema_back = mgr.restore_with_ema(state, state.unet_params)
    for a, b in zip(jax.tree.leaves(ema_back), jax.tree.leaves(ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the plain restore path reads the same checkpoint (ema dropped)
    plain = mgr.restore(state)
    for a, b in zip(jax.tree.leaves(plain.unet_params),
                    jax.tree.leaves(state.unet_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()

    # pre-EMA layout: saved WITHOUT ema_params -> (state, None)
    mgr2 = CheckpointManager(str(tmp_path / "ck_pre"))
    assert mgr2.save(2, state, force=True)
    mgr2.wait()
    _, ema_none = mgr2.restore_with_ema(state, state.unet_params)
    assert ema_none is None
    mgr2.close()


def test_skip_spike_updates():
    """A gradient spike above factor x running-norm must be skipped
    outright: zero update, inner optimizer state untouched, and the
    spike must not contaminate the anomaly reference (the next normal
    step behaves as if the spike never happened)."""
    import jax
    import jax.numpy as jnp
    import optax

    from nope_tpu.training.optim import skip_spike_updates

    tx = skip_spike_updates(
        optax.adam(1e-2), factor=10.0, norm_ema=0.9, warmup_steps=3
    )
    params = {"w": jnp.zeros(4)}
    state = tx.init(params)
    g_normal = {"w": jnp.ones(4)}  # global norm 2.0

    @jax.jit
    def step(g, state):
        return tx.update(g, state)

    for _ in range(5):
        upd, state = step(g_normal, state)
        assert float(optax.global_norm(upd)) > 0.0
    ref_state = state

    g_spike = {"w": jnp.ones(4) * 5e4}
    upd, state = step(g_spike, state)
    assert float(optax.global_norm(upd)) == 0.0  # no param motion
    # inner moments + norm EMA unchanged by the spike
    for a, b in zip(jax.tree.leaves(state["inner"]),
                    jax.tree.leaves(ref_state["inner"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(state["gnorm_ema"]) == float(ref_state["gnorm_ema"])

    # normal steps resume exactly
    upd, state = step(g_normal, state)
    assert float(optax.global_norm(upd)) > 0.0

    # during warmup nothing is skipped (the reference level is unformed)
    state0 = tx.init(params)
    upd, _ = step(g_spike, state0)
    assert float(optax.global_norm(upd)) > 0.0

    # make_optimizer wires the knob around the full chain
    from nope_tpu.training.optim import make_optimizer

    tx2 = make_optimizer(
        base_lr=1e-3, warm_up_steps=1, clip_grad_norm=1.0,
        skip_spike_factor=10.0,
    )
    s2 = tx2.init(params)
    for _ in range(205):  # past the wrapper's warmup
        u2, s2 = tx2.update(g_normal, s2, params)
    u2, s2 = tx2.update(g_spike, s2, params)
    assert float(optax.global_norm(u2)) == 0.0


@pytest.fixture
def make_trainer(tmp_path):
    def _make(extra_overrides, val_fn):
        from nope_tpu.configs import load_config
        from nope_tpu.data.pipeline import DataLoader
        from nope_tpu.models.factory import build_task
        from nope_tpu.training.trainer import Trainer

        cfg = load_config(
            None,
            TINY
            + [
                f"save_dir={tmp_path}",
                "name_exp=emarun",
                "trainer.val_check_interval=1",
                "trainer.checkpoint_every_n_steps=2",
            ]
            + extra_overrides,
        )
        loaders = {
            "ds": DataLoader(SyntheticPairs(), batch_size=2, num_workers=1)
        }
        return Trainer(cfg, build_task(cfg.model), loaders, val_fn=val_fn), cfg

    return _make


def test_trainer_monitor_best(make_trainer, tmp_path):
    """trainer.monitor selects + exports the best-scoring params and the
    tracker survives a process restart (best.json)."""
    import jax

    from nope_tpu.training.checkpoint import restore_params

    snapshots = {}
    vals = iter([5.0, 3.0, 4.0])

    def val_fn(state):
        snapshots[int(state.step)] = np.asarray(
            jax.tree.leaves(state.unet_params)[0]
        ).copy()
        return {"top1": next(vals)}

    trainer, cfg = make_trainer(
        ["model.optim_config.ema_decay=0.0", "trainer.monitor=top1"], val_fn
    )
    trainer.fit(max_steps=3)

    best_json = json.load(open(osp.join(cfg.save_dir, "checkpoints", "best.json")))
    assert best_json["step"] == 2 and best_json["value"] == 3.0
    assert best_json["stream"] == "inst" and best_json["monitor"] == "top1"

    # the exported params are the step-2 params, not the final ones
    _tmpl_state = trainer.init_state(resume=False)
    template = jax.device_get(
        {"unet": _tmpl_state.unet_params, "vae": _tmpl_state.vae_params}
    )
    best = restore_params(osp.join(cfg.save_dir, "checkpoints", "best"), template)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(best["unet"])[0]), snapshots[2], atol=0
    )
    assert not np.allclose(
        np.asarray(jax.tree.leaves(best["unet"])[0]), snapshots[3]
    )

    # a fresh Trainer on the same save_dir resumes the tracker: a WORSE
    # score later cannot displace the whole-run best
    trainer2, _ = make_trainer(
        ["model.optim_config.ema_decay=0.0", "trainer.monitor=top1"],
        lambda s: {"top1": 99.0},
    )
    assert trainer2._best["value"] == 3.0 and trainer2._best["step"] == 2
    trainer2._update_best(9, [("inst", trainer2.init_state(resume=False),
                               {"top1": 9.0})])
    assert trainer2._best["step"] == 2  # 9.0 does not beat 3.0
    trainer2._update_best(9, [("inst", trainer2.init_state(resume=False),
                               {"top1": 1.0})])
    assert trainer2._best["step"] == 9  # 1.0 does


def test_trainer_ema_stream(make_trainer):
    """ema_decay > 0: the EMA stream is evaluated (val_ema/*), competes
    for the monitored best, rides in the checkpoint, and a resumed
    Trainer restores it rather than reseeding."""
    import jax

    calls = iter([5.0, 4.0, 3.0, 2.0])  # step1: inst, ema; step2: inst, ema

    def val_fn(state):
        return {"top1": next(calls)}

    trainer, cfg = make_trainer(
        ["model.optim_config.ema_decay=0.5", "trainer.monitor=top1"], val_fn
    )
    state = trainer.fit(max_steps=2)
    assert trainer.ema_params is not None

    records = [
        json.loads(l) for l in open(osp.join(cfg.save_dir, "metrics.jsonl"))
    ]
    assert any("val_ema/top1" in r for r in records)
    best_json = json.load(open(osp.join(cfg.save_dir, "checkpoints", "best.json")))
    assert best_json["stream"] == "ema" and best_json["value"] == 2.0

    # EMA lags the instantaneous params
    d = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree.leaves(trainer.ema_params),
            jax.tree.leaves(state.unet_params),
        )
    )
    assert d > 0.0

    ema_saved = jax.device_get(trainer.ema_params)

    # a fresh Trainer resumes BOTH streams from the step-2 checkpoint
    vals2 = iter([1.0, 1.0])
    trainer2, _ = make_trainer(
        ["model.optim_config.ema_decay=0.5", "trainer.monitor=top1"],
        lambda s: {"top1": next(vals2)},
    )
    state2 = trainer2.init_state(resume=True)
    assert int(state2.step) == 2
    for a, b in zip(
        jax.tree.leaves(trainer2.ema_params), jax.tree.leaves(ema_saved)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
