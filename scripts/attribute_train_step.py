"""Hardware probe: per-phase MFU attribution of the TRAIN step (round 4).

Round 3 gave the headline EVAL program the per-phase treatment (65.5%
MFU, attribution closing to 99.2% — docs/PERFORMANCE.md).  This script
applies the identical method to the 203 img/s bf16 train step the
round-3 verdict flagged (directive #7): fwd/bwd/optimizer phase split,
FLOPs from XLA's compiled ``cost_analysis()``, MFU against the v5e's
197 TFLOP/s bf16 peak.

Method notes (same as round 3): jax.profiler device traces do not
cross this host's tunnelled backend, so each phase runs as its own
jitted program, fenced by host fetches of small outputs, median of
--iters runs after a warmup; params are passed as jit ARGUMENTS
(closure capture would inline ~100 MB of weights into the HLO and
overflow the remote-compile transport).

Train-step structure under attribution (train_state.make_train_step,
half_precision=True, the flagship recipe):

  P_enc     2 VAE encodes (query + reference, batch B, bf16) — the
            U-Net's grads do not flow through the frozen VAE, so the
            encodes are pure forwards in the compiled step too (XLA
            sees no use of their transpose).
  P_fwd     U-Net forward on the DOUBLED 2B batch (inv-deltaR
            symmetrization stacks both directions) + l1 loss.
  P_grad    value_and_grad of the same w.r.t. unet params (fwd+bwd).
  P_opt     AdamW update + apply_updates on the f32 master weights.
  e2e       the real donated train_step.

Run:  python scripts/attribute_train_step.py [--batch 128] [--iters 5]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nope_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp
import optax

from nope_tpu.models.unet import PoseUNet
from nope_tpu.models.vae import StableDiffusionVAE
from nope_tpu.tasks.pose_conditional import PoseConditionalTask, TaskConfig, cast_half
from nope_tpu.training.optim import make_optimizer
from nope_tpu.training.train_state import create_train_state, make_train_step

PEAK_TFLOPS = 197.0  # v5e bf16


def _arg(name, default, cast=int):
    return cast(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default


IMG = 256
B = _arg("--batch", 128)
ITERS = _arg("--iters", 5)

vae = StableDiffusionVAE()
task = PoseConditionalTask(
    PoseUNet(u_net_dim=192, channels=4, dim_mults=(1, 2, 4, 8), resnet_block_groups=8),
    vae,
    TaskConfig(),
)
tx = make_optimizer(base_lr=2e-4, warm_up_steps=100)
state = create_train_state(task, tx, jax.random.key(0), image_size=IMG)
train_step = make_train_step(task, tx, half_precision=True)

rng = np.random.default_rng(0)
batch = {
    "query": jnp.asarray(rng.uniform(-1, 1, (B, IMG, IMG, 3)), jnp.float32),
    "reference": jnp.asarray(rng.uniform(-1, 1, (B, IMG, IMG, 3)), jnp.float32),
    "relativeR": jnp.asarray(rng.normal(size=(B, 6)), jnp.float32),
    "relativeR_inv": jnp.asarray(rng.normal(size=(B, 6)), jnp.float32),
}
batches = {"shapenet": batch}


def fence(x):
    return jax.tree.map(np.asarray, jax.tree.leaves(x)[:1])


def timed(fn, *args, iters=ITERS, label=""):
    """Median fenced wall time + compiled-FLOP estimate for fn."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = float("nan")
    jfn = jax.jit(fn)
    fence(jfn(*args))  # warmup (cache-shared with `compiled`)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fence(jfn(*args))
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    return t, flops


results = {}

# ---- null-dispatch calibration --------------------------------------------
# every fenced call pays the tunnel's dispatch+fetch round trip (~25 ms
# on this host); measure it with an empty program and report phase times
# with it subtracted (round 3 amortized it inside fori_loops instead —
# same correction, simpler instrument)
_tiny = jnp.zeros((8,), jnp.float32)
t_null, _ = timed(lambda x: x + 1.0, _tiny)
print(json.dumps({"phase": "null_dispatch", "ms": round(t_null * 1e3, 1)}),
      flush=True)

# ---- end-to-end FIRST ------------------------------------------------------
# (the phase programs park ~2.5 GB of copies — bf16 params/batch, f32
# grads — on the device; running the full step beside them OOMs a 16 GB
# v5e, so measure e2e before any phase artifact exists and free its
# state afterwards)
try:
    f_e2e = float(
        train_step.lower(state, batches).compile().cost_analysis()["flops"])
except Exception:
    f_e2e = float("nan")
st, metrics = train_step(state, batches)  # warmup/compile; donates `state`
fence(metrics)
times = []
for _ in range(ITERS):
    t0 = time.perf_counter()
    st, metrics = train_step(st, batches)
    fence(metrics)
    times.append(time.perf_counter() - t0)
t_e2e = float(np.median(times))
# rebuild a fresh f32 state for the phase programs (the loop donated the
# original's buffers), then drop the threaded one
state = create_train_state(task, tx, jax.random.key(0), image_size=IMG)
del st, metrics

# ---- phase programs --------------------------------------------------------
params_h = cast_half({"unet": state.unet_params, "vae": state.vae_params})
batch_h = cast_half(batch)


def p_enc(params, q, r):
    return task.encode(params, q, "mode"), task.encode(params, r, "mode")


t_enc, f_enc = timed(p_enc, params_h, batch_h["query"], batch_h["reference"])
results["enc"] = (t_enc, f_enc)
print(json.dumps({"phase": "P_enc(2x VAE encode)", "ms": round(t_enc * 1e3, 1),
                  "tflop": round(f_enc / 1e12, 1)}), flush=True)

q_lat, r_lat = jax.jit(p_enc)(params_h, batch_h["query"], batch_h["reference"])


def doubled_loss(unet_params_h, q_lat, r_lat, dR, dR_inv):
    params = {"unet": unet_params_h, "vae": params_h["vae"]}
    inputs = jnp.concatenate([r_lat, q_lat], axis=0)
    poses = jnp.concatenate([dR, dR_inv], axis=0)
    targets = jnp.concatenate([q_lat, r_lat], axis=0)
    pred = task.predict_latent(params, inputs, poses)
    return jnp.mean(jnp.abs(pred - targets))


args_l = (params_h["unet"], q_lat, r_lat, batch_h["relativeR"],
          batch_h["relativeR_inv"])
t_fwd, f_fwd = timed(doubled_loss, *args_l)
results["fwd"] = (t_fwd, f_fwd)
print(json.dumps({"phase": "P_fwd(UNet 2B fwd+loss)", "ms": round(t_fwd * 1e3, 1),
                  "tflop": round(f_fwd / 1e12, 1)}), flush=True)


def doubled_grad(unet_params_h, q_lat, r_lat, dR, dR_inv):
    return jax.value_and_grad(doubled_loss)(unet_params_h, q_lat, r_lat, dR, dR_inv)


t_grad, f_grad = timed(doubled_grad, *args_l)
results["grad"] = (t_grad, f_grad)
print(json.dumps({"phase": "P_grad(UNet 2B fwd+bwd)", "ms": round(t_grad * 1e3, 1),
                  "tflop": round(f_grad / 1e12, 1)}), flush=True)

# grads for the optimizer phase: f32 like the real step's (the transpose
# of the f32->bf16 cast yields f32 grads)
_, grads32 = jax.jit(doubled_grad)(*args_l)
grads32 = jax.tree.map(lambda g: g.astype(jnp.float32), grads32)


def p_opt(grads, opt_state, unet_params):
    updates, opt_state = tx.update(grads, opt_state, unet_params)
    return optax.apply_updates(unet_params, updates), opt_state


t_opt, f_opt = timed(p_opt, grads32, state.opt_state, state.unet_params)
results["opt"] = (t_opt, f_opt)
print(json.dumps({"phase": "P_opt(AdamW f32)", "ms": round(t_opt * 1e3, 1),
                  "tflop": round(f_opt / 1e12, 2)}), flush=True)

# dispatch-corrected phase times (floor at 0)
c = lambda t: max(t - t_null, 0.0)
t_enc_c, t_fwd_c, t_grad_c, t_opt_c, t_e2e_c = map(c, (t_enc, t_fwd, t_grad, t_opt, t_e2e))
phase_sum = t_enc_c + t_grad_c + t_opt_c
summary = {
    "batch": B,
    "null_dispatch_ms": round(t_null * 1e3, 1),
    "e2e_ms": round(t_e2e_c * 1e3, 1),
    "img_per_sec": round(B / t_e2e_c, 1),
    "e2e_tflop": round(f_e2e / 1e12, 1),
    "e2e_mfu_pct": round(f_e2e / 1e12 / t_e2e_c / PEAK_TFLOPS * 100, 1),
    "phases": {
        "enc": {"ms": round(t_enc_c * 1e3, 1),
                "tflop": round(f_enc / 1e12, 1),
                "mfu_pct": round(f_enc / 1e12 / t_enc_c / PEAK_TFLOPS * 100, 1)},
        "fwd": {"ms": round(t_fwd_c * 1e3, 1),
                "tflop": round(f_fwd / 1e12, 1),
                "mfu_pct": round(f_fwd / 1e12 / t_fwd_c / PEAK_TFLOPS * 100, 1)},
        "fwd+bwd": {"ms": round(t_grad_c * 1e3, 1),
                    "tflop": round(f_grad / 1e12, 1),
                    "mfu_pct": round(f_grad / 1e12 / t_grad_c / PEAK_TFLOPS * 100, 1)},
        "opt": {"ms": round(t_opt_c * 1e3, 1),
                "tflop": round(f_opt / 1e12, 2)},
    },
    "phase_sum_ms": round(phase_sum * 1e3, 1),
    "closure_pct": round(phase_sum / t_e2e_c * 100, 1),
}
print(json.dumps(summary), flush=True)
print("DONE", flush=True)
