"""Benchmark: end-to-end SemanticKITTI-eval inference throughput on one chip.

Measures the full per-scan pipeline of the flagship config (PMF-ResNet34,
384×1232 eval resolution): on-device projection + z-buffer scatter +
normalization + two-stream forward + argmax, on synthetic scans, batch 8
(offline eval batches freely; cf. the reference eval loop
tasks/pmf_eval_semantickitti/infer.py:87-108 which is per-scan only
because torch preprocessing is host-bound).

Timing methodology (axon relay): `block_until_ready` does not reliably
block through the relay, so we chain an epsilon of each result into the
next call INSIDE jit (no eager ops in the loop) and force one real
np.asarray fetch at the end — device execution is in-order, so the last
result completing implies all N executed.

Output protocol: the headline eval JSON line is printed THE MOMENT eval
is measured (insurance against the driver's wall-clock timeout — round 3
recorded rc=124 and no number at all because setup ate the budget).
Extra phases (train step, EPMF eval) each run in a SUBPROCESS bounded by
the remaining BENCH_BUDGET_S (default 300 s — round 3's driver kill
happened somewhere inside 5m15-6m20, so the parent must exit 0 well
before that): a cold-cache compile or a congested relay kills only that
phase, the parent still exits 0 in budget and reprints the full JSON
line with whatever fields landed — the LAST line is always the most
complete and EVERY line carries the headline {metric, value, unit,
vs_baseline}. Raise BENCH_BUDGET_S for manual runs wanting all phases.

vs_baseline: the reference publishes no throughput in-repo (BASELINE.md);
the north-star target is >2× an A100 running the reference at this
config. The EPMF publication reports the torch PMF pipeline at ~125 ms
per scan on an RTX 2080 Ti (~8 FPS); an A100 is roughly 3× a 2080 Ti on
this workload, giving A100_EST ≈ 25 scans/sec, so
vs_baseline = value / (2 * 25) and >1.0 beats the target.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

A100_EST_SCANS_PER_SEC = 25.0
TARGET = 2.0 * A100_EST_SCANS_PER_SEC

BATCH = 8
N_POINTS = 32768  # KITTI-FOV scans carry ~20k points (reference
# trains/evals on the camera-FOV-distilled dataset, README_en.md)
H, W = 384, 1232
HT, WT = 256, 1024  # training crop (config_server_kitti.yaml sensor)
N_ITERS = 15
N_TRAIN_ITERS = 8

T0 = time.perf_counter()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "300"))
# minimum remaining budget to even START an extra phase (warm-cache
# load + import + measure; measured round 4)
MIN_PHASE_S = 90.0


def elapsed():
    return time.perf_counter() - T0


def _run_phase(phase: str, timeout_s: float):
    """Run one extra bench phase in a subprocess with a hard timeout;
    returns its parsed JSON line or None."""
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", phase],
            capture_output=True, text=True, timeout=timeout_s)
        lines = [ln for ln in out.stdout.splitlines()
                 if ln.startswith("{")]
        return json.loads(lines[-1]) if lines else None
    except (subprocess.TimeoutExpired, json.JSONDecodeError):
        return None


def make_inputs(rng, batch, n_points=N_POINTS, h=H, w=W):
    pts = np.zeros((batch, n_points, 4), np.float32)
    pts[..., 0] = rng.uniform(2, 70, (batch, n_points))
    pts[..., 1] = rng.uniform(-20, 20, (batch, n_points))
    pts[..., 2] = rng.uniform(-2, 1, (batch, n_points))
    pts[..., 3] = rng.uniform(0, 1, (batch, n_points))
    labels = rng.integers(0, 20, (batch, n_points)).astype(np.int32)
    valid = np.ones((batch, n_points), bool)
    fx = 720.0
    proj = np.tile(np.array(
        [[fx, -fx, 0, w * fx / 2], [0, 0, -fx, h * fx / 2], [1, 0, 0, 0]],
        np.float32)[None], (batch, 1, 1))
    image = rng.random((batch, h, w + 16, 3)).astype(np.float32)
    img_h = np.full((batch,), h, np.int32)
    img_w = np.full((batch,), w, np.int32)
    return pts, labels, valid, proj, image, img_h, img_w


def bench_eval(jax, jnp, model, variables, cfg, args):
    import functools

    # headline program pinned to DEFAULT codegen effort: the global −0.7
    # (utils/compiler.py) compiles 3× smaller/faster but costs ~10% eval
    # throughput at this config (67.4 vs 76.9 scans/s measured) — for
    # the one driver-recorded number, throughput wins. The train phase
    # also pins default (−0.7 makes its compile run >25 min, see
    # bench_train); only the EPMF phase rides the global −0.7.
    @functools.partial(jax.jit,
                       compiler_options={"exec_time_optimization_effort": 0.0})
    def scan_pipeline(variables, eps, points, labels, valid, proj_matrix,
                      image, ih, iw):
        from pmf_tpu.data import build_batch

        f, m, l = build_batch(jax.random.PRNGKey(0), points + eps, labels,
                              valid, proj_matrix, image, ih, iw, cfg, False)
        lidar, cam = model.apply(variables, f[..., :5], f[..., 5:8],
                                 train=False)
        from pmf_tpu.ops import argmax_last
        pred = argmax_last(lidar)
        # epsilon chaining: a scalar wholly dependent on this iteration
        return pred, (pred[0, 0, 0] * 0).astype(jnp.float32)

    eps = jnp.float32(0.0)
    out, eps = scan_pipeline(variables, eps, *args)
    np.asarray(out[0, :2, :2])  # force compile + first execution
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        out, eps = scan_pipeline(variables, eps, *args)
    np.asarray(eps)
    dt = (time.perf_counter() - t0) / N_ITERS
    return BATCH / dt


def bench_train(jax, jnp, model, variables, args):
    from pmf_tpu.data import PVConfig, build_batch
    from pmf_tpu.train import (LossConfig, TrainState, hybrid_pmf_optimizer,
                               make_pmf_train_step, warmup_cosine_lr)

    cfg = PVConfig(canvas_h=H, canvas_w=W + 16, proj_h=H, proj_w=W,
                   proj_ht=HT, proj_wt=WT, h_pad=7, w_pad=3,
                   n_points=N_POINTS)
    tx = hybrid_pmf_optimizer(warmup_cosine_lr(1e-3, 100, 10000), 0.9, 1e-5)
    state = TrainState.create({"params": variables["params"],
                               "batch_stats": variables["batch_stats"]}, tx)
    loss_cfg = LossConfig(nclasses=20, alpha=tuple([0.0] + [1.0] * 19))
    step = make_pmf_train_step(model, tx, loss_cfg, donate=False)

    # donate the state through the OUTER jit (the inner step is inlined):
    # params + AdamW/SGD moments update in place instead of
    # double-buffering hundreds of MB every step. Effort pinned to the
    # DEFAULT: at −0.7 the train-step compile runs >25 min (the backward
    # pass at 15.7 GB temp apparently defeats low-effort memory fitting)
    # vs 505 s at default.
    import functools

    @functools.partial(
        jax.jit, donate_argnums=(0,),
        compiler_options={"exec_time_optimization_effort": 0.0})
    def train_iter(state, key, points, labels, valid, proj_matrix, image,
                   ih, iw):
        # fold the per-step key INSIDE the jit: an eager fold_in between
        # dispatches would read state.step back through the relay and
        # serialize every iteration (measured 638 ms/step vs the true
        # 74 ms fused step)
        key = jax.random.fold_in(key, state.step)
        f, m, l, pts = build_batch(key, points, labels, valid, proj_matrix,
                                   image, ih, iw, cfg, True,
                                   return_points=True)
        return step(state, f, l, key, pts)

    key = jax.random.PRNGKey(0)
    state, aux = train_iter(state, key, *args)
    np.asarray(aux["loss"])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(N_TRAIN_ITERS):
        state, aux = train_iter(state, key, *args)
    np.asarray(aux["loss"])
    dt = (time.perf_counter() - t0) / N_TRAIN_ITERS
    return BATCH / dt


def bench_epmf_eval(jax, jnp):
    """EPMF (efficient variant) eval throughput at its /64 config —
    V2 pipeline (yaw-crop, tight bbox) + half-res lidar stream
    (epmf_net.py:82-131)."""
    from pmf_tpu.data.perspective_pipeline_v2 import V2Config, build_v2_batch
    from pmf_tpu.models import EPMFNet

    h, w = 320, 1216
    cfg = V2Config(canvas_h=H, canvas_w=W + 16, proj_h=h, proj_w=w,
                   proj_ht=h, proj_wt=w, n_points=N_POINTS)
    model = EPMFNet(nclasses=20, base_channels=32, image_backbone="resnet34",
                    dtype=jnp.bfloat16, use_packed=True)
    raw = make_inputs(np.random.default_rng(1), BATCH)
    args = tuple(map(jnp.asarray, raw))

    @jax.jit
    def init_fn(key):
        return model.init({"params": key, "dropout": jax.random.PRNGKey(1)},
                          jnp.zeros((1, 64, 128, 5)),
                          jnp.zeros((1, 64, 128, 3)), train=False)

    variables = init_fn(jax.random.PRNGKey(0))

    @jax.jit
    def epmf_pipeline(variables, eps, points, labels, valid, proj_matrix,
                      image, ih, iw):
        f, m, l = build_v2_batch(jax.random.PRNGKey(0), points + eps,
                                 labels, valid, proj_matrix, image, ih, iw,
                                 cfg, False)
        lidar, cam = model.apply(variables, f[..., :5], f[..., 5:8],
                                 train=False)
        from pmf_tpu.ops import argmax_last
        pred = argmax_last(lidar)
        return pred, (pred[0, 0, 0] * 0).astype(jnp.float32)

    eps = jnp.float32(0.0)
    out, eps = epmf_pipeline(variables, eps, *args)
    np.asarray(out[0, :2, :2])
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        out, eps = epmf_pipeline(variables, eps, *args)
    np.asarray(eps)
    dt = (time.perf_counter() - t0) / N_ITERS
    return BATCH / dt


def _setup_jax():
    import jax

    # persistent compilation cache: the driver re-runs bench each round
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # default-effort TPU codegen unrolls these conv nets into ~90 MB of
    # code per program (slow to compile AND slower to run — see
    # pmf_tpu/utils/compiler.py); −0.7 is ~3× smaller and faster
    from pmf_tpu.utils import configure_compiler
    configure_compiler()
    import jax.numpy as jnp

    return jax, jnp


def _setup_pmf(jax, jnp):
    from pmf_tpu.data import PVConfig
    from pmf_tpu.models import PMFNet

    cfg = PVConfig(canvas_h=H, canvas_w=W + 16, proj_h=H, proj_w=W,
                   h_pad=7, w_pad=3, n_points=N_POINTS)
    raw = make_inputs(np.random.default_rng(0), BATCH)

    model = PMFNet(nclasses=20, base_channels=32, image_backbone="resnet34",
                   dtype=jnp.bfloat16, use_packed=True)

    # one fused init compile (eager init would trigger dozens of small
    # compiles); conv param shapes don't depend on H/W, so init small
    @jax.jit
    def init_fn(key):
        return model.init({"params": key, "dropout": jax.random.PRNGKey(1)},
                          jnp.zeros((1, 64, 80, 5)), jnp.zeros((1, 64, 80, 3)),
                          train=False)

    variables = init_fn(jax.random.PRNGKey(0))
    # variables passed as args (not closure constants) → stable compile
    # cache key across runs
    args = tuple(map(jnp.asarray, raw))
    return cfg, model, variables, args


def _headline(eval_sps: float) -> dict:
    return {
        "metric": "pmf_r34_kitti_eval_scans_per_sec_per_chip",
        "value": round(eval_sps, 2),
        "unit": "scans/sec",
        "vs_baseline": round(eval_sps / TARGET, 3),
    }


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--phase":
        jax, jnp = _setup_jax()
        if sys.argv[2] == "eval":
            cfg, model, variables, args = _setup_pmf(jax, jnp)
            sps = bench_eval(jax, jnp, model, variables, cfg, args)
            print(json.dumps(_headline(sps)), flush=True)
        elif sys.argv[2] == "train":
            cfg, model, variables, args = _setup_pmf(jax, jnp)
            sps = bench_train(jax, jnp, model, variables, args)
            print(json.dumps({
                "train_metric": "pmf_r34_kitti_train_scans_per_sec_per_chip",
                "train_value": round(sps, 2), "train_batch": BATCH}),
                flush=True)
        elif sys.argv[2] == "epmf":
            sps = bench_epmf_eval(jax, jnp)
            print(json.dumps({
                "epmf_metric": "epmf_r34_kitti_eval_scans_per_sec_per_chip",
                "epmf_value": round(sps, 2)}), flush=True)
        return

    jax, jnp = _setup_jax()
    result = None
    try:
        cfg, model, variables, args = _setup_pmf(jax, jnp)
        result = _headline(bench_eval(jax, jnp, model, variables, cfg, args))
    except Exception as e:  # transient relay/TPU errors happen
        print(f"# in-process eval failed ({type(e).__name__}), "
              "retrying in a subprocess", file=sys.stderr, flush=True)
        # never overshoot the budget: if less than a phase's worth of
        # time remains, give up cleanly rather than risk the driver
        # killing us mid-retry with no line printed
        left = BUDGET_S - elapsed()
        result = _run_phase("eval", left) if left >= MIN_PHASE_S else None
    if result is None:
        sys.exit(1)
    print(json.dumps(result), flush=True)  # headline lands NOW

    for phase in ("train", "epmf"):
        left = BUDGET_S - elapsed()
        if left < MIN_PHASE_S:
            break
        extra = _run_phase(phase, left)
        if extra is None and BUDGET_S - elapsed() >= MIN_PHASE_S:
            # one retry: transient relay/TPU errors are common enough
            # that round 4's first full run lost a phase to one
            extra = _run_phase(phase, BUDGET_S - elapsed())
        if extra:
            result.update(extra)
            print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
