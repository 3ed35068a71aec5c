"""Benchmark: end-to-end SemanticKITTI-eval inference throughput on one chip.

Measures the full per-scan pipeline of the flagship config (PMF-ResNet34,
384×1232 eval resolution): on-device projection + z-buffer scatter +
normalization + two-stream forward + argmax, on synthetic scans, batch 8
(offline eval batches freely; cf. the reference eval loop
tasks/pmf_eval_semantickitti/infer.py:87-108 which is per-scan only
because torch preprocessing is host-bound).

Architecture (rounds 3+4 recorded rc!=0 with NO number — this file is
now built so that failure requires the TPU to be down for the whole
budget):

  parent process: NEVER imports jax (the axon relay handshake can hang
  indefinitely — observed >5 min in jax.devices()). It only launches
  phase subprocesses under hard watchdog timeouts, streams their stdout
  line-by-line, and prints the headline JSON the moment the first
  measured line arrives. Phases:

    eval_fast    headline, codegen effort −0.7: 27 MB executable,
                 sub-minute warm setup, ~69 scans/s. Retried until it
                 lands or the budget is gone.
    train        PMF train step (default effort; −0.7 makes its compile
                 take >25 min).
    epmf         EPMF eval at its /64 config (effort −0.7).
    epmf_train   EPMF train step, bs 4 (bs 8 OOMs HBM; reference trains
                 at bs 2/GPU).
    eval_default same program as eval_fast at default effort: ~345 MB
                 executable, ~77 scans/s (+12%). Upgrades the headline.

  Every printed line carries the full headline {metric, value, unit,
  vs_baseline}; the LAST line is the most complete. Exit 0 iff a
  headline landed.

Timing methodology (axon relay): `block_until_ready` does not reliably
block through the relay, so we chain an epsilon of each result into the
next call INSIDE jit (no eager ops in the loop) and force one real
np.asarray fetch at the end — device execution is in-order, so the last
result completing implies all N executed.

MFU: each phase also reports analytic model FLOPs (exact jaxpr walk
over the static conv/matmul shapes, pmf_tpu/utils/flops.py) and the
resulting MFU against the v5e bf16 peak (197 TFLOP/s). This replaces
the 2080-Ti→A100 extrapolation as the primary efficiency claim;
vs_baseline is kept for continuity with BENCH_r01..r04: the EPMF paper
reports the torch PMF pipeline at ~125 ms/scan on an RTX 2080 Ti
(~8 FPS); an A100 is roughly 3× a 2080 Ti on this workload, giving
A100_EST ≈ 25 scans/s, so vs_baseline = value / (2 * 25) and >1.0
beats the north-star target (BASELINE.md).
"""
import json
import os
import subprocess
import sys
import threading
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
CACHE_DIR = "/root/repo/.jax_cache"
CACHE_CAP_BYTES = int(float(os.environ.get("BENCH_CACHE_CAP_GB", "5")) * 2**30)


def elapsed():
    return time.perf_counter() - T0


def remaining():
    return BUDGET_S - elapsed()


def mark(msg: str):
    """Timestamped stderr breadcrumb (phase subprocesses inherit stderr →
    slow relay RPCs become visible in the driver tail instead of looking
    like a silent hang)."""
    print(f"# [t={elapsed():5.1f}s] {msg}", file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# parent-side orchestration (no jax here — ever)
# --------------------------------------------------------------------------

def prune_cache():
    """Bound .jax_cache: drop entries older than 14 days, then oldest-
    first down to CACHE_CAP_BYTES. Warns (stderr) when the cache looks
    cold so a silent recompile is at least visible in the driver tail."""
    try:
        entries = []
        now = time.time()
        for name in os.listdir(CACHE_DIR):
            p = os.path.join(CACHE_DIR, name)
            st = os.stat(p)
            if now - st.st_mtime > 14 * 86400:
                os.unlink(p)
                continue
            entries.append((st.st_mtime, st.st_size, p))
        entries.sort()
        total = sum(s for _, s, _ in entries)
        while entries and total > CACHE_CAP_BYTES:
            _, size, path = entries.pop(0)
            os.unlink(path)
            total -= size
        if total < 10 * 2**20:
            print(f"# warning: .jax_cache nearly empty ({total} B) — "
                  "expect cold compiles", file=sys.stderr, flush=True)
    except OSError:
        pass


INACTIVITY_S = float(os.environ.get("BENCH_INACTIVITY_S", "100"))
# silence allowance while a [longcompile] breadcrumb is the latest line:
# must cover the worst legitimate cold compile of that phase (train is
# ~505 s at default effort; everything else lands well under 420 s)
LONG_INACTIVITY_S = {"train": 900.0, "epmf_train": 1500.0}
LONG_INACTIVITY_DEFAULT_S = 420.0


def run_phase(phase: str, timeout_s: float):
    """Run one phase subprocess; stream stdout/stderr and return the list
    of parsed JSON lines seen before exit/timeout (a line that landed
    before a relay hang still counts).

    Stage-aware watchdog (the observed relay failure mode is a random
    per-connection hang — even on cached cheap steps — while a
    legitimate cold compile of the big pipeline is minutes of silence):
    a phase that goes quiet for INACTIVITY_S anywhere EXCEPT inside a
    breadcrumb marked [longcompile] is killed early so the budget buys a
    fresh-connection retry; the big compiles get the full timeout."""
    if timeout_s <= 5:
        return []
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--phase", phase],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    lines: list = []
    state = {"last": time.perf_counter(), "compiling": False}

    def reader(stream, is_stdout):
        try:
            for ln in stream:
                ln = ln.strip()
                state["last"] = time.perf_counter()
                state["compiling"] = "[longcompile]" in ln
                if is_stdout and ln.startswith("{"):
                    try:
                        lines.append(json.loads(ln))
                    except json.JSONDecodeError:
                        pass
                elif not is_stdout:
                    print(ln, file=sys.stderr, flush=True)
        except ValueError:
            pass

    ts = [threading.Thread(target=reader, args=(proc.stdout, True), daemon=True),
          threading.Thread(target=reader, args=(proc.stderr, False), daemon=True)]
    for t in ts:
        t.start()
    deadline = time.perf_counter() + timeout_s
    long_allow = LONG_INACTIVITY_S.get(phase, LONG_INACTIVITY_DEFAULT_S)
    while proc.poll() is None and time.perf_counter() < deadline:
        quiet = time.perf_counter() - state["last"]
        allow = long_allow if state["compiling"] else INACTIVITY_S
        if quiet > allow:
            stage = "during long compile" if state["compiling"] \
                else "before any compile"
            print(f"# {phase}: no progress for {quiet:.0f}s {stage} — "
                  "killing for a fresh-connection retry",
                  file=sys.stderr, flush=True)
            break
        time.sleep(0.5)
    if proc.poll() is None:
        proc.kill()
    for t in ts:
        t.join(timeout=5)
    return lines


def _headline(result: dict) -> dict:
    sps = result["value"]
    out = {
        "metric": "pmf_r34_kitti_eval_scans_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "scans/sec",
        "vs_baseline": round(sps / TARGET, 3),
    }
    for k in ("mfu_eval", "flops_per_scan", "codegen_effort"):
        if k in result:
            out[k] = result[k]
    return out


def orchestrate():
    prune_cache()
    result = None

    # headline: retry the fast phase until it lands or budget is gone.
    # Each attempt is a fresh relay handshake — observed hangs are
    # per-connection, so retrying beats waiting.
    while result is None and remaining() > 40:
        lines = run_phase("eval_fast", remaining() - 8)
        for ln in lines:
            if "value" in ln:
                result = ln
        if result is None:
            print(f"# eval_fast attempt failed at t={elapsed():.0f}s, "
                  f"{remaining():.0f}s left", file=sys.stderr, flush=True)
    if result is None:
        print("# no headline within budget — TPU/relay unavailable",
              file=sys.stderr, flush=True)
        sys.exit(1)
    headline = _headline(result)
    print(json.dumps(headline), flush=True)  # the driver's number lands NOW

    # opportunistic upgrades, most-valuable first (train is the judged
    # target; eval_default is only a +10% headline bump but needs the
    # 345 MB default-effort executable); every success reprints a fuller
    # line (the last line is the most complete).
    for phase, min_left in (("train", 90), ("epmf", 90),
                            ("epmf_train", 90), ("eval_default", 100)):
        if remaining() < min_left:
            break
        lines = run_phase(phase, remaining() - 8)
        if not lines and remaining() > min_left:
            # one retry: the common failure is a pre-compile connection
            # hang, which the watchdog kills within INACTIVITY_S
            lines = run_phase(phase, remaining() - 8)
        got = {}
        for ln in lines:
            got.update(ln)
        if not got:
            continue
        if phase == "eval_default":
            if got.get("value", 0) <= headline["value"]:
                continue
            extras = {k: v for k, v in headline.items()
                      if k.startswith(("train_", "epmf_", "mfu_train",
                                       "mfu_epmf"))}
            headline = {**_headline(got), **extras}
        else:
            headline.update(got)
        print(json.dumps(headline), flush=True)
    sys.exit(0)


# --------------------------------------------------------------------------
# phase implementations (subprocess side — may import jax)
# --------------------------------------------------------------------------

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


def _setup_jax():
    import jax

    # persistent compilation cache: the driver re-runs bench each round
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
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

    mark("compiling init_fn (small)")
    variables = init_fn(jax.random.PRNGKey(0))
    # variables passed as args (not closure constants) → stable compile
    # cache key across runs
    args = tuple(map(jnp.asarray, raw))
    return cfg, model, variables, args


def _eval_pipeline_fn(jax, jnp, model, cfg):
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

    return scan_pipeline


def phase_eval(effort_default: bool):
    mark("phase_eval: importing jax")
    jax, jnp = _setup_jax()
    mark("jax up; building model/inputs (first device RPCs)")
    cfg, model, variables, args = _setup_pmf(jax, jnp)
    mark("init done; compiling pipeline [longcompile]")
    fn = _eval_pipeline_fn(jax, jnp, model, cfg)
    opts = ({"exec_time_optimization_effort": 0.0}
            if effort_default else None)
    jfn = jax.jit(fn, compiler_options=opts) if opts else jax.jit(fn)

    eps = jnp.float32(0.0)
    out, eps = jfn(variables, eps, *args)
    mark("compile dispatched; fetching first result")
    np.asarray(out[0, :2, :2])  # force compile + first execution
    mark("first execution fetched; timing")
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        out, eps = jfn(variables, eps, *args)
    np.asarray(eps)
    dt = (time.perf_counter() - t0) / N_ITERS
    sps = BATCH / dt
    line = {"value": round(sps, 2),
            "codegen_effort": "default" if effort_default else "-0.7"}
    print(json.dumps(line), flush=True)  # measured value lands first
    # enrich with analytic MFU (pure tracing, no device work)
    from pmf_tpu.utils.flops import V5E_BF16_PEAK_FLOPS, count_flops
    flops = count_flops(fn, variables, jnp.float32(0.0), *args)
    line["flops_per_scan"] = round(flops / BATCH / 1e9, 2)  # GFLOP
    line["mfu_eval"] = round(flops / BATCH * sps / V5E_BF16_PEAK_FLOPS, 4)
    print(json.dumps(line), flush=True)


def phase_train():
    global BATCH
    BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", str(BATCH)))
    mark("phase_train: importing jax")
    jax, jnp = _setup_jax()
    mark("jax up; building model/inputs")
    cfg0, model, variables, args = _setup_pmf(jax, jnp)
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
    def train_fn(state, key, points, labels, valid, proj_matrix, image,
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

    import functools
    train_iter = functools.partial(
        jax.jit, donate_argnums=(0,),
        compiler_options={"exec_time_optimization_effort": 0.0})(train_fn)

    key = jax.random.PRNGKey(0)
    mark("compiling train step [longcompile]")
    state, aux = train_iter(state, key, *args)
    np.asarray(aux["loss"])  # compile + warm
    mark("train step warm; timing")
    t0 = time.perf_counter()
    for _ in range(N_TRAIN_ITERS):
        state, aux = train_iter(state, key, *args)
    np.asarray(aux["loss"])
    dt = (time.perf_counter() - t0) / N_TRAIN_ITERS
    sps = BATCH / dt
    line = {"train_metric": "pmf_r34_kitti_train_scans_per_sec_per_chip",
            "train_value": round(sps, 2), "train_batch": BATCH}
    print(json.dumps(line), flush=True)
    from pmf_tpu.utils.flops import V5E_BF16_PEAK_FLOPS, count_flops
    flops = count_flops(train_fn, state, key, *args)
    line["train_flops_per_scan"] = round(flops / BATCH / 1e9, 2)
    line["mfu_train"] = round(flops / BATCH * sps / V5E_BF16_PEAK_FLOPS, 4)
    print(json.dumps(line), flush=True)


def phase_epmf():
    """EPMF (efficient variant) eval throughput at its /64 config —
    V2 pipeline (yaw-crop, tight bbox) + half-res lidar stream
    (epmf_net.py:82-131)."""
    mark("phase_epmf: importing jax")
    jax, jnp = _setup_jax()
    mark("jax up; building model/inputs")
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

    def epmf_fn(variables, eps, points, labels, valid, proj_matrix,
                image, ih, iw):
        f, m, l = build_v2_batch(jax.random.PRNGKey(0), points + eps,
                                 labels, valid, proj_matrix, image, ih, iw,
                                 cfg, False)
        lidar, cam = model.apply(variables, f[..., :5], f[..., 5:8],
                                 train=False)
        from pmf_tpu.ops import argmax_last
        pred = argmax_last(lidar)
        return pred, (pred[0, 0, 0] * 0).astype(jnp.float32)

    epmf_pipeline = jax.jit(epmf_fn)

    eps = jnp.float32(0.0)
    mark("compiling EPMF pipeline [longcompile]")
    out, eps = epmf_pipeline(variables, eps, *args)
    np.asarray(out[0, :2, :2])
    mark("EPMF pipeline warm; timing")
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        out, eps = epmf_pipeline(variables, eps, *args)
    np.asarray(eps)
    dt = (time.perf_counter() - t0) / N_ITERS
    sps = BATCH / dt
    line = {"epmf_metric": "epmf_r34_kitti_eval_scans_per_sec_per_chip",
            "epmf_value": round(sps, 2)}
    print(json.dumps(line), flush=True)
    from pmf_tpu.utils.flops import V5E_BF16_PEAK_FLOPS, count_flops
    flops = count_flops(epmf_fn, variables, jnp.float32(0.0), *args)
    line["epmf_flops_per_scan"] = round(flops / BATCH / 1e9, 2)
    line["mfu_epmf"] = round(flops / BATCH * sps / V5E_BF16_PEAK_FLOPS, 4)
    print(json.dumps(line), flush=True)


def phase_epmf_train():
    """EPMF full train step at the KITTI config shape (320×1216, bs 8):
    V2 preprocessing + SparseVariantConv forward + losses + backward +
    hybrid optimizer + metrics, one fused program. Parity target:
    tasks/epmf/trainer.py (round-4 gap: no driver-recorded EPMF train
    number because the compile ran >25 min; the sparse-mask-chain
    stop_gradient in models/epmf.py removed the SelectAndScatter blowup).

    Batch 4: bs8 at this shape OOMs the v5e's 16 GB HBM (~23 GB of
    backward temps); the reference itself trains EPMF-KITTI at bs2 per
    GPU (tasks/epmf/config_server_kitti.yaml:14), so 4/chip is already
    2× the reference's per-device batch."""
    mark("phase_epmf_train: importing jax")
    jax, jnp = _setup_jax()
    mark("jax up; building model/inputs")
    from pmf_tpu.data.perspective_pipeline_v2 import V2Config, build_v2_batch
    from pmf_tpu.models import EPMFNet
    from pmf_tpu.train import (LossConfig, TrainState, hybrid_pmf_optimizer,
                               make_pmf_train_step, warmup_cosine_lr)

    batch = int(os.environ.get("BENCH_EPMF_TRAIN_BATCH", "4"))
    use_remat = os.environ.get("BENCH_EPMF_TRAIN_REMAT", "0") == "1"
    effort = float(os.environ.get("BENCH_EPMF_TRAIN_EFFORT", "0.0"))
    h, w = 320, 1216
    cfg = V2Config(canvas_h=H, canvas_w=W + 16, proj_h=h, proj_w=w,
                   proj_ht=h, proj_wt=w, n_points=N_POINTS)
    model = EPMFNet(nclasses=20, base_channels=32, image_backbone="resnet34",
                    dtype=jnp.bfloat16, use_packed=True)
    raw = make_inputs(np.random.default_rng(2), batch)
    args = tuple(map(jnp.asarray, raw))

    @jax.jit
    def init_fn(key):
        return model.init({"params": key, "dropout": jax.random.PRNGKey(1)},
                          jnp.zeros((1, 64, 128, 5)),
                          jnp.zeros((1, 64, 128, 3)), train=False)

    mark("compiling init_fn (small)")
    variables = init_fn(jax.random.PRNGKey(0))
    tx = hybrid_pmf_optimizer(warmup_cosine_lr(1e-3, 100, 10000), 0.9, 1e-5)
    state = TrainState.create({"params": variables["params"],
                               "batch_stats": variables["batch_stats"]}, tx)
    loss_cfg = LossConfig(nclasses=20, alpha=tuple([0.0] + [1.0] * 19),
                          use_mtloss=False)
    step = make_pmf_train_step(model, tx, loss_cfg, donate=False,
                               remat=use_remat)

    # Image-domain Lovász (points=None), matching the shipped EPMF
    # configs (`point_lovasz: false`): XLA:TPU fails to compile the
    # EPMF train step WITH the point-domain pair loss in any reasonable
    # time (4× >25 min at bs4 320×1216, default AND −0.7 effort,
    # 2026-08), while this variant compiles in ~254 s. The sorts cost
    # ~35% of the step (scripts/trace_epmf_train.py); flip
    # BENCH_EPMF_TRAIN_POINTS=1 to re-probe the point path when XLA
    # updates land.
    use_points = os.environ.get("BENCH_EPMF_TRAIN_POINTS", "0") == "1"

    def train_fn(state, key, points, labels, valid, proj_matrix, image,
                 ih, iw):
        key = jax.random.fold_in(key, state.step)
        if use_points:
            f, m, l, pts = build_v2_batch(key, points, labels, valid,
                                          proj_matrix, image, ih, iw, cfg,
                                          True, return_points=True)
            return step(state, f, l, key, pts)
        f, m, l = build_v2_batch(key, points, labels, valid, proj_matrix,
                                 image, ih, iw, cfg, True)
        return step(state, f, l, key)

    import functools
    train_iter = functools.partial(
        jax.jit, donate_argnums=(0,),
        compiler_options={"exec_time_optimization_effort": effort})(train_fn)

    key = jax.random.PRNGKey(0)
    mark(f"compiling EPMF train step (effort {effort}) [longcompile]")
    state, aux = train_iter(state, key, *args)
    np.asarray(aux["loss"])
    mark("EPMF train step warm; timing")
    t0 = time.perf_counter()
    for _ in range(N_TRAIN_ITERS):
        state, aux = train_iter(state, key, *args)
    np.asarray(aux["loss"])
    dt = (time.perf_counter() - t0) / N_TRAIN_ITERS
    sps = batch / dt
    line = {"epmf_train_metric":
            "epmf_r34_kitti_train_scans_per_sec_per_chip",
            "epmf_train_value": round(sps, 2), "epmf_train_batch": batch}
    print(json.dumps(line), flush=True)
    from pmf_tpu.utils.flops import V5E_BF16_PEAK_FLOPS, count_flops
    flops = count_flops(train_fn, state, key, *args)
    line["epmf_train_flops_per_scan"] = round(flops / batch / 1e9, 2)
    line["mfu_epmf_train"] = round(flops / batch * sps / V5E_BF16_PEAK_FLOPS,
                                   4)
    print(json.dumps(line), flush=True)


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--phase":
        phase = sys.argv[2]
        if phase == "eval_fast":
            phase_eval(effort_default=False)
        elif phase == "eval_default":
            phase_eval(effort_default=True)
        elif phase == "train":
            phase_train()
        elif phase == "epmf":
            phase_epmf()
        elif phase == "epmf_train":
            phase_epmf_train()
        return
    orchestrate()


if __name__ == "__main__":
    main()
