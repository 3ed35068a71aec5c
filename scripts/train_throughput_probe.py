"""A/B train-step throughput on the real TPU: baseline vs remat.

Round-4 anatomy (README): fwd 68 ms, fwd+bwd 338 ms at bs8 — the
backward is ~4x the forward where ~2x is compute-parity, and the
default-effort build holds 15.7 GB of temps → spill suspicion. remat
shrinks the live set at +1/3 fwd FLOPs; if the backward is
spill-bound it should win.

Each case compiles+measures in a subprocess (hard timeout, persistent
cache on) and prints one JSON line.

Run:  python scripts/train_throughput_probe.py [--timeout 1500]
Case: python scripts/train_throughput_probe.py --case base|remat
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = ["base", "remat", "remat07", "bs16"]
BATCH = 8
N_ITERS = 8


def run_case(case: str):
    import numpy as np

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import bench

    batch = 16 if case == "bs16" else BATCH
    bench.BATCH = batch  # _setup_pmf reads the module global
    cfg0, model, variables, args = bench._setup_pmf(jax, jnp)
    from pmf_tpu.data import PVConfig, build_batch
    from pmf_tpu.train import (LossConfig, TrainState, hybrid_pmf_optimizer,
                               make_pmf_train_step, warmup_cosine_lr)

    cfg = PVConfig(canvas_h=bench.H, canvas_w=bench.W + 16, proj_h=bench.H,
                   proj_w=bench.W, proj_ht=bench.HT, proj_wt=bench.WT,
                   h_pad=7, w_pad=3, n_points=bench.N_POINTS)
    tx = hybrid_pmf_optimizer(warmup_cosine_lr(1e-3, 100, 10000), 0.9, 1e-5)
    state = TrainState.create({"params": variables["params"],
                               "batch_stats": variables["batch_stats"]}, tx)
    loss_cfg = LossConfig(nclasses=20, alpha=tuple([0.0] + [1.0] * 19))
    step = make_pmf_train_step(model, tx, loss_cfg, donate=False,
                               remat=case.startswith("remat"))

    import functools

    # remat07: remat shrinks the backward's live set — probe whether the
    # −0.7-effort codegen (3× smaller executables, >25 min compile on the
    # NON-remat train step) becomes tractable and how it runs
    effort = -0.7 if case == "remat07" else 0.0

    @functools.partial(
        jax.jit, donate_argnums=(0,),
        compiler_options={"exec_time_optimization_effort": effort})
    def train_iter(state, key, points, labels, valid, proj_matrix, image,
                   ih, iw):
        key = jax.random.fold_in(key, state.step)
        f, m, l, pts = build_batch(key, points, labels, valid, proj_matrix,
                                   image, ih, iw, cfg, True,
                                   return_points=True)
        return step(state, f, l, key, pts)

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state, aux = train_iter(state, key, *args)
    np.asarray(aux["loss"])
    setup_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        state, aux = train_iter(state, key, *args)
    np.asarray(aux["loss"])
    dt = (time.perf_counter() - t0) / N_ITERS
    print(json.dumps({"case": case, "scans_per_sec": round(batch / dt, 2),
                      "ms_per_step": round(dt * 1000, 1),
                      "setup_s": round(setup_s, 1), "batch": batch}),
          flush=True)


def main():
    if "--case" in sys.argv:
        run_case(sys.argv[sys.argv.index("--case") + 1])
        return
    timeout = float(sys.argv[sys.argv.index("--timeout") + 1]) \
        if "--timeout" in sys.argv else 1500.0
    for case in CASES:
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--case", case],
                capture_output=True, text=True, timeout=timeout)
            lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
            rec = json.loads(lines[-1]) if lines else {
                "case": case, "error": r.stderr[-300:]}
        except subprocess.TimeoutExpired:
            rec = {"case": case, "timeout_s": timeout}
        rec["wall_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
