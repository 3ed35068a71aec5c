"""Diagnose the EPMF train-step compile blowup on XLA:TPU.

Round-4 finding: the EPMF fwd+bwd program compiles >25 min at every
shape tried while every submodule alone compiles in seconds — backend
superlinearity. This probe measures AOT compile time (.lower().compile())

  stages : partial lidar-stream stacks with K = 1..4 fuse->resBlock
           stages (+ fixed context/tail), fwd+bwd — confirms where the
           superlinearity starts;
  flags  : the full EPMF train step at a small /64 shape under
           candidate mitigations (packed off, bf16 off, memory-fitting
           effort, latency-hiding scheduler off, remat).

Each case runs in a SUBPROCESS with a hard timeout (the parent never
imports jax), appending one JSON line per case to the output file.

Run:  python scripts/epmf_compile_probe.py [stages|flags|all] \
          [--timeout 1200] [--out /tmp/epmf_compile_probe.jsonl]
Case: python scripts/epmf_compile_probe.py --case <name>
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, B = 256, 1024, 2

STAGE_CASES = [f"stages{k}" for k in range(1, 5)]
FLAG_CASES = [
    "full_default",        # bf16 + packed, default compiler opts
    "full_unpacked",       # packed convs off
    "full_f32",            # f32 activations
    "full_memfit_low",     # memory_fitting_effort -1.0
    "full_no_lhs",         # latency-hiding scheduler off
    "full_remat",          # jax.checkpoint around the model apply
    "full_remat_unpacked",
]


def run_case(case: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", None)  # honest timing

    from pmf_tpu.models import EPMFNet
    from pmf_tpu.models.epmf import SalsaNextFusionV2

    t_start = time.perf_counter()

    if case.startswith("stages"):
        k = int(case[-1])

        # partial lidar stream: full context blocks, first k
        # fuse->resBlock stages, 1x1 head on the last stage output.
        # Images features are fed as constants-shaped inputs.
        from flax import linen as nn

        from pmf_tpu.models.epmf import SparseResContextBlock
        from pmf_tpu.models.layers import Conv
        from pmf_tpu.models.pmf import ResidualBasedFusionBlock
        from pmf_tpu.models.salsanext import ResBlock

        bc = 32

        class PartialStream(nn.Module):
            @nn.compact
            def __call__(self, x, img_feats, train: bool = True):
                c = SparseResContextBlock(bc, name="downCntx")(x, train)
                c = SparseResContextBlock(bc, name="downCntx2")(c, train)
                c = SparseResContextBlock(bc, stride=2, name="downCntx3")(c, train)
                widths = [bc, 2 * bc, 4 * bc, 8 * bc]
                outw = [2 * bc, 4 * bc, 8 * bc, 8 * bc]
                for i in range(k):
                    c = ResidualBasedFusionBlock(
                        widths[i], name=f"fusionblock_{i + 1}")(
                        c, img_feats[i], train)
                    c, _ = ResBlock(outw[i], 0.2,
                                    pooling=True, drop_out=i > 0,
                                    name=f"resBlock{i + 1}")(c, train)
                return Conv(20, (1, 1), name="head")(c)

        model = PartialStream()
        x = jnp.zeros((B, H, W, 5), jnp.float32)
        # img feature pyramid at the fused resolutions: fusion_i runs at
        # H/2/(2^i) (stride-2 context then a pool per resBlock)
        img_feats = [
            jnp.zeros((B, H // 2 // (2 ** i), W // 2 // (2 ** i),
                       [bc, 2 * bc, 4 * bc, 8 * bc][i]), jnp.float32)
            for i in range(4)]
        variables = jax.eval_shape(
            lambda: model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               x, img_feats, train=False))
        variables = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), variables)

        def loss_fn(params, x, img_feats, key):
            (out, _) = model.apply(
                {"params": params["params"],
                 "batch_stats": variables.get("batch_stats", {})},
                x, img_feats, train=True, rngs={"dropout": key},
                mutable=["batch_stats"])
            return (out.astype(jnp.float32) ** 2).mean()

        fn = jax.jit(jax.grad(loss_fn))
        t0 = time.perf_counter()
        lowered = fn.lower({"params": variables["params"]}, x, img_feats,
                           jax.random.PRNGKey(2))
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        size = compiled.memory_analysis()
        print(json.dumps({
            "case": case, "lower_s": round(t_lower, 1),
            "compile_s": round(t_compile, 1),
            "gen_code_mb": round(
                getattr(size, "generated_code_size_in_bytes", 0) / 2**20, 1),
            "total_s": round(time.perf_counter() - t_start, 1)}), flush=True)
        return

    # ---- full train-step cases -------------------------------------
    import numpy as np

    from pmf_tpu.train import (LossConfig, TrainState, hybrid_pmf_optimizer,
                               make_pmf_train_step, warmup_cosine_lr)

    use_packed = "unpacked" not in case
    dtype = jnp.float32 if "f32" in case else jnp.bfloat16
    model = EPMFNet(nclasses=20, base_channels=32, image_backbone="resnet34",
                    dtype=dtype, use_packed=use_packed)

    @jax.jit
    def init_fn(key):
        return model.init({"params": key, "dropout": jax.random.PRNGKey(1)},
                          jnp.zeros((1, 64, 128, 5)),
                          jnp.zeros((1, 64, 128, 3)), train=False)

    variables = init_fn(jax.random.PRNGKey(0))
    tx = hybrid_pmf_optimizer(warmup_cosine_lr(1e-3, 100, 1000), 0.9, 1e-5)
    state = TrainState.create({"params": variables["params"],
                               "batch_stats": variables["batch_stats"]}, tx)
    cfg = LossConfig(nclasses=20, alpha=tuple([0.0] + [1.0] * 19))

    apply_model = model
    if "remat" in case:
        import functools

        class RematWrap:
            """model.apply wrapped in jax.checkpoint (recompute fwd in
            bwd): shrinks the live-range graph the scheduler sees."""

            def apply(self, vs, pcd, img, train=False, rngs=None,
                      mutable=None):
                f = functools.partial(model.apply, train=train, rngs=rngs,
                                      mutable=mutable)
                return jax.checkpoint(f)(vs, pcd, img)

        apply_model = RematWrap()

    step = make_pmf_train_step(apply_model, tx, cfg, donate=False)

    opts = {}
    if "memfit_low" in case:
        opts["memory_fitting_effort"] = -1.0
    if "no_lhs" in case:
        opts["xla_tpu_enable_latency_hiding_scheduler"] = "false"

    feature = jnp.zeros((B, H, W, 8), jnp.float32)
    label = jnp.zeros((B, H, W), jnp.int32)
    fn = jax.jit(lambda s, f, l, k: step(s, f, l, k),
                 compiler_options=opts or None)
    t0 = time.perf_counter()
    lowered = fn.lower(state, feature, label, jax.random.PRNGKey(2))
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    mem = compiled.memory_analysis()
    print(json.dumps({
        "case": case, "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
        "gen_code_mb": round(
            getattr(mem, "generated_code_size_in_bytes", 0) / 2**20, 1),
        "temp_gb": round(
            getattr(mem, "temp_size_in_bytes", 0) / 2**30, 2),
        "total_s": round(time.perf_counter() - t_start, 1)}), flush=True)


def main():
    if "--case" in sys.argv:
        run_case(sys.argv[sys.argv.index("--case") + 1])
        return
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    timeout = float(sys.argv[sys.argv.index("--timeout") + 1]) \
        if "--timeout" in sys.argv else 1200.0
    out_path = sys.argv[sys.argv.index("--out") + 1] \
        if "--out" in sys.argv else "/tmp/epmf_compile_probe.jsonl"
    cases = {"stages": STAGE_CASES, "flags": FLAG_CASES,
             "all": STAGE_CASES + FLAG_CASES}[which]
    with open(out_path, "a") as f:
        for case in cases:
            t0 = time.perf_counter()
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--case",
                     case], capture_output=True, text=True, timeout=timeout)
                lines = [ln for ln in r.stdout.splitlines()
                         if ln.startswith("{")]
                rec = json.loads(lines[-1]) if lines else {
                    "case": case, "error": r.stderr[-400:]}
            except subprocess.TimeoutExpired:
                rec = {"case": case, "timeout_s": timeout}
            rec["wall_s"] = round(time.perf_counter() - t0, 1)
            print(json.dumps(rec), flush=True)
            f.write(json.dumps(rec) + "\n")
            f.flush()


if __name__ == "__main__":
    main()
