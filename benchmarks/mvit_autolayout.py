"""AUTO-layout arguments vs default-layout arguments vs closure: MViT gate.

Follow-up to benchmarks/mvit_gate_vs_harness.py, which isolated the
289-vs-368 clips/s bimodality to the weights' calling convention: as jit
ARGUMENTS (default row-major layouts) the step pays ~11 ms of relayout
copies; CLOSED OVER (compile-time constants) XLA materializes them in its
preferred layouts and the copies vanish.

Closure is not a serving story (weights baked per compile); the production
fix is XLA's AUTO argument layouts: compile with
``in_shardings=Format(Layout.AUTO)``, read back ``compiled.input_formats``,
and ``device_put`` the weights into those layouts once at load time.
This measures all three in one session.

Run: python benchmarks/mvit_autolayout.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout

    import bench

    device = bench._devices_with_timeout(900)[0]
    cpu = jax.devices("cpu")[0]
    print(json.dumps({"env": bench._env_record(device)}), flush=True)

    from pytorchvideo_tpu.accelerate import fuse_bn_mvit
    from pytorchvideo_tpu.models import hub

    model = hub.mvit_base_16x4()
    B, T, S = 16, 16, 224
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, T, S, S, 3)), False
        )
        if "batch_stats" in variables:
            variables = fuse_bn_mvit(variables)
        variables = {
            "params": jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), variables["params"]
            ),
            **{k: v for k, v in variables.items() if k != "params"},
        }
    variables = jax.device_put(variables, device)
    x = bench._rand_input((B, T, S, S, 3), device)

    # (a) default-layout args (the current gate): 289 mode
    arg_sample = bench._make_sampler(bench._model_loop(model), (variables, x), B)

    # (b) AUTO-layout args: compile with AUTO (lowered on ShapeDtypeStructs),
    # device_put into the chosen formats, then run the same loop.
    def model_loop_body(variables, xs, n):
        def body(i, carry):
            xs, acc = carry
            out = model.apply(variables, xs, False)
            probe = out.mean().astype(jnp.float32)
            return (xs + (probe * 1e-24).astype(xs.dtype), acc + probe)

        _, acc = jax.lax.fori_loop(0, n, body, (xs, jnp.float32(0)))
        return acc

    auto_jit = jax.jit(model_loop_body, in_shardings=Format(Layout.AUTO))
    sds = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), (variables, x)
    )
    n_sds = jax.ShapeDtypeStruct((), jnp.int32)
    lowered = auto_jit.lower(sds[0], sds[1], n_sds)
    compiled = lowered.compile()
    in_fmts, _kw_fmts = compiled.input_formats
    vars_auto = jax.device_put(variables, in_fmts[0])
    x_auto = jax.device_put(x, in_fmts[1])

    def auto_fn(v, xs, n):
        return compiled(v, xs, n)

    # sampler over the AOT-compiled auto-layout executable: n is baked?
    # No — n was a traced arg; compiled takes it as input (an int array).
    auto_sample = None
    try:
        n_small_auto = jax.device_put(jnp.int32(bench.N_SMALL), in_fmts[2])
        n_big_auto = jax.device_put(jnp.int32(bench.N_BIG), in_fmts[2])
        # (scalar formats are trivial; kept for call-convention symmetry)
        float(auto_fn(vars_auto, x_auto, n_small_auto))
        float(auto_fn(vars_auto, x_auto, n_big_auto))
        auto_ok = True
    except Exception as e:
        print(json.dumps({"auto_call_error": str(e)[:300]}), flush=True)
        auto_ok = False

    if auto_ok:
        import time as _t

        def auto_sample():
            best_small = best_big = float("inf")
            for _ in range(bench.N_TRIALS):
                t0 = _t.perf_counter()
                float(auto_fn(vars_auto, x_auto, n_small_auto))
                best_small = min(best_small, _t.perf_counter() - t0)
                t0 = _t.perf_counter()
                float(auto_fn(vars_auto, x_auto, n_big_auto))
                best_big = min(best_big, _t.perf_counter() - t0)
            return B / ((best_big - best_small) / (bench.N_BIG - bench.N_SMALL))

    # (c) closure baseline: 368 mode
    @jax.jit
    def closure_loop(xs, n):
        def body(i, carry):
            xs, acc = carry
            out = model.apply(variables, xs, False)
            probe = out.mean().astype(jnp.float32)
            return (xs + (probe * 1e-24).astype(xs.dtype), acc + probe)

        _, acc = jax.lax.fori_loop(0, n, body, (xs, jnp.float32(0)))
        return acc

    closure_sample = bench._make_sampler(closure_loop, (x,), B)

    for r in range(3):
        row = {
            "round": r,
            "arg_default_layout_clips_s": round(arg_sample(), 1),
            "closure_clips_s": round(closure_sample(), 1),
        }
        if auto_sample is not None:
            row["arg_auto_layout_clips_s"] = round(auto_sample(), 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
