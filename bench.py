"""Benchmark driver: one JSON line for the round harness.

Flagship metric (round 1): aggregate MinRoot iterations/sec across
lane-batched VDF evaluation on the available accelerator (the driver
runs this on one real TPU chip).

vs_baseline compares against the reference's workload — one sequential
chain on a CPU core — measured LIVE with this repo's native C++
evaluator (vdf_tpu/native, the same 4x64 Montgomery arithmetic a Rust
build uses; the reference publishes no numbers, BASELINE.md).  Falls
back to a documented 1e5 iters/s estimate if the native build fails.
The reference cannot batch lanes; aggregate throughput is the honest
apples-to-apples capability comparison (BASELINE.json config 4).
"""

from __future__ import annotations

import argparse
import json
import time

RUST_SINGLE_CHAIN_ITERS_PER_SEC = 1.0e5  # fallback estimate


def measure_native_baseline() -> tuple[float, str]:
    try:
        from vdf_tpu.native import minroot_eval_native

        minroot_eval_native("Fq", 7, 0, 0, 200)  # warm/build
        t0 = time.perf_counter()
        n = 20000
        minroot_eval_native("Fq", 7, 0, 0, n)
        dt = time.perf_counter() - t0
        return n / dt, "native C++ single-chain, measured"
    except Exception as exc:  # build/toolchain failure: fall back
        return RUST_SINGLE_CHAIN_ITERS_PER_SEC, f"estimate (native failed: {exc})"


def bench_folding(args):
    """Nova folding steps/sec (BASELINE config 2/3): witness synthesis +
    Pedersen commit + NIFS fold per step, via the jitted step function."""
    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from vdf_tpu.minroot import pallas_vdf
    from vdf_tpu.nova import NovaVDFProof, eval_and_make_circuits, public_params

    t = args.iters or (2 if args.smoke else 64)
    n = 3 if args.smoke else 8

    vdf = pallas_vdf()
    s0 = vdf.state_from_ints(987654321, 0, 1)
    pp = public_params(t)
    z0, circuits = eval_and_make_circuits(vdf, t, n, s0)

    # Warm (compiles the step executable).
    proof = NovaVDFProof.prove_recursively(pp, circuits[:1], z0)
    jax.block_until_ready((proof.snark.U, proof.snark.W))
    t0 = time.perf_counter()
    proof = NovaVDFProof.prove_recursively(pp, circuits, z0)
    jax.block_until_ready((proof.snark.U, proof.snark.W))
    dt = time.perf_counter() - t0
    assert proof.verify(pp, n, z0, [s0.x, s0.y, s0.i]), "folding bench proof invalid"

    steps_per_sec = n / dt
    result = {
        "metric": "nova_folding_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": "folds/s",
        "vs_baseline": None,
        "detail": {
            "t_iters_per_step": t,
            "num_steps": n,
            "constraints_per_step": pp.dev_shape.shape.num_cons,
            "wall_seconds": round(dt, 2),
            "verified": True,
            "backend": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="small CPU-friendly shapes")
    ap.add_argument("--lanes", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--mode", default="ltr_sequential")
    ap.add_argument(
        "--xla-path",
        action="store_true",
        help="bench the pure-XLA scan path instead of the fused Pallas kernel",
    )
    ap.add_argument(
        "--folding",
        action="store_true",
        help="bench Nova folding steps/sec instead of raw VDF throughput",
    )
    args = ap.parse_args()

    if args.folding:
        return bench_folding(args)

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from vdf_tpu.minroot import EvalMode, State, pallas_vdf

    lanes = args.lanes or (64 if args.smoke else 16384)
    t = args.iters or (8 if args.smoke else 256)
    on_tpu = not args.smoke and jax.devices()[0].platform == "tpu"
    use_fused = on_tpu and not args.xla_path

    vdf = pallas_vdf(EvalMode(args.mode))
    f = vdf.field
    s0 = State(
        f.encode([3 + k for k in range(lanes)]),
        f.encode([0] * lanes),
        f.encode([0] * lanes),
    )

    import functools

    if use_fused:
        from vdf_tpu.minroot.fused import eval_fused

        eval_fn = functools.partial(eval_fused, vdf, t=t, block_sublanes=32)
    else:
        eval_fn = jax.jit(functools.partial(vdf.eval_uncached, t=t))

    # Warmup/compile + correctness gate: never report timings for wrong
    # math (backend numeric quirks must fail loudly, not skew numbers).
    r = eval_fn(s0)
    jax.block_until_ready(r.x)
    check = f.decode(r.x[:2])
    p, e = f.params.modulus, f.params.inv_alpha
    for lane in range(2):
        x, y, i = 3 + lane, 0, 0
        for _ in range(t):
            x, y, i = pow((x + y) % p, e, p), (x + i) % p, (i + 1) % p
        assert check[lane] == x, f"bench correctness gate failed on lane {lane}"

    # Timed runs (chain segments end-to-end, like Evaluation.append use).
    n_rep = 2 if args.smoke else 4
    t0 = time.perf_counter()
    s = s0
    for _ in range(n_rep):
        s = eval_fn(s)
    jax.block_until_ready(s.x)
    dt = time.perf_counter() - t0

    total_iters = lanes * t * n_rep
    iters_per_sec = total_iters / dt
    per_lane = iters_per_sec / lanes
    baseline, baseline_src = measure_native_baseline()

    result = {
        "metric": "minroot_aggregate_iters_per_sec",
        "value": round(iters_per_sec, 1),
        "unit": "vdf_iters/s",
        "vs_baseline": round(iters_per_sec / baseline, 3),
        "detail": {
            "lanes": lanes,
            "t_per_segment": t,
            "segments": n_rep,
            "iters_per_sec_per_lane": round(per_lane, 2),
            "wall_seconds": round(dt, 3),
            "mode": args.mode,
            "path": "fused_pallas" if use_fused else "xla_scan",
            "backend": jax.devices()[0].platform,
            "baseline_iters_per_sec": round(baseline, 1),
            "baseline_note": baseline_src,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
