"""Benchmark driver: one JSON line for the round harness.

Flagship metric (round 1): aggregate MinRoot iterations/sec across
lane-batched VDF evaluation on the available accelerator (the driver
runs this on one real TPU chip).

vs_baseline compares against the Rust reference evaluating its single
sequential chain on a high-end CPU core: the reference publishes no
numbers (BASELINE.md), so we use a documented estimate of ~1e5
iterations/sec (254-square addition chain at ~40ns/field-mul on the
suggested Threadripper 3970x, /root/reference/src/minroot.rs:49-50).
The reference cannot batch lanes; aggregate throughput is the honest
apples-to-apples capability comparison (BASELINE.json config 4).
"""

from __future__ import annotations

import argparse
import json
import time

RUST_SINGLE_CHAIN_ITERS_PER_SEC = 1.0e5  # documented estimate, see above


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
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

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

    result = {
        "metric": "minroot_aggregate_iters_per_sec",
        "value": round(iters_per_sec, 1),
        "unit": "vdf_iters/s",
        "vs_baseline": round(iters_per_sec / RUST_SINGLE_CHAIN_ITERS_PER_SEC, 3),
        "detail": {
            "lanes": lanes,
            "t_per_segment": t,
            "segments": n_rep,
            "iters_per_sec_per_lane": round(per_lane, 2),
            "wall_seconds": round(dt, 3),
            "mode": args.mode,
            "path": "fused_pallas" if use_fused else "xla_scan",
            "backend": jax.devices()[0].platform,
            "baseline_note": "rust single-chain ~1e5 iters/s (estimate; reference publishes none)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
