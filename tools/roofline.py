"""Roofline characterization of the device-side hot kernels.

For each production kernel, XLA's own cost analysis (FLOPs + bytes
accessed) is combined with on-device wall time (a jitted lax.fori_loop of
ITERS applications, so per-dispatch latency - ~24 ms over the axon
tunnel - is amortized away) to derive achieved GFLOP/s and GB/s.
SURVEY.md section 5 asks for exactly this: per-kernel roofline notes
guiding perf work.

    python tools/roofline.py              # real device (TPU under axon)
    python tools/roofline.py --trace DIR  # also write a jax.profiler
                                          # trace (open with xprof /
                                          # tensorboard-plugin-profile)
    JAX_PLATFORMS=cpu python tools/roofline.py

Prints a markdown table (pasted into BENCH_OPS.md).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


ITERS = 20


def characterize(name, make_fn, *args):
    import jax

    fn = make_fn()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))

    def loop(x_args):
        import jax.lax as lax
        # fold each output back into arg0 so no iteration is dead code
        # (requires fn(out, rest...) to be shape-stable, true for all
        # kernels characterized here)
        out = lax.fori_loop(0, ITERS,
                            lambda i, a: (fn(*a),) + a[1:], x_args)
        return out[0]

    import jax
    largs = tuple(jax.device_put(a) for a in args)
    run = jax.jit(loop)
    jax.block_until_ready(run(largs))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(run(largs))
    dt = (time.perf_counter() - t0) / ITERS
    return {
        "kernel": name,
        "time_ms": dt * 1e3,
        "gflops": flops / dt / 1e9 if flops else 0.0,
        "gbytes_s": bytes_acc / dt / 1e9 if bytes_acc else 0.0,
        "flops_per_byte": flops / bytes_acc if bytes_acc else 0.0,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", metavar="DIR", default=None,
                    help="write a jax.profiler trace of the benchmark "
                         "loops to DIR")
    opts = ap.parse_args()

    import contextlib
    import jax
    import jax.numpy as jnp

    import gridpp_tpu as gridpp
    from gridpp_tpu.constants import Statistic
    from gridpp_tpu.ops import neighbourhood as nops
    from gridpp_tpu.ops.oi import oi_block_dense

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})", flush=True)
    np.asarray(jax.device_put(np.ones(1)))  # first-transfer warmup

    rng = np.random.default_rng(0)
    rows = []

    trace_ctx = (jax.profiler.trace(opts.trace) if opts.trace
                 else contextlib.nullcontext())
    _trace = contextlib.ExitStack()
    _trace.enter_context(trace_ctx)

    x2k = rng.random((2048, 2048)).astype(np.float32)
    rows.append(characterize(
        "neighbourhood mean 2048^2 h=7",
        lambda: (lambda a: nops.neighbourhood(a, 7, int(Statistic.Mean))),
        x2k))
    rows.append(characterize(
        "neighbourhood max 2048^2 h=7",
        lambda: (lambda a: nops.neighbourhood(a, 7, int(Statistic.Max))),
        x2k))
    thr = np.linspace(0, 1, 11).astype(np.float32)
    rows.append(characterize(
        "quantile_fast 2048^2 T=11",
        lambda: (lambda a, t: nops.neighbourhood_quantile_fast(
            a, 0.5, 7, t)), x2k, thr))

    # dense OI block: B gridpoints x P obs rho sweep + top-k + solve
    b, p, s = 16384, 4096, 10
    structure = gridpp.BarnesStructure(10000.0)
    from gridpp_tpu.api.oi import _origin, _resolved_fields
    pts = gridpp.Points(rng.uniform(55, 62, p), rng.uniform(5, 12, p),
                        np.zeros(p), np.zeros(p))
    gpts = gridpp.Points(rng.uniform(55, 62, b), rng.uniform(5, 12, b),
                         np.zeros(b), np.zeros(b))
    origin = _origin(gpts)
    p1 = {k: np.asarray(v, np.float32).reshape(b, 1)
          for k, v in _resolved_fields(gpts, structure, origin).items()}
    of = {k: np.asarray(v, np.float32)
          for k, v in _resolved_fields(pts, structure, origin).items()}
    bg = rng.normal(280, 5, b).astype(np.float32)
    pobs = rng.normal(280, 5, p).astype(np.float32)

    def make_oi():
        def fn(bg, p1x, p1y, p1z, p1e, p1l):
            p1d = {"x": p1x, "y": p1y, "z": p1z, "elev": p1e, "laf": p1l}
            out, _ = oi_block_dense(
                structure, p1d, {k: jnp.asarray(v) for k, v in of.items()},
                bg, jnp.ones_like(bg), jnp.asarray(pobs),
                jnp.asarray(pobs), jnp.full((p,), 0.1, jnp.float32), s,
                True)
            return out
        return fn

    rows.append(characterize(
        f"OI dense block B={b} P={p} S={s}", make_oi, bg,
        p1["x"], p1["y"], p1["z"], p1["elev"], p1["laf"]))

    _trace.close()
    if opts.trace:
        print(f"profiler trace written to {opts.trace}")

    print("| kernel | time (ms) | GFLOP/s | GB/s | FLOPs/byte |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['kernel']} | {r['time_ms']:.2f} | {r['gflops']:.1f} "
              f"| {r['gbytes_s']:.1f} | {r['flops_per_byte']:.2f} |")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
