"""Benchmark: the BASELINE.json north-star configuration.

2000x2000 grid: neighbourhood mean (h=7) + deterministic OI with 10k point
observations (BarnesStructure, max_points=10). Reports sustained end-to-end
grid-points/s (host precompute amortized via warm caches, device compute +
transfers included).

Baseline: the reference's benchmark table (tests/benchmark.py, Intel i7
1 thread) gives 2.05 s for neighbourhood-mean per 1e8 points (0.082 s at
2000^2) and 12.5K gridpoints/s for OI => combined ~12.5K pts/s at 2000^2.

Prints ONE JSON line.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    np.asarray(jnp.ones(1))  # device init + first D2H (slow on axon tunnel)

    import gridpp_tpu as gridpp

    rng = np.random.default_rng(0)
    n = 2000
    lats, lons = np.meshgrid(np.linspace(55, 62, n), np.linspace(5, 12, n),
                             indexing="ij")
    grid = gridpp.Grid(lats, lons)
    p = 10000
    points = gridpp.Points(rng.uniform(55, 62, p), rng.uniform(5, 12, p),
                           np.zeros(p), np.zeros(p))
    background = rng.normal(280, 5, (n, n)).astype(np.float32)
    structure = gridpp.BarnesStructure(10000.0)
    pback = gridpp.nearest(grid, points, background)
    pobs = pback + rng.normal(0, 1, p).astype(np.float32)
    ratios = np.full(p, 0.1, np.float32)

    # Fused production path: neighbourhood smooth + OI in one device
    # program; one upload, one download per cycle.
    pipe = gridpp.Pipeline(grid, points, structure, halfwidth=7,
                           statistic=gridpp.Mean, max_points=10,
                           ratios=ratios)
    pipe(background, pobs, ratios)  # warm-up: jit compile + caches

    # Sustained serving throughput: stream CYCLES forecast cycles through
    # the device (async dispatch overlaps each cycle's upload with the
    # previous cycle's compute, as a production server would), then sync.
    # 8 cycles: the per-cycle download rides the axon tunnel, whose
    # throughput varies run to run; more cycles average that out
    cycles = 8
    bgs = [background + np.float32(i) for i in range(cycles)]
    obs = [pobs + np.float32(i) for i in range(cycles)]
    valid = all(np.isfinite(b).all() for b in bgs) and \
        all(np.isfinite(o).all() for o in obs)
    t0 = time.time()
    outs = [pipe.run_device(jnp.asarray(bgs[i]), jnp.asarray(obs[i]),
                            assume_valid=valid) for i in range(cycles)]
    outs = [np.asarray(o) for o in outs]
    dt = (time.time() - t0) / cycles
    assert all(np.isfinite(o).all() for o in outs)

    # The general serving path (dynamic network: full tiled re-solve per
    # cycle, no precomputed gains) - reported alongside so the fast
    # path's static-network assumption is visible.
    pipe.run_device(jnp.asarray(bgs[0]), jnp.asarray(obs[0]),
                    path="general")  # warm-up/compile
    t0 = time.time()
    outs_g = [pipe.run_device(jnp.asarray(bgs[i]), jnp.asarray(obs[i]),
                              path="general") for i in range(cycles)]
    outs_g = [np.asarray(o) for o in outs_g]
    dt_general = (time.time() - t0) / cycles
    assert all(np.isfinite(o).all() for o in outs_g)

    # Ensemble OI (EnSI) serving path — BASELINE.json's north-star target
    # is 2000^2 ENSEMBLE OI with 10k obs. Device-resident cycle: member
    # fields stay on device, per cycle only obs values change.
    n_ens = 10
    bg_ens = jnp.asarray(
        rng.normal(280, 5, (n, n, n_ens)).astype(np.float32))
    psig = jnp.asarray(np.full(p, 1.5, np.float32))
    epipe = gridpp.EnsiPipeline(grid, points, structure, max_points=10)
    valid_e = bool(np.isfinite(np.asarray(bg_ens)).all()
                   and all(np.isfinite(o).all() for o in obs))
    out_e, _ = epipe.run_device(bg_ens, jnp.asarray(pobs), psig,
                                assume_valid=valid_e)
    jax.block_until_ready(out_e)  # compile + warm
    t0 = time.time()
    outs_e = [epipe.run_device(bg_ens, jnp.asarray(obs[i]), psig,
                               assume_valid=valid_e)[0]
              for i in range(cycles)]
    jax.block_until_ready(outs_e)
    dt_ensi = (time.time() - t0) / cycles
    assert np.isfinite(np.asarray(outs_e[0])).all()

    baseline = 12_490.0  # reference combined gridpoints/s (see docstring)
    value_general = n * n / dt_general
    value_fast = n * n / dt
    value_ensi = n * n / dt_ensi
    # Headline = the GENERAL serving path (full tiled re-solve per cycle,
    # no static-network assumption); the static-ratios fast path and the
    # ensemble (EnSI) path are reported alongside with their own ratios.
    print(json.dumps({
        "metric": "oi2000sq_plus_neighbourhood_gridpoints_per_s",
        "value": round(value_general, 1),
        "unit": "gridpoints/s",
        "vs_baseline": round(value_general / baseline, 2),
        "path_fast_static_ratios_pts_per_s": round(value_fast, 1),
        "path_fast_static_ratios_vs_baseline": round(value_fast / baseline,
                                                     2),
        "path_general_dynamic_pts_per_s": round(value_general, 1),
        "path_general_dynamic_vs_baseline": round(value_general / baseline,
                                                  2),
        "ensi_10member_pts_per_s": round(value_ensi, 1),
        "ensi_10member_vs_baseline": round(value_ensi / baseline, 2),
    }))


if __name__ == "__main__":
    main()
