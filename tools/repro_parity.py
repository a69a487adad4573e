"""Reproduce the round-4 judge's dense-network single-gridpoint
serving-parity divergence and instrument the selection at the bad points.

80x80 geodetic grid, 300 obs (all valid), BarnesStructure(30 km),
max_points=10, default candidates (2x), seed 7.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gridpp_tpu as gridpp  # noqa: E402


def problem(seed=7, n=80, n_obs=300):
    rng = np.random.default_rng(seed)
    lats, lons = np.meshgrid(np.linspace(55, 58, n),
                             np.linspace(5, 8, n), indexing="ij")
    grid = gridpp.Grid(lats, lons)
    pts = gridpp.Points(rng.uniform(55, 58, n_obs),
                        rng.uniform(5, 8, n_obs),
                        np.zeros(n_obs), np.zeros(n_obs))
    background = rng.normal(280, 5, (n, n)).astype(np.float32)
    pback = gridpp.nearest(grid, pts, background)
    pobs = (pback + rng.normal(0, 2, n_obs)).astype(np.float32)
    ratios = np.full(n_obs, 0.2, np.float32)
    structure = gridpp.BarnesStructure(30000.0)
    return grid, pts, background, pback, pobs, ratios, structure


def main():
    grid, pts, background, pback, pobs, ratios, structure = problem()
    mp = 10

    plain = gridpp.optimal_interpolation(grid, background, pts, pobs,
                                         ratios, pback, structure, mp)

    pipe = gridpp.Pipeline(grid, pts, structure, halfwidth=0,
                           max_points=mp)
    out = pipe(background, pobs, ratios)
    d = np.abs(out - plain)
    print("Pipeline: max|d| =", d.max(), " n>1e-3 =", (d > 1e-3).sum(),
          " p99.9 =", np.quantile(d, 0.999))
    bad = np.argwhere(d > 1e-3)
    print("bad points:", bad[:10])

    # instrument the worst point
    if bad.size:
        iy, ix = bad[np.argmax(d[tuple(bad.T)])]
        flat_i = iy * grid.size()[1] + ix
        print(f"worst at ({iy},{ix}) flat={flat_i}: plain={plain[iy, ix]}"
              f" pipe={out[iy, ix]} bg={background[iy, ix]}")
        # device shortlist at that point
        from gridpp_tpu.api.oi import (_device_fields, _origin,
                                       _resolved_fields)
        from gridpp_tpu.ops.oi import make_oi_select_sweep
        bpoints = grid.to_points()
        origin = _origin(bpoints)
        p1 = _device_fields(bpoints, structure, origin)
        of = _device_fields(pts, structure, origin)
        sel, rho, valid = make_oi_select_sweep(structure, 20, 16384)(p1, of)
        sel_i = np.asarray(sel[flat_i])
        rho_i = np.asarray(rho[flat_i])
        val_i = np.asarray(valid[flat_i])
        print("device shortlist obs:", sel_i[val_i])
        print("device shortlist rho:", rho_i[val_i])
        # host rho in f64 against every obs using numpy structure eval
        p1_np = _resolved_fields(bpoints, structure, origin)
        o_np = _resolved_fields(pts, structure, origin)
        p1_i = {k: np.asarray(v)[flat_i:flat_i + 1].astype(np.float64)
                for k, v in p1_np.items()}
        o_all = {k: np.asarray(v).astype(np.float64)[None, :]
                 for k, v in o_np.items()}
        rho_np = structure.corr_background_np(
            {k: v[:, None] for k, v in p1_i.items()}, o_all)[0]
        order = np.argsort(-rho_np, kind="stable")
        print("host(np f64) top-12 obs:", order[:12])
        print("host(np f64) top-12 rho:", rho_np[order[:12]])
        # f32 host rho
        p1_32 = {k: v.astype(np.float32) for k, v in p1_i.items()}
        o_32 = {k: v.astype(np.float32) for k, v in o_all.items()}
        rho_32 = structure.corr_background_np(
            {k: v[:, None] for k, v in p1_32.items()}, o_32)[0]
        order32 = np.argsort(-rho_32, kind="stable")
        print("host(np f32) top-12 obs:", order32[:12])
        print("host(np f32) top-12 rho:", rho_32[order32[:12]])

    # EnsiPipeline
    e = 8
    rng = np.random.default_rng(7)
    bg3 = np.repeat(background[:, :, None], e, axis=2) + \
        rng.normal(0, 1, background.shape + (e,)).astype(np.float32)
    bg3 = bg3.astype(np.float32)
    idx = grid.nearest_map(pts.lats, pts.lons)
    pb3 = bg3.reshape(-1, e)[idx]
    psig = np.full(pts.size(), 1.5, np.float32)
    want = gridpp.optimal_interpolation_ensi(grid, bg3, pts, pobs, psig,
                                             pb3, structure, mp)
    epipe = gridpp.EnsiPipeline(grid, pts, structure, max_points=mp)
    got = epipe(bg3, pobs, psig)
    de = np.abs(got - want)
    print("EnsiPipeline: max|d| =", de.max(), " n>1e-2 =",
          (de > 1e-2).sum() // e, " p99.9 =", np.quantile(de, 0.999))


if __name__ == "__main__":
    main()
