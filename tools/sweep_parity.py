"""Dense-network serving-parity sweep: every pipeline vs the host API.

Round-4 verdict weak #1 repro class: 80x80 geodetic grid, 300 obs (all
valid), BarnesStructure(30 km), max_points=10, default candidates. With
canonical selection (ops/canonical.py) every pipeline must match its
API function to solve-numerics tolerance (<1e-2) at every gridpoint.

Usage: python tools/sweep_parity.py [seed_lo seed_hi]
Exits non-zero when any divergence exceeds 1e-2.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gridpp_tpu as gridpp  # noqa: E402


def problem(seed, n=80, n_obs=300):
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


def run_seed(seed, mp=10, e=8, tol=1e-2):
    grid, pts, background, pback, pobs, ratios, structure = problem(seed)
    n_obs = pts.size()
    rng = np.random.default_rng(1000 + seed)
    rows = {}

    plain = gridpp.optimal_interpolation(grid, background, pts, pobs,
                                         ratios, pback, structure, mp)
    pipe = gridpp.Pipeline(grid, pts, structure, halfwidth=0,
                           max_points=mp)
    rows["pipeline"] = np.abs(pipe(background, pobs, ratios) - plain).max()

    bg3 = (np.repeat(background[:, :, None], e, axis=2)
           + rng.normal(0, 1, background.shape + (e,))).astype(np.float32)
    idx = grid.nearest_map(pts.lats, pts.lons)
    pb3 = bg3.reshape(-1, e)[idx]
    psig = np.full(n_obs, 1.5, np.float32)
    want = gridpp.optimal_interpolation_ensi(grid, bg3, pts, pobs, psig,
                                             pb3, structure, mp)
    epipe = gridpp.EnsiPipeline(grid, pts, structure, max_points=mp)
    rows["ensi"] = np.abs(epipe(bg3, pobs, psig) - want).max()

    bgc = (np.repeat(background[:, :, None], e, axis=2)
           + rng.normal(0, 1, background.shape + (e,))).astype(np.float32)
    pbc = bgc.reshape(-1, e)[idx]
    bratios = np.ones(grid.size()[0] * grid.size()[1], np.float32)
    pobs_e = (pb3 + rng.normal(0, 1, (n_obs, e))).astype(np.float32)

    want = gridpp.optimal_interpolation_ensi_multi_ebesc(
        grid, bratios, bg3, pts, pobs_e, ratios, pb3, structure, mp)
    mpipe = gridpp.MultiEnsiPipeline(grid, pts, structure,
                                     variant="ebesc", max_points=mp)
    rows["ebesc"] = np.abs(mpipe(bg3, pobs_e, ratios) - want).max()

    want = gridpp.optimal_interpolation_ensi_multi_ebe(
        grid, bratios, bg3, bgc, pts, pobs_e, ratios, pb3, pbc,
        structure, mp)
    mpipe = gridpp.MultiEnsiPipeline(grid, pts, structure, variant="ebe",
                                     max_points=mp)
    rows["ebe"] = np.abs(
        mpipe(bg3, pobs_e, ratios, background_corr=bgc) - want).max()

    want = gridpp.optimal_interpolation_ensi_multi_utem(
        grid, bratios, bg3, bgc, pts, pobs, ratios, pb3, pbc,
        structure, mp)
    upipe = gridpp.MultiEnsiPipeline(grid, pts, structure, variant="utem",
                                     max_points=mp)
    rows["utem"] = np.abs(
        upipe(bg3, pobs, ratios, background_corr=bgc) - want).max()

    bad = {k: v for k, v in rows.items() if not (v < tol)}
    print(f"seed {seed}: " + "  ".join(f"{k}={v:.3g}"
                                       for k, v in rows.items())
          + ("  <-- FAIL" if bad else ""), flush=True)
    return not bad


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    ok = all([run_seed(s) for s in range(lo, hi)])
    print("PARITY " + ("PASS" if ok else "FAIL"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
