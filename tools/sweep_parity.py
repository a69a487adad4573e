"""Sweep seeds looking for serving-pipeline vs host-API divergences."""
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


def main():
    mp = 10
    worst = 0.0
    for seed in range(int(sys.argv[1]) if len(sys.argv) > 1 else 0,
                      int(sys.argv[2]) if len(sys.argv) > 2 else 20):
        grid, pts, background, pback, pobs, ratios, structure = \
            problem(seed)
        plain = gridpp.optimal_interpolation(
            grid, background, pts, pobs, ratios, pback, structure, mp)
        pipe = gridpp.Pipeline(grid, pts, structure, halfwidth=0,
                               max_points=mp)
        out = pipe(background, pobs, ratios)
        d = np.abs(out - plain)
        nbad = int((d > 1e-3).sum())
        print(f"seed {seed}: max|d|={d.max():.4g} n>1e-3={nbad}",
              flush=True)
        worst = max(worst, float(d.max()))
    print("worst:", worst)


if __name__ == "__main__":
    main()
