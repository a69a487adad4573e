import time, numpy as np, jax, jax.numpy as jnp
np.asarray(jnp.ones(1))
import gridpp_tpu as gridpp

rng = np.random.default_rng(0)
olats, olons = np.meshgrid(np.linspace(55,60,400), np.linspace(5,10,400), indexing="ij")
ogrid = gridpp.Grid(olats, olons)
ds = rng.normal(280,5,(400,400)).astype(np.float32)
p = 500
pts = gridpp.Points(rng.uniform(55,60,p), rng.uniform(5,10,p), np.zeros(p), np.zeros(p))
struct = gridpp.BarnesStructure(50000.0)
sm = gridpp.neighbourhood(ds, 7, gridpp.Mean)
pobs = gridpp.nearest(ogrid, pts, ds) + rng.normal(0,1,p).astype(np.float32)
pobs[rng.random(p) < 0.2] = np.nan
ratios = np.full(p, 0.1, np.float32)
ref = gridpp.optimal_interpolation(ogrid, sm, pts, pobs, ratios, gridpp.nearest(ogrid, pts, sm), struct, 10)
for tiled in (False, True):
    pipe = gridpp.Pipeline(ogrid, pts, struct, halfwidth=7, statistic=gridpp.Mean, max_points=10, candidates=40, tiled=tiled)
    out = pipe(ds, pobs, ratios)
    d = np.abs(out - ref)
    print(f"tiled={tiled}: max|diff|={float(np.nanmax(d)):.6g} mismatched={int((d>1e-4).sum())}")
