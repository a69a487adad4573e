import time, numpy as np, jax, jax.numpy as jnp
np.asarray(jnp.ones(1))
import gridpp_tpu as gridpp

rng = np.random.default_rng(0)
ny, nx, p = 400, 400, 500
olats, olons = np.meshgrid(np.linspace(55,60,ny), np.linspace(5,10,nx), indexing="ij")
ogrid = gridpp.Grid(olats, olons)
ds = rng.normal(280,5,(ny,nx)).astype(np.float32)
pts = gridpp.Points(rng.uniform(55,60,p), rng.uniform(5,10,p), np.zeros(p), np.zeros(p))
struct = gridpp.BarnesStructure(50000.0)
sm = gridpp.neighbourhood(ds, 7, gridpp.Mean)
pobs = gridpp.nearest(ogrid, pts, ds) + rng.normal(0,1,p).astype(np.float32)
ratios = np.full(p, 0.1, np.float32)
ref = gridpp.optimal_interpolation(ogrid, sm, pts, pobs, ratios, gridpp.nearest(ogrid, pts, sm), struct, 10)
pipe = gridpp.Pipeline(ogrid, pts, struct, halfwidth=7, statistic=gridpp.Mean, max_points=10, tiled=True, ratios=ratios)
out = pipe(ds, pobs)   # fast path (all valid)
d = np.abs(out - ref)
print("fast path: max|diff|=", float(np.nanmax(d)), "mismatched:", int((d>1e-4).sum()))
# general fallback with a NaN obs
pobs2 = pobs.copy(); pobs2[0] = np.nan
ref2 = gridpp.optimal_interpolation(ogrid, sm, pts, pobs2, ratios, gridpp.nearest(ogrid, pts, sm), struct, 10)
out2 = pipe(ds, pobs2)
d2 = np.abs(out2 - ref2)
print("general fallback: max|diff|=", float(np.nanmax(d2)), "mismatched:", int((d2>1e-4).sum()))
