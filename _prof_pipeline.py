import time, numpy as np, jax, jax.numpy as jnp
np.asarray(jnp.ones(1))
import gridpp_tpu as gridpp
from gridpp_tpu.ops import neighbourhood as nops

rng = np.random.default_rng(0)
n = 2000
lats, lons = np.meshgrid(np.linspace(55, 62, n), np.linspace(5, 12, n), indexing="ij")
grid = gridpp.Grid(lats, lons)
p = 10000
points = gridpp.Points(rng.uniform(55, 62, p), rng.uniform(5, 12, p), np.zeros(p), np.zeros(p))
background = jnp.asarray(rng.normal(280, 5, (n, n)).astype(np.float32))

# neighbourhood alone
f = jax.jit(lambda x: nops.neighbourhood(x, 7, int(gridpp.Mean)))
f(background).block_until_ready()
t0 = time.time(); f(background).block_until_ready(); print("neighbourhood mean h=7:", time.time()-t0)

# full pipeline
structure = gridpp.BarnesStructure(10000.0)
pback = gridpp.nearest(grid, points, background)
pobs = pback + rng.normal(0, 1, p).astype(np.float32)
ratios = np.full(p, 0.1, np.float32)
pipe = gridpp.Pipeline(grid, points, structure, halfwidth=7, statistic=gridpp.Mean, max_points=10)
pipe(background, pobs, ratios)
t0 = time.time()
out = pipe.run_device(background, jnp.asarray(pobs), jnp.asarray(ratios))
out.block_until_ready()
print("pipeline device-only:", time.time()-t0)
t0 = time.time(); pipe(background, pobs, ratios); print("pipeline with transfers:", time.time()-t0)
