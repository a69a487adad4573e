import time, numpy as np, jax, jax.numpy as jnp
np.asarray(jnp.ones(1))
import gridpp_tpu as gridpp

rng = np.random.default_rng(0)
n = 2000
lats, lons = np.meshgrid(np.linspace(55, 62, n), np.linspace(5, 12, n), indexing="ij")
grid = gridpp.Grid(lats, lons)
p = 10000
points = gridpp.Points(rng.uniform(55, 62, p), rng.uniform(5, 12, p), np.zeros(p), np.zeros(p))
background = jnp.asarray(rng.normal(280, 5, (n, n)).astype(np.float32))
structure = gridpp.BarnesStructure(10000.0)
pback = gridpp.nearest(grid, points, background)
pobs = jnp.asarray(np.asarray(pback) + rng.normal(0, 1, p).astype(np.float32))
ratios = np.full(p, 0.1, np.float32)
t0 = time.time()
pipe = gridpp.Pipeline(grid, points, structure, halfwidth=7, statistic=gridpp.Mean, max_points=10, ratios=ratios)
print("init:", round(time.time()-t0,1), "s", flush=True)
r = pipe._run_fast(background, pobs); r.block_until_ready()
t0=time.time()
for _ in range(5): r = pipe._run_fast(background, pobs)
r.block_until_ready()
dt = (time.time()-t0)/5
print(f"fast device-only: {dt*1000:.0f} ms -> {n*n/dt/1e6:.1f} M pts/s", flush=True)
# smooth alone
from gridpp_tpu.ops import neighbourhood as nops
f = jax.jit(lambda x: nops.neighbourhood(x, 7, int(gridpp.Mean)))
f(background).block_until_ready()
t0=time.time()
for _ in range(5): q = f(background)
q.block_until_ready(); print("smooth:", round((time.time()-t0)/5*1000,1), "ms")
