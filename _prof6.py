import time, numpy as np, jax, jax.numpy as jnp
np.asarray(jnp.ones(1))
import gridpp_tpu as gridpp
import gridpp_tpu.ops.oi_tiled as T

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
ratios = jnp.asarray(np.full(p, 0.1, np.float32))

for ts in ((32,64),(16,128),(64,128)):
    t0 = time.time()
    pipe = gridpp.Pipeline(grid, points, structure, halfwidth=7, statistic=gridpp.Mean, max_points=10, tiled=True, tile_shape=ts)
    print(f"init tile={ts}: {time.time()-t0:.1f}s C={pipe._geom.c_cap}", flush=True)
    geom = pipe._geom; gdev = pipe._geom_dev
    keys = tuple(geom.static_keys)
    bg_t = T.tile_fields(background, geom)
    flat = background.reshape(-1)
    pb = jnp.take(flat, pipe._obs_nn)
    packed = jnp.stack([pobs, pb, ratios, jnp.ones_like(pobs)], axis=1)
    for nt in (4, 8, 16, 32):
        @jax.jit
        def f(bt, pk, gd, nt=nt):
            return T.oi_tiled_sweep(structure, gd, keys, bt, jnp.ones_like(bt), pk, 10, True, tiles_per_step=nt)[0]
        r = f(bg_t, packed, gdev); r.block_until_ready()
        t0=time.time()
        for _ in range(3): r = f(bg_t, packed, gdev)
        r.block_until_ready()
        print(f"tile={ts} C={geom.c_cap} nt={nt}: {(time.time()-t0)/3*1000:.0f} ms", flush=True)
