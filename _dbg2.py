import numpy as np, jax, jax.numpy as jnp
np.asarray(jnp.ones(1))
import gridpp_tpu as gridpp
from gridpp_tpu.ops import oi_tiled as T

rng = np.random.default_rng(0)
ny = nx = 300   # force tiled threshold (90000 >= 65536)
olats, olons = np.meshgrid(np.linspace(55,60,ny), np.linspace(5,10,nx), indexing="ij")
ogrid = gridpp.Grid(olats, olons)
ds = rng.normal(280,5,(ny,nx)).astype(np.float32)
p = 200
pts = gridpp.Points(rng.uniform(55,60,p), rng.uniform(5,10,p), np.zeros(p), np.zeros(p))
struct = gridpp.BarnesStructure(50000.0)
pobs = gridpp.nearest(ogrid, pts, ds) + rng.normal(0,1,p).astype(np.float32)
ratios = np.full(p, 0.1, np.float32)

pf = gridpp.Pipeline(ogrid, pts, struct, max_points=10, candidates=20, tiled=False)
pt_ = gridpp.Pipeline(ogrid, pts, struct, max_points=10, candidates=20, tiled=True)
a = pf(ds, pobs, ratios); b = pt_(ds, pobs, ratios)
d = np.abs(a-b)
print("max diff:", d.max(), "frac>1e-4:", (d>1e-4).mean())
ij = np.unravel_index(np.argmax(d), d.shape)
print("worst cell:", ij, a[ij], b[ij], "bg:", ds[ij])
# geometry of that cell in tiled path
geom = pt_._geom
i, j = ij
yp, xp, ty, tx = geom.grid_pad
t = (i//geom.th)*tx + (j//geom.tw)
w = (i%geom.th)*geom.tw + (j%geom.tw)
li = geom.local_idx[t, w]; va = geom.valid[t, w]; rh = geom.rho[t, w]
print("tiled cand obs:", geom.tile_table[t][li][va])
print("tiled rho:", rh[va])
