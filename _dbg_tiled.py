import numpy as np, jax, jax.numpy as jnp
import gridpp_tpu as gridpp
from gridpp_tpu.ops import oi_tiled as T

# 1) tile/untile roundtrip
rng = np.random.default_rng(1)
x = rng.normal(0,1,(70,90)).astype(np.float32)
class G: pass
sel = np.zeros((70*90, 3), np.int64); rho = np.ones((70*90,3), np.float32); val = np.ones((70*90,3), bool)
obs_f = {"x": np.arange(10.0)}
geom = T.build_tile_tables(sel, rho, val, obs_f, (70,90), th=16, tw=32)
xt = T.tile_fields(jnp.asarray(x), geom)
xb = np.asarray(T.untile_fields(xt, geom))
print("roundtrip ok:", np.array_equal(x, xb))

# 2) tile scatter of sel: does rho land at the right gridpoint?
y, xx = 70, 90
n = y*xx
rho2 = rng.random((n, 3)).astype(np.float32)
geom2 = T.build_tile_tables(np.tile(np.arange(3), (n,1)), rho2, np.ones((n,3),bool), obs_f, (y,xx), th=16, tw=32)
# gridpoint (i,j) row-major flat = i*xx+j should map to tile[i//16 * (96//32) + j//32], within (i%16)*32 + j%32
i, j = 37, 55
t = (i//16)*(96//32) + (j//32)
w = (i%16)*32 + (j%32)
print("rho scatter ok:", np.allclose(geom2.rho[t, w], rho2[i*xx+j]))
# local_idx maps back to original obs index
li = geom2.local_idx[t, w]
print("table remap ok:", np.array_equal(geom2.tile_table[t][li], np.arange(3)))
