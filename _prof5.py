import time, numpy as np, jax, jax.numpy as jnp
np.asarray(jnp.ones(1))
rng = np.random.default_rng(0)
NT, TB, K, C, F = 8, 2048, 20, 128, 8
lidx = jnp.asarray(rng.integers(0,C,(NT,TB,K)).astype(np.int32))
table = jnp.asarray(rng.normal(280,30,(NT,C,F)).astype(np.float32))
def f(li, tb, prec):
    oh = (li[..., None] == jnp.arange(C, dtype=jnp.int32)).astype(jnp.float32)
    return jnp.einsum('ntkc,ncf->ntkf', oh, tb, precision=prec)
for prec in ("default", "highest"):
    g = jax.jit(lambda li,tb,p=prec: f(li,tb,p))
    r = g(lidx, table); jax.block_until_ready(r)
    # exactness
    ref = np.asarray(table)[np.arange(NT)[:,None,None], np.asarray(lidx)]
    print(prec, "exact:", np.array_equal(np.asarray(r), ref), end=" ")
    t0=time.time()
    for _ in range(256): r = g(lidx, table)
    jax.block_until_ready(r); print("time:", round(time.time()-t0,3))
