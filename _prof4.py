import time, numpy as np, jax, jax.numpy as jnp
np.asarray(jnp.ones(1))
rng = np.random.default_rng(0)
B, K, P, C, F = 16384, 20, 10000, 128, 8

def timeit(name, f, *args, iters=256):
    jax.block_until_ready(f(*args)); t0=time.time()
    for _ in range(iters): r = f(*args)
    jax.block_until_ready(r); print(name, round(time.time()-t0,3), "s /", iters)

idx = jnp.asarray(rng.integers(0,P,(B,K)).astype(np.int32))
v1 = jnp.asarray(rng.normal(0,1,P).astype(np.float32))
v2 = jnp.asarray(rng.normal(0,1,(P,F)).astype(np.float32))
timeit("a: scalar take (B,K) from (P,)", jax.jit(lambda i,v: jnp.take(v,i)), idx, v1)
timeit("d: row take (B,K) from (P,8)", jax.jit(lambda i,v: jnp.take(v,i,axis=0)), idx, v2)

# tile-local: 8 tiles/chunk, each tile TB=2048, local idx < C=128
TB, NT = 2048, 8
lidx = jnp.asarray(rng.integers(0,C,(NT,TB,K)).astype(np.int32))
table = jnp.asarray(rng.normal(0,1,(NT,C,F)).astype(np.float32))
def tile_take(li, tb):
    return jax.vmap(lambda i,t: jnp.take(t,i,axis=0))(li.reshape(NT,-1), tb).reshape(NT,TB,K,F)
timeit("b: per-tile take from (C,8)", jax.jit(tile_take), lidx, table)
def tile_onehot(li, tb):
    oh = (li[..., None] == jnp.arange(C, dtype=jnp.int32)).astype(jnp.float32)  # (NT,TB,K,C)
    return jnp.einsum('ntkc,ncf->ntkf', oh, tb)
timeit("c: per-tile onehot matmul", jax.jit(tile_onehot), lidx, table)
