import time
import jax, jax.numpy as jnp
import numpy as np
from pigeons_tpu.ops import SliceSampler

B, D = 10240, 100
prec = 5.0
lp_fn = lambda x: -0.5 * prec * jnp.sum(x * x)
key = jax.random.key(0)
sl = SliceSampler()

@jax.jit
def explore(keys, x):
    def one(k, x):
        return sl.step(k, x, lp_fn(x), lp_fn, 1.0, (), 1)
    return jax.vmap(one)(keys, x)

for rep in range(4):
    kk = jax.random.fold_in(key, rep)
    x0 = jax.random.normal(kk, (B, D), jnp.float32) / jnp.sqrt(prec)
    keys = jax.vmap(lambda i: jax.random.fold_in(kk, i))(jnp.arange(B))
    jax.block_until_ready((x0, keys))
    t0 = time.perf_counter()
    out = explore(keys, x0)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ne = np.asarray(out.n_steps)
    print(f"rep{rep}: wall {dt*1e3:.1f} ms  evals mean {ne.mean():.1f} max {ne.max():.0f} us/iter {dt*1e6/ne.max():.2f}")
