import time, numpy as np, jax, jax.numpy as jnp
from functools import partial

rng = np.random.default_rng(0)
desc = (rng.integers(0, 2, (1000, 256))).astype(np.int8)
cb = (rng.integers(0, 2, (1024, 256))).astype(np.int8)
desc_p = np.packbits(desc.astype(np.uint8), axis=-1).view(np.uint32).reshape(1000, 8)
cb_p = np.packbits(cb.astype(np.uint8), axis=-1).view(np.uint32).reshape(1024, 8)

from orbslam3_cpp_fork_tpu.ops import matching

@jax.jit
def nearest_tpu(d, c):
    return jnp.argmin(matching.hamming_matrix(d, c), axis=1)

cpu = jax.devices("cpu")[0]

@partial(jax.jit, device=cpu)
def nearest_cpu_packed(dp, cp):
    x = jax.lax.population_count(dp[:, None, :] ^ cp[None, :, :])
    return jnp.argmin(x.sum(-1), axis=1)

@partial(jax.jit, device=cpu)
def nearest_cpu_mm(d, c):
    return jnp.argmin(matching.hamming_matrix(d, c), axis=1)

def timeit(name, f, n=20):
    f()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        f()
    print(f"{name:24s} {(time.perf_counter()-t0)/n*1e3:7.2f} ms")

dj, cj = jnp.asarray(desc), jnp.asarray(cb)
dpc = jax.device_put(desc_p, cpu); cpc = jax.device_put(cb_p, cpu)
dc = jax.device_put(desc, cpu); cc = jax.device_put(cb, cpu)
timeit("tpu matmul+fetch", lambda: np.asarray(nearest_tpu(dj, cj)))
timeit("cpu packed popcount", lambda: np.asarray(nearest_cpu_packed(dpc, cpc)))
timeit("cpu packed w/ upload", lambda: np.asarray(nearest_cpu_packed(jax.device_put(desc_p, cpu), cpc)))
timeit("cpu matmul", lambda: np.asarray(nearest_cpu_mm(dc, cc)))
# numpy bitwise_count
def np_nearest():
    x = np.bitwise_count(desc_p[:, None, :] ^ cb_p[None, :, :]).sum(-1)
    return np.argmin(x, axis=1)
timeit("numpy bitwise_count", np_nearest, n=5)
a = np.asarray(nearest_tpu(dj, cj)); b = np.asarray(nearest_cpu_packed(dpc, cpc)); c2 = np_nearest()
print("agree:", (a==b).mean(), (a==c2).mean())
