"""Does while-loop per-iteration cost scale with carry size on this TPU?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

NBATCH = 10_000
N_ITERS = 1000


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, *args):
    sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def trial(n_arrays, shape, dtype, label, touch_all=False):
    arrays = [jnp.full(shape, 1.0 + i, dtype) for i in range(n_arrays)]

    @jax.jit
    def run(arrays):
        def body(c):
            arrays, k = c
            if touch_all:
                arrays = [a * 1.0000001 for a in arrays]
            else:
                arrays = [arrays[0] * 1.0000001] + arrays[1:]
            return (arrays, k + 1)

        return jax.lax.while_loop(lambda c: c[1] < N_ITERS, body, (arrays, 0))

    t = timeit(run, arrays)
    nbytes = sum(a.nbytes for a in arrays)
    print(f"{label:44s}: {t/N_ITERS*1e6:7.1f} us/iter ({nbytes/1e6:.1f} MB carry)")


trial(1, (3, NBATCH), jnp.float64, "1 x (3,10k) f64, touch 1")
trial(8, (3, NBATCH), jnp.float64, "8 x (3,10k) f64, touch 1")
trial(32, (3, NBATCH), jnp.float64, "32 x (3,10k) f64, touch 1")
trial(32, (3, NBATCH), jnp.float64, "32 x (3,10k) f64, touch all", touch_all=True)
trial(4, (8, 3, NBATCH), jnp.float64, "4 x (8,3,10k) f64, touch 1")
trial(1, (8, 3, NBATCH), jnp.float64, "1 x (8,3,10k) f64, touch 1")

# cond returning a large pytree, inside a while loop
arrays = [jnp.full((8, 3, NBATCH), 1.0 + i, jnp.float64) for i in range(4)]

@jax.jit
def run_cond(arrays):
    def body(c):
        arrays, k = c
        arrays = jax.lax.cond(
            k % 2 == 0,
            lambda a: [x * 1.0000001 for x in a],
            lambda a: a,
            arrays,
        )
        return (arrays, k + 1)

    return jax.lax.while_loop(lambda c: c[1] < N_ITERS, body, (arrays, 0))

t = timeit(run_cond, arrays)
print(f"{'cond over 4 x (8,3,10k) in while':44s}: {t/N_ITERS*1e6:7.1f} us/iter")
