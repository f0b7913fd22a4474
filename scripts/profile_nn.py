"""NN-search (chamfer association) microbench: scan vs Pallas kernel.

The consistency loss calls nn_search P*icp_iter times per train step
(up to 18 at proxy settings), so its cost multiplies.  Honest chained
timing, one fetch.  Usage: python -u scripts/profile_nn.py [reps]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import rslo_tpu.utils.jax_cache  # noqa: F401

import numpy as np
import jax
import jax.numpy as jnp

from rslo_tpu.ops.chamfer import nn_search, nn_search_pallas


def timeit_chain(name, f, x, n):
    def run(x0):
        def body(_, acc):
            out = f(x0 + acc * 1e-30)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(out))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    g = jax.jit(run)
    t0 = time.perf_counter()
    np.asarray(g(x))
    print(f"{name}: compile {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    np.asarray(g(x))
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rng = np.random.default_rng(0)
    N = 20480
    src = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 20)
    tgt = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 20)
    sm = jnp.ones((N,), bool)
    tm = jnp.ones((N,), bool)

    # correctness on-chip first
    d1, i1 = jax.jit(lambda s, t: nn_search(s, sm, t, tm))(src, tgt)
    d2, i2 = jax.jit(lambda s, t: nn_search_pallas(s, sm, t, tm))(src, tgt)
    same = float(np.mean(np.asarray(i1) == np.asarray(i2)))
    derr = float(np.abs(np.asarray(d1) - np.asarray(d2)).max())
    print(f"association agreement {same:.6f}, max |d| err {derr:.2e}",
          flush=True)

    timeit_chain(f"scan   nn_search {N}x{N}",
                 lambda s: nn_search(s, sm, tgt, tm), src, reps)
    # src_tile must stay a 1024 multiple (1-D output layout rule,
    # ops/chamfer.py); tgt_tile is free in 128 multiples.
    for ts, tt in ((1024, 512), (1024, 1024), (2048, 512), (1024, 256),
                   (2048, 1024), (4096, 512)):
        timeit_chain(f"pallas nn_search {N}x{N} tile=({ts},{tt})",
                     lambda s, ts=ts, tt=tt: nn_search_pallas(
                         s, sm, tgt, tm, src_tile=ts, tgt_tile=tt),
                     src, reps)


if __name__ == "__main__":
    main()
