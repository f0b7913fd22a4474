"""On-chip A/B for the per-row-DMA Pallas gather (VERDICT r4 next #4a,
BENCH_NOTES "Known cost drivers" #2): XLA one-big-row-gather vs
dma_row_gather vs the fused dma_gather_matmul, at the rulebook
engine's deployed shapes (L0 subm: V=40960 rows x K=27 taps into a
40960-row feature table, C in {16, 32, 64}).

Honest harness: chained iterations inside one jit with a perturbed
input per iterate, one device-side reduction, ONE host fetch.

Usage: python -u scripts/profile_dma_gather.py [reps]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import rslo_tpu.utils.jax_cache  # noqa: F401

import numpy as np
import jax
import jax.numpy as jnp

from rslo_tpu.ops.dma_gather import dma_gather_matmul, dma_row_gather


def timeit_chain(name, f, x, n):
    def run(x0):
        def body(_, acc):
            out = f(x0, acc)
            return acc + jnp.sum(out[:8].astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    try:
        g = jax.jit(run)
        t0 = time.perf_counter()
        np.asarray(g(x))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(g(x))
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt * 1e3:.2f} ms  (compile {c:.1f}s)",
              flush=True)
        return dt
    except Exception as e:     # a failing variant must not kill the A/B
        print(f"{name}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", flush=True)
        return float("inf")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rng = np.random.default_rng(0)
    V, K = 40960, 27
    Cout = 32
    N = V * K   # 1,105,920 row fetches

    cs = tuple(int(c) for c in os.environ.get(
        "RSLO_DMA_CS", "16,32,64").split(","))
    for C in cs:
        feats = jnp.asarray(rng.normal(size=(V, C)).astype(np.float32))
        featsb = feats.astype(jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, V, size=(V, K)).astype(np.int32))
        valid = jnp.asarray(rng.random(size=(V, K)) < 0.8)
        w = jnp.asarray(
            rng.normal(size=(K * C, Cout)).astype(np.float32))
        wb = w.astype(jnp.bfloat16)
        flat = idx.reshape(-1)
        nbytes = N * C * 4

        # perturb the index stream per iterate so XLA can't CSE the
        # chain; the +acc index shift keeps the distribution identical
        def xla_gather(i, acc, feats=feats):
            j = (i.reshape(-1) + acc.astype(jnp.int32)) % V
            return feats[j]

        def dma_gather(i, acc, feats=feats):
            j = (i.reshape(-1) + acc.astype(jnp.int32)) % V
            return dma_row_gather(feats, j, block=4096, inflight=16)

        dt = timeit_chain(f"C={C:3d} XLA row gather   ", xla_gather,
                          idx, reps)
        print(f"        -> {nbytes / dt / 1e9:.2f} GB/s effective",
              flush=True)
        dt = timeit_chain(f"C={C:3d} DMA row gather   ", dma_gather,
                          idx, reps)
        print(f"        -> {nbytes / dt / 1e9:.2f} GB/s effective",
              flush=True)

        for bl, infl in ((2048, 8), (4096, 16), (8192, 32)):
            def dma_g(i, acc, feats=feats, bl=bl, infl=infl):
                j = (i.reshape(-1) + acc.astype(jnp.int32)) % V
                return dma_row_gather(feats, j, block=bl, inflight=infl)
            timeit_chain(f"C={C:3d} DMA block={bl:5d}/{infl:2d}", dma_g,
                         idx, reps)

        # fused conv apply A/B (bf16 compute like the deployed engine)
        def xla_apply(i, acc, feats=featsb, w=wb):
            j = (i + acc.astype(jnp.int32)) % V
            g = feats[j.reshape(-1)].reshape(V, K, C)
            g = jnp.where(valid[..., None], g, 0).reshape(V, K * C)
            return jnp.dot(g, w, preferred_element_type=jnp.float32)

        def dma_apply(i, acc, feats=featsb, w=wb):
            j = (i + acc.astype(jnp.int32)) % V
            return dma_gather_matmul(feats, j, valid, w, block=512,
                                     inflight=16)

        timeit_chain(f"C={C:3d} XLA conv apply   ", xla_apply, idx, reps)
        timeit_chain(f"C={C:3d} DMA conv apply   ", dma_apply, idx, reps)


if __name__ == "__main__":
    main()
