"""Measure host->device upload bandwidth through the axon tunnel.

Motivation (r4): train-step wall time was 3.1 s at ~0.2 s device
compute; the suspect is the (1, 3, 131072, 7) f32 point batch upload
(11 MB).  This probe times device_put of the actual batch shapes, f32
vs int16-quantized, plus a small control, and prints MB/s.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import rslo_tpu.utils.jax_cache  # noqa: F401

import numpy as np
import jax


def timed_put(x, n=6):
    # warm once (allocator paths), then time n puts with an honest
    # host fetch of a scalar afterwards per put
    y = jax.device_put(x)
    np.asarray(jax.numpy.ravel(y)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        y = jax.device_put(x)
        np.asarray(jax.numpy.ravel(y)[0])
    dt = (time.perf_counter() - t0) / n
    mb = x.nbytes / 1e6
    print(f"  {str(x.dtype):8s} {str(x.shape):24s} {mb:7.2f} MB  "
          f"{dt * 1e3:8.1f} ms  {mb / dt:7.2f} MB/s", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    print("== upload bandwidth ==", flush=True)
    timed_put(rng.normal(size=(1, 3, 131072, 7)).astype(np.float32))
    timed_put((rng.normal(size=(1, 3, 131072, 7)) * 1e3).astype(np.int16))
    timed_put((rng.normal(size=(1, 3, 65536, 7)) * 1e3).astype(np.int16))
    timed_put(rng.normal(size=(256, 256)).astype(np.float32))


if __name__ == "__main__":
    main()
