"""Measure axon tunnel upload/download bandwidth + dispatch latency."""
import time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    f = jax.jit(lambda a: a + 1)
    # warm
    jax.block_until_ready(f(jnp.ones((8,))))
    for shape in ((256, 20, 3), (512, 20, 4, 3), (1024, 1024), (4, 576, 768)):
        mb = float(np.prod(shape)) * 4 / 1e6
        host = np.random.rand(*shape).astype(np.float32)
        ts = []
        for i in range(8):
            host[0] += 1e-6  # defeat any caching
            t0 = time.perf_counter()
            jax.block_until_ready(f(jnp.asarray(host)))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"upload+f {str(shape):>18} {mb:7.2f} MB: {med*1e3:7.2f} ms"
              f" ({mb/med:6.1f} MB/s)", flush=True)
    z = jax.block_until_ready(f(jnp.ones((512, 20, 4, 3))))
    ts = []
    for _ in range(8):
        z = jax.block_until_ready(f(z))
        t0 = time.perf_counter()
        np.asarray(jax.device_get(z))
        ts.append(time.perf_counter() - t0)
    mb = float(np.prod(z.shape)) * 4 / 1e6
    med = float(np.median(ts))
    print(f"download {str(z.shape):>18} {mb:7.2f} MB: {med*1e3:7.2f} ms"
          f" ({mb/med:6.1f} MB/s)", flush=True)

if __name__ == "__main__":
    main()
