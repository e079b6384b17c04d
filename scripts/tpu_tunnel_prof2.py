"""Honest tunnel probes: every measurement forces a data-dependent scalar
round trip, so async dispatch cannot fake completion."""
import time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    g = jax.jit(lambda a: jnp.sum(a) * 0 + 1)
    float(g(jnp.ones((8,))))  # warm
    # RTT floor: dependent scalar round trip
    ts = []
    for _ in range(10):
        t0 = time.perf_counter(); float(g(jnp.ones((8,)))); ts.append(time.perf_counter() - t0)
    print(f"RTT floor (scalar round trip): {np.median(ts)*1e3:7.2f} ms", flush=True)
    # upload: host->device then dependent scalar
    for shape in ((512, 20, 4, 3), (4, 576, 768), (2048, 2048)):
        host = np.random.rand(*shape).astype(np.float32)
        float(g(jnp.asarray(host)))  # warm compile for this shape
        ts = []
        for i in range(8):
            host.flat[i] += 1.0
            t0 = time.perf_counter()
            float(g(jnp.asarray(host)))
            ts.append(time.perf_counter() - t0)
        mb = host.nbytes / 1e6
        med = float(np.median(ts))
        print(f"upload {str(shape):>16} {mb:7.2f} MB: {med*1e3:7.2f} ms"
              f" ({mb/max(med,1e-9):6.1f} MB/s)", flush=True)
    # u8 upload (the gray frames)
    host = np.random.randint(0, 255, (4, 576, 768), np.uint8)
    gu = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)) * 0 + 1)
    float(gu(jnp.asarray(host)))
    ts = []
    for i in range(8):
        host.flat[i] ^= 1
        t0 = time.perf_counter(); float(gu(jnp.asarray(host)))
        ts.append(time.perf_counter() - t0)
    mb = host.nbytes / 1e6
    med = float(np.median(ts))
    print(f"upload u8 gray {mb:7.2f} MB: {med*1e3:7.2f} ms ({mb/med:6.1f} MB/s)",
          flush=True)

if __name__ == "__main__":
    main()
