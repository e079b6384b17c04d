"""Do N separate device_puts cost N fixed ~28ms message overheads, and
does passing raw numpy args to a jit call batch the transfers?"""
import time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    n_args = 12
    shapes = [(512, 20, 3)] + [(512, 20, 4, 3)] + [(256, 256)] + \
             [(512, 20)] * 3 + [(256, 20, 3)] + [(256,)] * 5
    hosts = [np.random.rand(*s).astype(np.float16) for s in shapes]
    total_mb = sum(h.nbytes for h in hosts) / 1e6

    @jax.jit
    def f(*xs):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in xs)

    float(f(*hosts))  # compile
    for mode in ("numpy-direct", "pre-put"):
        ts = []
        for i in range(6):
            hosts[0].flat[i] += 1
            t0 = time.perf_counter()
            if mode == "numpy-direct":
                float(f(*hosts))
            else:
                args = [jnp.asarray(h) for h in hosts]
                float(f(*args))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"{mode:>13} {n_args} args {total_mb:.2f} MB: {med*1e3:7.1f} ms",
              flush=True)
    # single concatenated blob
    blob = np.concatenate([h.reshape(-1) for h in hosts])

    @jax.jit
    def g(b):
        return jnp.sum(b.astype(jnp.float32))

    float(g(blob))
    ts = []
    for i in range(6):
        blob.flat[i] += 1
        t0 = time.perf_counter(); float(g(blob))
        ts.append(time.perf_counter() - t0)
    print(f"{'one-blob':>13}  1 arg  {blob.nbytes/1e6:.2f} MB: "
          f"{float(np.median(ts))*1e3:7.1f} ms", flush=True)

if __name__ == "__main__":
    main()
