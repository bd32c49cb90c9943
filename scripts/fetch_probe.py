"""Device->host fetch bandwidth probe (the denoise leg's bottleneck).

The tunnel uploads at ~70-100 MB/s but fetches at ~15-19 MB/s (round-5
write legs).  This probe times fetching N device arrays serially vs from
concurrent threads, and a single array fetched whole vs in row-slice
ranges from threads — if the link multiplexes streams, parallel fetch is
a direct multiplier on every predict/write leg.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/fetch_probe.py
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def log(m):
    print(f"fetch_probe: {m}", file=sys.stderr, flush=True)


def main():
    MB = int(os.environ.get("ARR_MB", 256))
    n_arr = int(os.environ.get("N_ARR", 4))
    rows = MB * 1_000_000 // (3451 * 4)
    rs = np.random.RandomState(0)

    def fetch(d):
        return np.asarray(d)

    def fresh_set(tag):
        """Distinct device arrays per arm — jax caches a fetched array's
        host copy on the object, so refetching the same arrays is free
        and would fake an infinite-speed arm."""
        host = [rs.uniform(size=(rows, 3451)).astype(np.float32)
                for _ in range(n_arr)]
        dev = [jax.device_put(h) for h in host]
        _ = [np.asarray(d[:1]) for d in dev]  # force materialization
        return host, dev

    # warm one fetch
    _, dev0 = fresh_set("warm")
    t0 = time.time()
    fetch(dev0[0])
    log(f"warm single fetch: {MB / (time.time() - t0):.1f} MB/s")
    del dev0

    for name, workers in (("serial", 1), ("2 threads", 2),
                          ("4 threads", 4)):
        host, dev = fresh_set(name)
        t0 = time.time()
        if workers == 1:
            out = [fetch(d) for d in dev]
        else:
            with ThreadPoolExecutor(max_workers=workers) as ex:
                out = list(ex.map(fetch, dev))
        dt = time.time() - t0
        assert all(np.array_equal(o, h) for o, h in zip(out, host))
        log(f"{name}: {n_arr * MB / dt:.1f} MB/s aggregate "
            f"({dt:.1f}s for {n_arr * MB} MB)")
        del host, dev, out

    # one big array, fetched whole vs in 4 row-range slices via threads
    big_h = rs.uniform(size=(rows * 4, 3451)).astype(np.float32)
    big = jax.device_put(big_h)
    np.asarray(big[:1])
    t0 = time.time()
    whole = np.asarray(big)
    dt = time.time() - t0
    log(f"one {4 * MB} MB array, whole: {4 * MB / dt:.1f} MB/s")

    qs = rows
    slices = [big[i * qs:(i + 1) * qs] for i in range(4)]  # device slices
    _ = [np.asarray(s[:1]) for s in slices]
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=4) as ex:
        parts = list(ex.map(fetch, slices))
    dt = time.time() - t0
    got = np.concatenate(parts, axis=0)
    assert np.array_equal(got, big_h)
    log(f"one {4 * MB} MB array, 4 sliced threads: {4 * MB / dt:.1f} MB/s")


if __name__ == "__main__":
    main()
