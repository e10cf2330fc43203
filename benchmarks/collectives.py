#!/usr/bin/env python
"""Collectives microbenchmark (SURVEY.md §5.8): achieved all-reduce
bandwidth over the data mesh — the quantity DP scaling rides on
(BASELINE.json:5 "gradient allreduce over ICI").

On a real multi-chip slice this measures ICI; on this box it runs over
the virtual CPU mesh (numbers are then only a plumbing check). Usage:

    python benchmarks/collectives.py [num_devices] [mb_per_shard]
"""

import sys
import time

import numpy as np


def main(n_devices: int = 0, mb: float = 16.0):
    import jax

    if n_devices and len(jax.devices()) < n_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_devices)
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()[: (n_devices or len(jax.devices()))]
    mesh = Mesh(np.asarray(devs), ("data",))
    n = len(devs)
    elems = int(mb * 1e6 / 4)
    x = jnp.ones((n * elems,), jnp.float32)
    x = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def allreduce(x):
        from jax import shard_map
        f = shard_map(lambda s: jax.lax.psum(s, "data"), mesh=mesh,
                      in_specs=P("data"), out_specs=P("data"))
        return jnp.sum(f(x))

    float(allreduce(x))                       # compile + warm
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        float(allreduce(x))
    dt = (time.perf_counter() - t0) / iters
    # Ring all-reduce moves 2*(n-1)/n of the data per link.
    algo_bytes = x.nbytes * 2 * (n - 1) / n
    print({
        "devices": n,
        "payload_mb": round(x.nbytes / 1e6, 1),
        "time_ms": round(dt * 1e3, 3),
        "algo_bw_gb_s": round(algo_bytes / dt / 1e9, 2),
    })


if __name__ == "__main__":
    args = sys.argv[1:]
    main(int(args[0]) if args else 0,
         float(args[1]) if len(args) > 1 else 16.0)
