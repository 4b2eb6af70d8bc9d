"""Worker for the 2-process multi-host test (not a pytest module).

Usage: python dist_worker.py COORD_ADDR RANK NPROCS OUT_PKL

Connects to the jax distributed runtime on the CPU platform, then drives
the two multi-host code paths the framework relies on
(partner_tpu/parallel/dist.py):
  1. all_gather_object — padded-pickle gather of unequal-size pytrees;
  2. a data-parallel gradient step — per-host batch shards assembled into
     a global array over a (data,) mesh; the jitted grad reduces across
     hosts (the psum XLA inserts is the DDP allreduce analog).
Results are pickled to OUT_PKL for the parent test to assert on.
"""

import os
import pickle
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# force-set (not setdefault): the parent test env carries the 8-device
# virtual-mesh flag, which would give 8 local devices per process
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    coord, rank, nprocs, out_pkl = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from partner_tpu.parallel import dist

    ok = dist.initialize(coordinator_address=coord, num_processes=nprocs,
                         process_id=rank)
    assert ok and jax.process_count() == nprocs

    # 1. pickle gather with per-rank different sizes
    obj = {"rank": rank, "arr": np.arange(3 + 2 * rank, dtype=np.int64),
           "name": f"proc{rank}"}
    gathered = dist.all_gather_object(obj)

    # 2. dp gradient step: batch sharded over hosts, grads allreduced
    devices = np.array(jax.devices())
    mesh = Mesh(devices, ("data",))
    w = jnp.arange(1.0, 5.0)  # replicated params
    x_local = np.full((1, 4), float(rank + 1))  # this host's batch shard
    gx = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), x_local, (nprocs, 4))

    def loss(w, x):
        return jnp.sum((x @ w) ** 2)

    rep = NamedSharding(mesh, P())
    grad = jax.jit(
        jax.grad(loss),
        in_shardings=(rep, NamedSharding(mesh, P("data"))),
        out_shardings=rep,
    )(w, gx)
    grad = np.asarray(jax.device_get(grad))

    with open(out_pkl, "wb") as f:
        pickle.dump({"gathered": gathered, "grad": grad,
                     "process_count": jax.process_count()}, f)
    print(f"[worker {rank}] OK")


if __name__ == "__main__":
    main()
