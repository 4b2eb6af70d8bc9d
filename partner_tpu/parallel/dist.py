"""Multi-host runtime plumbing.

The reference scales with torch.distributed/NCCL process groups
(torchie/apis/env.py:13-49, trainer/utils.py:99-155). The TPU equivalent:
`jax.distributed.initialize()` connects the hosts of a pod slice; data
parallelism then rides the global device mesh, with XLA emitting the
gradient psums. Eval-result gathering (the reference's pickle-over-NCCL
`all_gather`) becomes `multihost_utils.process_allgather` on host arrays.
"""

import os

import numpy as np


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Connect this host to the jax distributed runtime.

    No-op when single-process (the common single-host case) or when the
    runtime is already initialized. Arguments default to the standard env
    vars (JAX_COORDINATOR_ADDRESS etc. / TPU pod auto-detection).
    """
    import jax

    n = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    if n <= 1 and coordinator_address is None and \
            "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except RuntimeError:  # already initialized
        return True


def process_info():
    import jax

    return jax.process_index(), jax.process_count()


def all_gather_object(obj):
    """Gather a pytree of numpy arrays from every process (eval results).

    Single-process: returns [obj]. Multi-process: pickles to bytes,
    pads to the global max length, and gathers via process_allgather —
    the moral equivalent of torchie/trainer/utils.py:114-155.
    """
    import jax

    if jax.process_count() == 1:
        return [obj]

    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    n = np.array([payload.size], np.int64)
    sizes = multihost_utils.process_allgather(n)  # (P, 1)
    max_n = int(sizes.max())
    padded = np.zeros((max_n,), np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)  # (P, max_n)
    out = []
    for i in range(gathered.shape[0]):
        size = int(sizes[i][0] if sizes.ndim > 1 else sizes[i])
        out.append(pickle.loads(gathered[i, :size].tobytes()))
    return out


def is_main_process():
    import jax

    return jax.process_index() == 0
