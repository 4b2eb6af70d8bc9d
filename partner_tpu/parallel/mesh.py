"""Device mesh + sharding rules.

The reference scales by single-axis NCCL data parallelism
(torchie/apis/train.py:330-336); here parallelism is a jax.sharding Mesh:

  data   — batch dimension (DP); gradient psum inserted by XLA
  model  — tensor parallelism: output channels of the large dense/conv
           kernels in the neck/heads are sharded (TP), XLA inserting
           all-gathers/reduce-scatters on ICI
  azimuth — spatial/sequence parallelism over the polar BEV azimuth axis
           (SP; the streaming-sector analog, SURVEY.md section 5.7), used by
           shard_map halo-exchange necks

All arrays not matched by a rule are replicated.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data=None, n_model=1, n_azimuth=1, devices=None):
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // (n_model * n_azimuth)
    assert n_data * n_model * n_azimuth <= n, (
        f"mesh {n_data}x{n_model}x{n_azimuth} exceeds {n} devices"
    )
    used = np.asarray(devices[: n_data * n_model * n_azimuth]).reshape(
        n_data, n_model, n_azimuth
    )
    return Mesh(used, ("data", "model", "azimuth"))


def batch_sharding(mesh):
    """Shard leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def param_sharding(params, mesh, min_size=2 ** 16):
    """Tensor-parallel rule: shard the last (output-channel) dim of large
    kernels over 'model' when divisible; replicate everything else."""
    n_model = mesh.shape["model"]

    def rule(p):
        if (
            n_model > 1
            and p.ndim >= 2
            and p.size >= min_size
            and p.shape[-1] % n_model == 0
        ):
            return NamedSharding(mesh, P(*([None] * (p.ndim - 1) + ["model"])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)
