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


def parse_mesh_spec(spec, n_devices):
    """Parse a CLI mesh spec "data=4,model=2,azimuth=1" -> (nd, nm, na).

    Unnamed axes default to 1; spec None or "auto" puts every device on
    the data axis (the reference trains distributed-by-default,
    tools/train.py:100-107 + apis/train.py:330-336)."""
    if spec in (None, "", "auto"):
        return n_devices, 1, 1
    sizes = {"data": None, "model": 1, "azimuth": 1}
    for part in str(spec).split(","):
        k, _, v = part.partition("=")
        k = k.strip()
        if k not in sizes:
            raise ValueError(f"unknown mesh axis {k!r} (data/model/azimuth)")
        sizes[k] = int(v)
    if sizes["data"] is None:
        sizes["data"] = max(1, n_devices // (sizes["model"] * sizes["azimuth"]))
    return sizes["data"], sizes["model"], sizes["azimuth"]


def shard_batch(batch, mesh, batch_dim_size=None):
    """Host batch -> mesh-sharded device arrays: leading (batch) dim over
    'data' for arrays whose leading dim matches the batch size, replicated
    otherwise. Lists (per-task targets) shard element-wise. Multi-host
    processes contribute their local shard of the global batch via
    make_array_from_process_local_data."""
    import jax

    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    multihost = jax.process_count() > 1

    def put(v):
        sh = (bsh if getattr(v, "ndim", 0) >= 1 and batch_dim_size
              and v.shape[0] == batch_dim_size else rep)
        if multihost and sh is bsh:
            return jax.make_array_from_process_local_data(sh, np.asarray(v))
        return jax.device_put(v, sh)

    out = {}
    for k, v in batch.items():
        if isinstance(v, (list, tuple)):
            out[k] = [put(x) for x in v]
        else:
            out[k] = put(v)
    return out


def place_train_state(state, mesh):
    """Place a TrainState on the mesh: large kernels channel-sharded over
    'model' (TP), everything else replicated — the placement proven by the
    multichip dryrun (__graft_entry__._dryrun_multichip_inproc).

    Optimizer state follows the params: the TP rule is a pure function of
    leaf shape, so Adam's mu/nu (param-shaped) land on the same channel
    sharding as their params — per-device moment memory shrinks with TP
    and the update inserts no grad<->moment resharding (VERDICT r4 #4).
    Scalar/vector opt-state leaves (counts, injected hyperparams) stay
    replicated."""
    import jax

    rep = replicated(mesh)
    psh = param_sharding(state.params, mesh)
    rule = _tp_shape_rule(mesh)
    return state.replace(
        params=jax.tree_util.tree_map(jax.device_put, state.params, psh),
        batch_stats=jax.device_put(state.batch_stats, rep),
        opt_state=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rule(x)) if hasattr(x, "shape") else x,
            state.opt_state,
        ),
        step=jax.device_put(state.step, rep),
    )


def _tp_shape_rule(mesh, min_size=2 ** 16):
    """shape-indexed TP rule: large >=2-D leaves with a model-divisible
    last (output-channel) dim shard over 'model'; everything else
    replicates. Applies identically to params and to param-shaped
    optimizer moments."""
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

    return rule


def param_sharding(params, mesh, min_size=2 ** 16):
    """Tensor-parallel rule: shard the last (output-channel) dim of large
    kernels over 'model' when divisible; replicate everything else."""
    return jax.tree_util.tree_map(_tp_shape_rule(mesh, min_size), params)
