"""Checkpoint save/load with auto-resume + torch weight conversion.

Mirrors the reference semantics (torchie/trainer/checkpoint.py:122-230,
hooks/checkpoint.py, tools/train.py:95-97): step-tagged directories, a
``latest`` pointer updated on every save, meta (epoch/step/config text)
stored alongside, resume restores optimizer state.

Payloads are pickled host-numpy pytrees behind the remote_io filesystem
abstraction (local paths or scheme-prefixed remote stores) — one format
everywhere, no orbax dependency on the load path.
"""

import json
import os
import pickle

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(work_dir, state, meta=None, keep=None):
    """work_dir may be a local path or a scheme-prefixed remote path
    (utils/remote_io.py — the OSS remote-storage parity layer)."""
    from ..utils import remote_io as rio

    step = int(state.step)
    path = _join(work_dir, f"ckpt_{step:08d}")
    rio.makedirs(path)
    payload = {
        "step": step,
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
    }
    rio.write_bytes(_join(path, "state.pkl"), pickle.dumps(payload))
    if meta:
        rio.write_bytes(_join(path, "meta.json"),
                        json.dumps(meta).encode())
    rio.write_bytes(_join(work_dir, "latest"),
                    f"ckpt_{step:08d}".encode())
    if keep:
        # prune via the filesystem abstraction so remote work_dirs honor
        # `keep` too (ADVICE r1: remote dirs must not grow unboundedly)
        ckpts = sorted(
            d for d in rio.listdir(work_dir) if d.startswith("ckpt_")
        )
        for old in ckpts[:-keep]:
            rio.delete_tree(_join(work_dir, old))
    return path


def _join(base, *parts):
    return "/".join([base.rstrip("/")] + list(parts))


def latest_checkpoint(work_dir):
    from ..utils import remote_io as rio

    latest = _join(work_dir, "latest")
    if not rio.exists(latest):
        return None
    name = rio.read_bytes(latest).decode().strip()
    path = _join(work_dir, name)
    return path if rio.exists(_join(path, "state.pkl")) else None


def _model_zoo():
    """Name -> URI registry for ``modelzoo://<name>`` checkpoints.

    Reference load_checkpoint resolves modelzoo/torchvision/open-mmlab
    names through baked-in URL tables (torchie/trainer/checkpoint.py:
    136-151); here the table is a JSON file ({name: uri}) pointed at by
    PARTNER_TPU_MODEL_ZOO (default ~/.cache/partner_tpu/model_zoo.json)
    so deployments can publish their own zoo without code changes."""
    zoo_path = os.environ.get(
        "PARTNER_TPU_MODEL_ZOO",
        os.path.expanduser("~/.cache/partner_tpu/model_zoo.json"),
    )
    if not os.path.exists(zoo_path):
        return {}
    with open(zoo_path) as f:
        return json.load(f)


def _download_cached(url):
    """Fetch a checkpoint URL into the local cache once; atomic rename so
    concurrent hosts never see a partial file (the reference defers to
    torch.utils.model_zoo's equivalent cache, checkpoint.py:98-109)."""
    import hashlib
    import urllib.parse
    import urllib.request

    cache_dir = os.environ.get(
        "PARTNER_TPU_CACHE",
        os.path.expanduser("~/.cache/partner_tpu/checkpoints"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    base = os.path.basename(urllib.parse.urlparse(url).path) or "ckpt.pkl"
    dest = os.path.join(
        cache_dir, hashlib.sha1(url.encode()).hexdigest()[:16] + "_" + base
    )
    if not os.path.exists(dest):
        # per-process temp name: concurrent hosts sharing the cache dir
        # must not truncate each other's partial download; the atomic
        # rename makes the last writer win with a complete file either way
        tmp = f"{dest}.part.{os.getpid()}"
        try:
            urllib.request.urlretrieve(url, tmp)
            os.replace(tmp, dest)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
    return dest


def resolve_checkpoint_uri(path):
    """modelzoo://name -> registered URI; http(s)/file URLs -> cached
    local file; everything else passes through (local / remote-fs)."""
    if path.startswith("modelzoo://"):
        name = path[len("modelzoo://"):]
        zoo = _model_zoo()
        if name not in zoo:
            raise KeyError(
                f"model zoo has no entry {name!r} "
                f"(registry: PARTNER_TPU_MODEL_ZOO json)"
            )
        path = zoo[name]
    if path.startswith(("http://", "https://", "file://")):
        return _download_cached(path)
    return path


def load_checkpoint(path):
    """Load from a step directory, a bare state.pkl file, a URL, or a
    modelzoo:// name (reference checkpoint.py:122-175 URI surface)."""
    from ..utils import remote_io as rio

    path = resolve_checkpoint_uri(path)
    if os.path.isfile(path) and os.path.basename(path) == "latest":
        # the ``latest`` pointer file holds the newest step-dir NAME, not
        # a payload — dereference it (lets ``--checkpoint <wd>/latest``
        # work in the CLIs)
        with open(path) as f:
            name = f.read().strip()
        return load_checkpoint(os.path.join(os.path.dirname(path), name))
    if os.path.isfile(path):  # downloaded / direct payload file
        with open(path, "rb") as f:
            payload = pickle.load(f)
        meta_path = os.path.join(os.path.dirname(path), "meta.json")
        meta = None
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return payload, meta
    payload = pickle.loads(rio.read_bytes(_join(path, "state.pkl")))
    meta_path = _join(path, "meta.json")
    meta = None
    if rio.exists(meta_path):
        meta = json.loads(rio.read_bytes(meta_path).decode())
    return payload, meta


def restore_train_state(state, payload):
    """Template-shaped restore: payload arrays poured into `state`'s pytree."""
    import jax.numpy as jnp

    def pour(template, value):
        return jax.tree_util.tree_map(
            lambda t, v: jnp.asarray(v, t.dtype), template, value
        )

    return state.replace(
        step=jnp.asarray(payload["step"], state.step.dtype),
        params=pour(state.params, payload["params"]),
        batch_stats=pour(state.batch_stats, payload["batch_stats"]),
        opt_state=pour(state.opt_state, payload["opt_state"]),
    )


# ---------------------------------------------------------------------------
# torch -> jax weight conversion (for reference-checkpoint parity testing)
# ---------------------------------------------------------------------------


def convert_torch_conv2d(w):
    """(O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_torch_linear(w):
    """(O, I) -> flax (I, O)."""
    return np.transpose(w, (1, 0))


def convert_torch_subm_conv(w):
    """spconv SubMConv3d weight (O, kz, ky, kx, I) or (kz, ky, kx, I, O)
    -> our flat (K*I, O) kernel (z, y, x kernel-major, then input channel).
    """
    w = np.asarray(w)
    if w.shape[0] < w.shape[-1]:  # heuristic: already (kz, ky, kx, I, O)
        kzyxio = w
    else:  # (O, kz, ky, kx, I)
        kzyxio = np.transpose(w, (1, 2, 3, 4, 0))
    kz, ky, kx, ci, co = kzyxio.shape
    return kzyxio.reshape(kz * ky * kx * ci, co)
