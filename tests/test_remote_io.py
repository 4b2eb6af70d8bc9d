"""Remote-path filesystem layer (OSS remote-storage parity) and
checkpoint round-trips through it."""

import numpy as np
import pytest

from partner_tpu.utils import remote_io


@pytest.fixture
def memfs():
    fs = remote_io.MemoryFileSystem()
    remote_io.register("memtest", fs)
    return fs


def test_local_roundtrip(tmp_path):
    p = str(tmp_path / "a" / "b.bin")
    remote_io.write_bytes(p, b"hello")
    assert remote_io.exists(p)
    assert remote_io.read_bytes(p) == b"hello"
    assert remote_io.listdir(str(tmp_path / "a")) == ["b.bin"]


def test_memory_backend(memfs):
    remote_io.write_bytes("memtest://bucket/x/y.pkl", b"\x01\x02")
    assert remote_io.exists("memtest://bucket/x/y.pkl")
    assert remote_io.read_bytes("memtest://bucket/x/y.pkl") == b"\x01\x02"
    assert remote_io.listdir("memtest://bucket/x") == ["y.pkl"]
    assert remote_io.exists("memtest://bucket/x")  # prefix exists


def test_unregistered_scheme_raises():
    with pytest.raises(ValueError, match="no filesystem registered"):
        remote_io.read_bytes("nosuch://a/b")


def test_checkpoint_roundtrip_remote(rng, memfs):
    """save -> latest -> load through a remote scheme, exactly like the
    reference's OSS checkpoint path (det3d/utils/checkpoint.py)."""
    import jax.numpy as jnp
    import optax

    from partner_tpu.train.checkpoint import (latest_checkpoint,
                                              load_checkpoint,
                                              restore_train_state,
                                              save_checkpoint)
    from partner_tpu.train.train_state import TrainState

    params = {"w": jnp.asarray(rng.randn(4, 4).astype(np.float32))}
    tx = optax.adam(1e-3)
    state = TrainState(step=jnp.asarray(7, jnp.int32), params=params,
                       batch_stats={}, opt_state=tx.init(params))

    work = "memtest://ckpts/run1"
    path = save_checkpoint(work, state, meta={"epoch": 3})
    assert latest_checkpoint(work) == path

    payload, meta = load_checkpoint(path)
    assert meta == {"epoch": 3}
    np.testing.assert_array_equal(payload["params"]["w"],
                                  np.asarray(params["w"]))
    blank = TrainState(step=jnp.zeros((), jnp.int32),
                       params={"w": jnp.zeros((4, 4))},
                       batch_stats={}, opt_state=tx.init(params))
    restored = restore_train_state(blank, payload)
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.asarray(params["w"]))


def test_checkpoint_roundtrip_local_still_works(rng, tmp_path):
    import jax.numpy as jnp
    import optax

    from partner_tpu.train.checkpoint import (latest_checkpoint,
                                              load_checkpoint,
                                              save_checkpoint)
    from partner_tpu.train.train_state import TrainState

    params = {"w": jnp.ones((2, 2))}
    tx = optax.adam(1e-3)
    state = TrainState(step=jnp.asarray(1, jnp.int32), params=params,
                       batch_stats={}, opt_state=tx.init(params))
    path = save_checkpoint(str(tmp_path), state)
    assert latest_checkpoint(str(tmp_path)) == path
    payload, _ = load_checkpoint(path)
    assert payload["step"] == 1
