import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map
import pytest

from partner_tpu.models.rpn_stream import RPNHalo, RPNTECP
from partner_tpu.parallel.halo import ring_halo


def small_neck(cls, **kw):
    return cls(layer_nums=(1, 1), ds_layer_strides=(1, 2),
               ds_num_filters=(16, 32), us_layer_strides=(1, 2),
               us_num_filters=(16, 16), num_input_features=16, **kw)


class TestRPNHaloCircular:
    def test_single_shard_equals_roll_equivariance(self, rng):
        """Circular conv must commute with azimuth roll exactly."""
        model = small_neck(RPNHalo)
        x = jnp.asarray(rng.randn(1, 32, 16, 16).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        y = model.apply(v, x, train=False)
        # output stride 1 along azimuth after concat of up branches
        for shift in (4, 16):
            ys = model.apply(v, jnp.roll(x, shift, axis=1), train=False)
            np.testing.assert_allclose(
                np.asarray(jnp.roll(y, shift, axis=1)), np.asarray(ys),
                rtol=1e-4, atol=1e-4,
            )

    def test_sharded_matches_single_shard(self, rng):
        """shard_map over azimuth with ppermute halos == circular conv."""
        devices = jax.devices()[:4]
        mesh = Mesh(np.array(devices), ("azimuth",))
        model = small_neck(RPNHalo)
        model_sh = small_neck(RPNHalo, axis_name="azimuth")

        x = jnp.asarray(rng.randn(1, 32, 16, 16).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        ref = model.apply(v, x, train=False)

        def fwd(xs):
            return model_sh.apply(v, xs, train=False)

        sharded = shard_map(
            fwd, mesh=mesh, in_specs=P(None, "azimuth", None, None),
            out_specs=P(None, "azimuth", None, None), check_rep=False,
        )
        got = sharded(x)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=1e-4, atol=1e-4)


class TestRingHalo:
    def test_ring_halo_values(self, rng):
        devices = jax.devices()[:4]
        mesh = Mesh(np.array(devices), ("azimuth",))
        x = jnp.arange(16, dtype=jnp.float32).reshape(1, 16, 1, 1)

        def f(xs):
            return ring_halo(xs, 1, "azimuth", axis=1)

        out = shard_map(f, mesh=mesh, in_specs=P(None, "azimuth", None, None),
                        out_specs=P(None, "azimuth", None, None),
                        check_rep=False)(x)
        out = np.asarray(out).ravel()
        # each shard of 4 rows becomes 6 rows: [prev_last, rows, next_first]
        shard0 = out[:6]
        np.testing.assert_array_equal(shard0, [15, 0, 1, 2, 3, 4])


class TestRPNTECP:
    def test_sector_streaming_matches_monolithic_interior(self, rng):
        """Streaming two sectors with context carry must equal running the
        concatenated map in one shot, except at the very first leading edge
        and final trailing edge."""
        model = small_neck(RPNTECP)
        full = jnp.asarray(rng.randn(1, 32, 16, 16).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), full, None, train=False)

        y_full, _ = model.apply(v, full, None, train=False)

        s0, ctx = model.apply(v, full[:, :16], None, train=False)
        s1, _ = model.apply(v, full[:, 16:], ctx, train=False)
        y_stream = jnp.concatenate([s0, s1], axis=1)

        # trailing-edge streaming is causal: sector-0 rows near its trailing
        # edge (and the first few sector-1 rows that consume contaminated
        # deep-layer caches) legitimately differ from monolithic. Interior
        # rows away from both sweep ends and the sector seam must match.
        np.testing.assert_allclose(
            np.asarray(y_full[:, 4:10]), np.asarray(y_stream[:, 4:10]),
            rtol=1e-3, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(y_full[:, 24:30]), np.asarray(y_stream[:, 24:30]),
            rtol=1e-3, atol=1e-3,
        )

    def test_context_shapes(self, rng):
        model = small_neck(RPNTECP)
        x = jnp.asarray(rng.randn(1, 16, 16, 16).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), x, None, train=False)
        _, ctx = model.apply(v, x, None, train=False)
        assert len(ctx) == 4  # (1 + layer_num) per scale
        assert all(c.shape[1] == 1 for c in ctx)


class TestUberAndLSTM:
    def test_rpn_uber_context_carry(self, rng):
        import jax
        import jax.numpy as jnp
        from partner_tpu.models.rpn_stream import RPNUber

        neck = RPNUber(layer_nums=(1, 1), ds_layer_strides=(1, 2),
                       ds_num_filters=(16, 32), us_layer_strides=(1, 2),
                       us_num_filters=(16, 16), num_input_features=8)
        x = jnp.asarray(rng.rand(1, 16, 12, 8).astype(np.float32))
        v = neck.init(jax.random.PRNGKey(0), x)
        out1, ctx = neck.apply(v, x, train=False)
        assert out1.shape == (1, 16, 12, 32)
        assert len(ctx) == 2 and ctx[0].shape == x.shape
        out2, _ = neck.apply(v, x, ctx, train=False)
        # a real previous sweep changes the output vs the zero init
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_conv_lstm_state_evolves(self, rng):
        import jax
        import jax.numpy as jnp
        from partner_tpu.models.rpn_stream import RPNWaymoLSTM

        neck = RPNWaymoLSTM(layer_nums=(1,), ds_layer_strides=(1,),
                            ds_num_filters=(16,), us_layer_strides=(1,),
                            us_num_filters=(16,), num_input_features=8)
        x = jnp.asarray(rng.rand(1, 16, 12, 8).astype(np.float32))
        v = neck.init(jax.random.PRNGKey(0), x)
        o1, st = neck.apply(v, x, train=False)
        o2, st2 = neck.apply(v, x, st, train=False)
        assert o1.shape == o2.shape
        assert not np.allclose(np.asarray(o1), np.asarray(o2))
        assert np.all(np.isfinite(np.asarray(st2[0])))
