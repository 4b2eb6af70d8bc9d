"""Per-module FLOPs attribution (utils/flops.py:per_module_flops).

Parity target: the reference's hook-based per-layer counter
(/root/reference/det3d/utils/flops_counter.py) — conv/linear FLOPs
formulas at :233-268 — here derived from the traced jaxpr instead of
module hooks. Exactness is pinned on hand-computable toy modules; the
flagship-scale table is printed by tools/flops_report.py."""

import numpy as np
import pytest


class TestPerModuleFlops:
    def test_dense_and_conv_exact(self):
        import jax
        import jax.numpy as jnp
        import flax.linen as nn

        from partner_tpu.utils.flops import per_module_flops

        class Inner(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Dense(64)(x)

        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = Inner(name="inner")(x)
                return nn.Conv(16, (3, 3), name="conv")(
                    x.reshape(1, 4, 4, 64))

        m = M()
        x = jnp.ones((16, 32))
        v = m.init(jax.random.PRNGKey(0), x)
        tbl = per_module_flops(lambda v, x: m.apply(v, x), v, x)
        # Dense: 2*M*K*N = 2*16*32*64; Conv: 2*prod(out)*in_ch*k_spatial
        # = 2*(1*4*4*16)*64*9  (reference formulas flops_counter.py:233)
        assert tbl["M/inner/Dense_0"] == 2 * 16 * 32 * 64
        assert tbl["M/conv"] == 2 * (1 * 4 * 4 * 16) * 64 * 9

    def test_depth_grouping_and_scan_multiplier(self):
        import jax
        import jax.numpy as jnp
        import flax.linen as nn

        from partner_tpu.utils.flops import per_module_flops

        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                dense = nn.Dense(32, name="d", use_bias=False)

                def body(c, _):
                    return dense(c), None

                c, _ = jax.lax.scan(body, x, None, length=5)
                return c

        m = M()
        x = jnp.ones((8, 32))
        v = m.init(jax.random.PRNGKey(0), x)
        tbl = per_module_flops(lambda v, x: m.apply(v, x), v, x, depth=1)
        # one dense per scan step, x5 by the length multiplier
        assert sum(tbl.values()) == 5 * (2 * 8 * 32 * 32)
        assert list(tbl) == ["M"]

    def test_matches_whole_program_cost_analysis(self):
        """Table total tracks XLA's optimized-HLO flops within the
        fusion/simplification delta on a conv+attention stack."""
        import jax
        import jax.numpy as jnp

        from partner_tpu.models.swin_vote import SwinVoteTransformer
        from partner_tpu.utils.flops import flops_of, per_module_flops

        m = SwinVoteTransformer(embed_dim=32, depth=2, num_heads=2,
                                window_size=4)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 16, 8, 32).astype(np.float32))
        pos = jnp.asarray(rng.randn(1, 16, 8, 2).astype(np.float32))
        vote = jnp.asarray(rng.randn(1, 16, 8, 3).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x, pos, vote)

        fn = lambda v, x: m.apply(v, x, pos, vote, deterministic=True)
        tbl = per_module_flops(fn, v, x)
        total = sum(tbl.values())
        xla = flops_of(fn, v, x)
        assert total > 0
        # jaxpr counts pre-optimization matmul/conv flops; XLA's count
        # includes elementwise work — agree within 2x, typically ~20%
        assert 0.5 < total / xla < 2.0
        assert any("block0" in k for k in tbl)
