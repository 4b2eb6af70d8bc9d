"""PolarDenseFHD — the TPU-native flagship backbone."""

import numpy as np
import pytest


def _make_inputs(rng, grid=(64, 128, 24), n=512, c=5, b=2):
    import jax.numpy as jnp

    n_r, n_az, n_z = grid
    total = n_r * n_az * n_z
    lin = np.sort(rng.choice(total, size=n, replace=False))
    z = lin // (n_az * n_r)
    rem = lin - z * n_az * n_r
    y = rem // n_r
    x = rem - y * n_r
    coords = np.stack([z, y, x], 1).astype(np.int32)
    feats = rng.rand(b, n, c).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[:, n // 2:] = rng.rand(b, n - n // 2) > 0.3
    return (jnp.asarray(feats), jnp.broadcast_to(jnp.asarray(coords)[None], (b, n, 3)),
            jnp.asarray(mask), grid)


class TestScatterCanvas:
    def test_max_pool_against_numpy(self, rng):
        import jax.numpy as jnp
        from partner_tpu.models.backbone_dense import scatter_canvas

        feats, coords, mask, grid = _make_inputs(rng)
        n_r, n_az, n_z = grid
        cshape = (n_z // 8, n_az // 4, n_r // 4)
        canvas, occ = scatter_canvas(feats, coords, mask, cshape, 8, 4)
        canvas, occ = np.asarray(canvas), np.asarray(occ)

        f, co, m = (np.asarray(feats), np.asarray(coords), np.asarray(mask))
        want = np.zeros_like(canvas)
        wocc = np.zeros_like(occ)
        for bi in range(f.shape[0]):
            for i in range(f.shape[1]):
                if not m[bi, i]:
                    continue
                cz, cy, cx = co[bi, i, 0] // 8, co[bi, i, 1] // 4, co[bi, i, 2] // 4
                if wocc[bi, cz, cy, cx]:
                    want[bi, cz, cy, cx] = np.maximum(want[bi, cz, cy, cx], f[bi, i])
                else:
                    want[bi, cz, cy, cx] = f[bi, i]
                    wocc[bi, cz, cy, cx] = True
        np.testing.assert_allclose(canvas, want, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(occ, wocc)


class TestPolarDenseFHD:
    def test_shapes_and_finite(self, rng):
        import jax
        import jax.numpy as jnp
        from partner_tpu.models.backbone_dense import PolarDenseFHD

        feats, coords, mask, grid = _make_inputs(rng)
        bb = PolarDenseFHD(num_input_features=5, compute_dtype=jnp.float32)
        variables = bb.init(jax.random.PRNGKey(0), feats, coords, mask, grid,
                            train=False)
        bev, ms = bb.apply(variables, feats, coords, mask, grid, train=False)
        n_r, n_az, n_z = grid
        # z: 24/8=3 -> extra conv VALID (3-3)//2+1 = 1 -> C_bev = 128
        assert bev.shape == (2, n_az // 8, n_r // 8, 128)
        assert np.all(np.isfinite(np.asarray(bev)))
        assert ms["canvas"].shape[1:4] == (n_z // 8, n_az // 4, n_r // 4)

    def test_grad_flows(self, rng):
        import jax
        import jax.numpy as jnp
        from partner_tpu.models.backbone_dense import PolarDenseFHD

        feats, coords, mask, grid = _make_inputs(rng, n=128, b=1)
        bb = PolarDenseFHD(num_input_features=5, compute_dtype=jnp.float32)
        variables = bb.init(jax.random.PRNGKey(0), feats, coords, mask, grid)

        def loss_fn(params):
            bev, _ = bb.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                feats, coords, mask, grid, train=True,
                mutable=["batch_stats"])[0] if False else bb.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                feats, coords, mask, grid, train=False)
            return jnp.sum(bev ** 2)

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
        assert total > 0


class TestPointFastPath:
    def test_encode_points_runs_and_matches_interface(self, rng):
        import jax
        import jax.numpy as jnp
        from partner_tpu.models.backbone_dense import PolarDenseFHD

        pc_range = [0.3, -np.pi, -2.0, 36.3, np.pi, 2.8]
        grid = (64, 128, 24)
        n = 800
        rho = rng.uniform(0.5, 36, n); phi = rng.uniform(-3.1, 3.1, n)
        z = rng.uniform(-1.9, 2.7, n)
        pts = np.stack([rho, phi, z, rng.rand(n), rng.rand(n)], 1).astype(np.float32)
        pj = jnp.asarray(pts)[None]
        mj = jnp.ones((1, n), bool)

        bb = PolarDenseFHD(num_input_features=5, compute_dtype=jnp.float32)
        variables = bb.init(jax.random.PRNGKey(0), pj, mj, grid, pc_range,
                            train=False, method=PolarDenseFHD.encode_points)
        bev, ms = bb.apply(variables, pj, mj, grid, pc_range, train=False,
                           method=PolarDenseFHD.encode_points)
        assert bev.shape == (1, grid[1] // 8, grid[0] // 8, 128)
        assert np.all(np.isfinite(np.asarray(bev)))
        # the same params drive the voxel path (shared stem/trunk)
        coords = np.stack([
            ((z - pc_range[2]) / ((pc_range[5]-pc_range[2]) / grid[2])).astype(np.int32),
            ((phi - pc_range[1]) / (2*np.pi / grid[1])).astype(np.int32),
            ((rho - pc_range[0]) / ((pc_range[3]-pc_range[0]) / grid[0])).astype(np.int32),
        ], 1)
        coords = np.clip(coords, 0, np.array([grid[2]-1, grid[1]-1, grid[0]-1]))
        bev2, _ = bb.apply(variables, jnp.asarray(pts)[None], 
                           jnp.asarray(coords)[None], mj, grid, train=False)
        assert bev2.shape == bev.shape


def test_factorized_blocks_shapes_and_grads(rng):
    """R(2+1)D factorized blocks: same output shape, finite grads, distinct
    parameter structure ((1,3,3)+(3,1,1) pairs instead of (3,3,3))."""
    import jax
    import jax.numpy as jnp

    from partner_tpu.models.backbone_dense import DenseBasicBlock

    x = jnp.asarray(rng.randn(1, 4, 16, 16, 8).astype(np.float32))
    for factorized in (False, True):
        blk = DenseBasicBlock(8, factorized=factorized)
        variables = blk.init(jax.random.PRNGKey(0), x)
        y, _ = blk.apply(variables, x, train=True, mutable=["batch_stats"])
        assert y.shape == x.shape
        names = set(variables["params"].keys())
        if factorized:
            assert "conv1_bev" in names and "conv1_z" in names
        else:
            assert "conv1" in names

        def loss(p):
            o, _ = blk.apply({"params": p,
                              "batch_stats": variables["batch_stats"]},
                             x, train=True, mutable=["batch_stats"])
            return jnp.sum(o ** 2)

        g = jax.grad(loss)(variables["params"])
        assert all(np.isfinite(np.asarray(t)).all()
                   for t in jax.tree_util.tree_leaves(g))


def test_trunk2d_shapes_grads_and_trains(rng):
    """z-folded 2D trunk: correct BEV shape (out_features channels at
    1/8 res), finite grads, and a 40-step overfit halves a regression
    loss (trainability evidence for the flagship trunk2d switch)."""
    import jax
    import jax.numpy as jnp
    import optax

    from partner_tpu.models.backbone_dense import PolarDenseFHD

    feats, coords, mask, grid = _make_inputs(rng)
    bb = PolarDenseFHD(num_input_features=5, compute_dtype=jnp.float32,
                       trunk2d=True, a2d_features=32, out_features=48)
    variables = bb.init(jax.random.PRNGKey(0), feats, coords, mask, grid,
                        train=False)
    bev, ms = bb.apply(variables, feats, coords, mask, grid, train=False)
    n_r, n_az, n_z = grid
    assert bev.shape == (2, n_az // 8, n_r // 8, 48)
    assert np.all(np.isfinite(np.asarray(bev)))
    assert ms["canvas"].shape[1:4] == (n_z // 8, n_az // 4, n_r // 4)

    # regression target: push the mean BEV activation to a constant
    target = 0.7
    tx = optax.adam(3e-3)
    params = variables["params"]
    bs = variables["batch_stats"]
    opt = tx.init(params)

    @jax.jit
    def step(params, bs, opt):
        def loss_fn(p):
            (o, _), updates = bb.apply(
                {"params": p, "batch_stats": bs}, feats, coords, mask,
                grid, train=True, mutable=["batch_stats"])
            return jnp.mean((o.mean() - target) ** 2) + 0 * o.sum(), updates

        (l, updates), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, up), updates["batch_stats"], \
            opt2, l

    l0 = None
    for i in range(40):
        params, bs, opt, l = step(params, bs, opt)
        if i == 0:
            l0 = float(l)
    assert float(l) < 0.5 * l0, (l0, float(l))


class TestScatterMaxCustomVJP:
    """The gather-based max-scatter VJP (backbone_dense._scatter_max_rows)
    must match XLA's native scatter-max gradient on tie-free data and
    produce training-equivalent gradients through the real ReLU stem path
    where the only ties are post-ReLU zeros (relu'(0)=0 kills them)."""

    def _xla_ref(self, vals, lin, cells, zero_base):
        import jax.numpy as jnp
        c = vals.shape[-1]
        if zero_base:
            base = jnp.zeros((cells + 1, c), vals.dtype)
        else:
            base = jnp.full((cells + 1, c), jnp.finfo(vals.dtype).min,
                            vals.dtype)
        return base.at[lin].max(vals, mode="drop")[:cells]

    def test_forward_bit_parity_and_grad_on_tiefree(self, rng):
        import jax
        import jax.numpy as jnp

        from partner_tpu.models.backbone_dense import _scatter_max_rows

        p, c, cells = 600, 8, 64
        # tie-free by construction: unique values
        vals = jnp.asarray(
            np.random.RandomState(0).permutation(p * c).reshape(p, c)
            .astype(np.float32))
        lin = jnp.asarray(np.random.RandomState(1).randint(0, cells + 1, p))

        for zero_base in (True, False):
            out = _scatter_max_rows(vals, lin, cells, zero_base)
            ref = self._xla_ref(vals, lin, cells, zero_base)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

            g_ours = jax.grad(lambda v: (
                _scatter_max_rows(v, lin, cells, zero_base) ** 2).sum())(vals)
            g_ref = jax.grad(lambda v: (
                self._xla_ref(v, lin, cells, zero_base) ** 2).sum())(vals)
            np.testing.assert_array_equal(np.asarray(g_ours),
                                          np.asarray(g_ref))

    def test_grad_through_relu_matches_xla_with_zero_ties(self, rng):
        """Real-path shape: relu(x) -> 0-init scatter-max. Cells where the
        max is 0 have ALL members tied at 0; our VJP hands each the
        cotangent but relu' kills it, so d/dx must equal the XLA path."""
        import jax
        import jax.numpy as jnp

        from partner_tpu.models.backbone_dense import _scatter_max_rows

        p, c, cells = 400, 4, 16
        x = jnp.asarray(rng.randn(p, c).astype(np.float32))
        lin = jnp.asarray(rng.randint(0, cells, p))

        def loss_ours(x):
            return (_scatter_max_rows(jax.nn.relu(x), lin, cells, True)
                    ** 2).sum()

        def loss_ref(x):
            return (self._xla_ref(jax.nn.relu(x), lin, cells, True)
                    ** 2).sum()

        np.testing.assert_array_equal(
            np.asarray(jax.grad(loss_ours)(x)),
            np.asarray(jax.grad(loss_ref)(x)))

    def test_scatter_canvas_grad_unchanged(self, rng):
        """End-to-end scatter_canvas gradients through both paths."""
        import jax
        import jax.numpy as jnp

        from partner_tpu.models.backbone_dense import scatter_canvas

        b, n, c = 2, 128, 4
        feats = jnp.asarray(np.abs(rng.randn(b, n, c)).astype(np.float32))
        coords = jnp.asarray(
            np.stack([rng.randint(0, 4, (b, n)), rng.randint(0, 8, (b, n)),
                      rng.randint(0, 8, (b, n))], -1).astype(np.int32))
        mask = jnp.asarray(rng.rand(b, n) > 0.2)

        for fold2d in (True, False):
            def loss(f):
                canvas, _ = scatter_canvas(f, coords, mask, (4, 8, 8), 1, 1,
                                           fold2d=fold2d)
                return (canvas.astype(jnp.float32) ** 2).sum()

            g = jax.grad(loss)(feats)
            assert np.isfinite(np.asarray(g)).all()
            # masked rows receive no gradient
            gm = np.asarray(g)[~np.asarray(mask)]
            assert (gm == 0).all()
