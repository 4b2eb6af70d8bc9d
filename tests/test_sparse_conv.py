import numpy as np
import jax
import jax.numpy as jnp

from partner_tpu.models import sparse
from partner_tpu.models.backbone import SpMiddleResNetFHD


def make_sparse_sample(rng, shape, n_active, cap, c):
    """Random sorted sparse sample on grid `shape` (nz, ny, nx)."""
    nz, ny, nx = shape
    total = nz * ny * nx
    lin = np.sort(rng.choice(total, size=n_active, replace=False))
    z = lin // (ny * nx)
    rem = lin - z * ny * nx
    y = rem // nx
    x = rem - y * nx
    coords = np.zeros((cap, 3), np.int32)
    coords[:n_active] = np.stack([z, y, x], 1)
    feats = np.zeros((cap, c), np.float32)
    feats[:n_active] = rng.randn(n_active, c).astype(np.float32)
    mask = np.zeros((cap,), bool)
    mask[:n_active] = True
    return feats, coords, mask


def dense_conv_oracle(dense_in, w_flat, kernel, stride, padding):
    """lax 3D conv with kernel (K*Cin, Cout) in z,y,x kernel-major order."""
    kz, ky, kx = kernel
    cin = dense_in.shape[-1]
    cout = w_flat.shape[-1]
    w = w_flat.reshape(kz, ky, kx, cin, cout)
    return jax.lax.conv_general_dilated(
        dense_in[None], w, window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]


class TestSubmanifoldConv:
    def test_matches_dense_at_active_sites(self, rng):
        shape = (5, 12, 10)
        feats, coords, mask = make_sparse_sample(rng, shape, 80, 96, 4)
        nmap = sparse.build_subm_neighbor_map(
            jnp.asarray(coords), jnp.asarray(mask), shape
        )
        conv = sparse.SparseConv(features=6)
        params = conv.init(jax.random.PRNGKey(0), jnp.asarray(feats[None]),
                           jnp.asarray(nmap[None]))
        out = conv.apply(params, jnp.asarray(feats[None]), jnp.asarray(nmap[None]))[0]

        dense_in = np.zeros(shape + (4,), np.float32)
        dense_in[coords[mask, 0], coords[mask, 1], coords[mask, 2]] = feats[mask]
        w = np.asarray(params["params"]["kernel"])
        b = np.asarray(params["params"]["bias"])
        dense_out = np.asarray(
            dense_conv_oracle(jnp.asarray(dense_in), jnp.asarray(w),
                              (3, 3, 3), (1, 1, 1), (1, 1, 1))
        ) + b
        exp = dense_out[coords[mask, 0], coords[mask, 1], coords[mask, 2]]
        np.testing.assert_allclose(np.asarray(out)[mask], exp, rtol=1e-4, atol=1e-4)


class TestStridedConv:
    def test_output_sites_match_spconv_rule(self, rng):
        shape = (5, 12, 10)
        feats, coords, mask = make_sparse_sample(rng, shape, 60, 64, 3)
        out_shape = sparse.strided_out_shape(shape, (3, 3, 3), (2, 2, 2), (1, 1, 1))
        oc, om = sparse.downsample_coords(
            jnp.asarray(coords), jnp.asarray(mask), shape,
            (3, 3, 3), (2, 2, 2), (1, 1, 1), cap=128,
        )
        got = {tuple(c) for c in np.asarray(oc)[np.asarray(om)]}

        # oracle: output j active iff receptive field (2j-1 .. 2j+1 per dim)
        # hits an active input
        active = {tuple(c) for c in coords[mask]}
        exp = set()
        for z in range(out_shape[0]):
            for y in range(out_shape[1]):
                for x in range(out_shape[2]):
                    for dz in (-1, 0, 1):
                        for dy in (-1, 0, 1):
                            for dx in (-1, 0, 1):
                                if (2 * z + dz, 2 * y + dy, 2 * x + dx) in active:
                                    exp.add((z, y, x))
        assert got == exp

    def test_values_match_dense_oracle(self, rng):
        shape = (4, 8, 8)
        feats, coords, mask = make_sparse_sample(rng, shape, 40, 48, 3)
        block = sparse.SparseDownBlock(features=5, cap=64, num_res=0)
        grid = sparse.SparseGrid(
            jnp.asarray(feats[None]), jnp.asarray(coords[None]),
            jnp.asarray(mask[None]), shape,
        )
        params = block.init(jax.random.PRNGKey(1), grid, train=False)
        out = block.apply(params, grid, train=False)

        dense_in = np.zeros(shape + (3,), np.float32)
        dense_in[coords[mask, 0], coords[mask, 1], coords[mask, 2]] = feats[mask]
        w = np.asarray(params["params"]["SparseConv_0"]["kernel"])
        pre = np.asarray(
            dense_conv_oracle(jnp.asarray(dense_in), jnp.asarray(w),
                              (3, 3, 3), (2, 2, 2), (1, 1, 1))
        )
        # apply the BN(eval: identity scale/bias init) + relu to oracle
        exp = np.maximum(pre / np.sqrt(1 + 1e-3), 0)

        oc = np.asarray(out.coords[0])
        om = np.asarray(out.mask[0])
        got = np.asarray(out.features[0])[om]
        np.testing.assert_allclose(
            got, exp[oc[om, 0], oc[om, 1], oc[om, 2]], rtol=1e-4, atol=1e-4
        )

    def test_z_squeeze_conv(self, rng):
        # extra_conv pattern: kernel (3,1,1) stride (2,1,1) no padding
        shape = (5, 6, 6)
        feats, coords, mask = make_sparse_sample(rng, shape, 30, 32, 3)
        out_shape = sparse.strided_out_shape(shape, (3, 1, 1), (2, 1, 1), (0, 0, 0))
        assert out_shape == (2, 6, 6)
        oc, om = sparse.downsample_coords(
            jnp.asarray(coords), jnp.asarray(mask), shape,
            (3, 1, 1), (2, 1, 1), (0, 0, 0), cap=64,
        )
        active = {tuple(c) for c in coords[mask]}
        exp = set()
        for z in range(2):
            for y in range(6):
                for x in range(6):
                    if any((2 * z + k, y, x) in active for k in range(3)):
                        exp.add((z, y, x))
        got = {tuple(c) for c in np.asarray(oc)[np.asarray(om)]}
        assert got == exp


class TestBackbone:
    def test_shapes_flagship_downscaled(self, rng):
        # 1/8-size flagship grid: (144, 256, 40) r, az, z
        input_shape = (144, 256, 40)
        nz, ny, nx = 41, 256, 144
        feats, coords, mask = make_sparse_sample(
            rng, (nz, ny, nx), 2000, 2048, 7
        )
        model = SpMiddleResNetFHD(num_input_features=7)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(feats[None]),
            jnp.asarray(coords[None]), jnp.asarray(mask[None]),
            input_shape, train=False,
        )
        bev, ms = model.apply(
            variables, jnp.asarray(feats[None]), jnp.asarray(coords[None]),
            jnp.asarray(mask[None]), input_shape, train=False,
        )
        assert bev.shape == (1, 32, 18, 256)
        assert set(ms) == {"conv1", "conv2", "conv3", "conv4"}
        assert np.isfinite(np.asarray(bev)).all()


class TestDenseIndexing:
    def test_subm_map_matches_binary(self, rng):
        shape = (6, 14, 12)
        feats, coords, mask = make_sparse_sample(rng, shape, 90, 128, 3)
        a = sparse.build_subm_neighbor_map(
            jnp.asarray(coords), jnp.asarray(mask), shape
        )
        b = sparse.build_subm_neighbor_map_dense(
            jnp.asarray(coords), jnp.asarray(mask), shape
        )
        # sentinel differs only in value domain; both use N
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_downsample_matches_sort_variant(self, rng):
        shape = (6, 14, 12)
        feats, coords, mask = make_sparse_sample(rng, shape, 70, 96, 3)
        oc1, om1 = sparse.downsample_coords(
            jnp.asarray(coords), jnp.asarray(mask), shape,
            (3, 3, 3), (2, 2, 2), (1, 1, 1), 128,
        )
        oc2, om2 = sparse.downsample_coords_dense(
            jnp.asarray(coords), jnp.asarray(mask), shape,
            (3, 3, 3), (2, 2, 2), (1, 1, 1), 128,
        )
        np.testing.assert_array_equal(np.asarray(om1), np.asarray(om2))
        np.testing.assert_array_equal(
            np.asarray(oc1)[np.asarray(om1)], np.asarray(oc2)[np.asarray(om2)]
        )

    def test_backbone_methods_agree(self, rng):
        input_shape = (24, 32, 24)
        nz, ny, nx = 25, 32, 24
        feats, coords, mask = make_sparse_sample(rng, (nz, ny, nx), 300, 384, 5)
        outs = []
        for method in ("dense", "binary"):
            model = SpMiddleResNetFHD(num_input_features=5,
                                      index_method=method)
            v = model.init(
                jax.random.PRNGKey(0), jnp.asarray(feats[None]),
                jnp.asarray(coords[None]), jnp.asarray(mask[None]),
                input_shape, train=False,
            )
            bev, _ = model.apply(
                v, jnp.asarray(feats[None]), jnp.asarray(coords[None]),
                jnp.asarray(mask[None]), input_shape, train=False,
            )
            outs.append(np.asarray(bev))
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)
