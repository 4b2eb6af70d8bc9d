"""Activation parity: reference torch modules vs converted flax modules.

Imports the reference RPN / SepHead (pure torch, runnable on CPU) via
reference_loader, converts their randomly-initialized state_dicts with
partner_tpu.train.torch_convert, and asserts output parity on a fixed
input. The spconv backbone cannot be executed (spconv absent), so its
converter is validated against torch.nn.functional.conv3d with submanifold
masking.
"""

import logging

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_loader import load_reference_modules  # noqa: E402

from partner_tpu.train import torch_convert as tc  # noqa: E402


@pytest.fixture(scope="module")
def ref_modules():
    try:
        return load_reference_modules()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference tree unavailable: {e}")


class TestRPNParity:
    def test_activation_parity(self, ref_modules, rng):
        import jax

        from partner_tpu.models.rpn import RPN as JaxRPN

        RefRPN, _, _ = ref_modules
        layer_nums, ds, dsf = [2, 2], [1, 2], [32, 64]
        us, usf = [1, 2], [64, 64]
        ref = RefRPN(layer_nums, ds, dsf, us, usf, 32,
                     logger=logging.getLogger("t"))
        ref.eval()

        params, stats = tc.convert_rpn_state_dict(
            ref.state_dict(), layer_nums, us)

        x = rng.randn(1, 32, 16, 24).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()

        jrpn = JaxRPN(layer_nums, ds, dsf, us, usf, 32)
        variables = {"params": params, "batch_stats": stats}
        got = jrpn.apply(variables, np.transpose(x, (0, 2, 3, 1)),
                         train=False)
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestSepHeadParity:
    def test_activation_parity(self, ref_modules, rng):
        from partner_tpu.models.center_head import SepHead as JaxSepHead

        _, _, RefSepHead = ref_modules
        heads = {"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                 "rot": (2, 2), "hm": (1, 2)}
        ref = RefSepHead(64, dict(heads), init_bias=-2.19, final_kernel=3)
        ref.eval()

        params = tc.convert_sep_head_state_dict(ref.state_dict(), heads)

        x = rng.randn(1, 64, 8, 12).astype(np.float32)
        with torch.no_grad():
            want = {k: v.numpy() for k, v in
                    ref(torch.from_numpy(x)).items()}

        jh = JaxSepHead(heads=tuple(sorted(heads.items())))
        got = jh.apply({"params": params},
                       np.transpose(x, (0, 2, 3, 1)), train=False)
        for k in want:
            g = np.transpose(np.asarray(got[k]), (0, 3, 1, 2))
            np.testing.assert_allclose(g, want[k], rtol=1e-3, atol=1e-4,
                                       err_msg=k)


class TestBackboneConverter:
    def test_subm_conv_matches_torch_dense(self, rng):
        """Converted spconv-layout weight through our gather-matmul sparse
        conv == torch conv3d evaluated at active sites."""
        import jax.numpy as jnp

        from partner_tpu.models import sparse

        shape = (6, 10, 8)
        n = 64
        total = shape[0] * shape[1] * shape[2]
        lin = np.sort(rng.choice(total, n, replace=False))
        z = lin // (shape[1] * shape[2])
        rem = lin - z * shape[1] * shape[2]
        coords = np.stack([z, rem // shape[2], rem % shape[2]], 1).astype(
            np.int32)
        mask = np.ones((n,), bool)
        cin, cout = 4, 5
        feats = rng.randn(n, cin).astype(np.float32)

        # spconv SubMConv3d weight layout (kz, ky, kx, I, O)
        w_ref = rng.randn(3, 3, 3, cin, cout).astype(np.float32)
        w_ours = tc.convert_torch_subm_conv(w_ref)

        dense = np.zeros(shape + (cin,), np.float32)
        dense[coords[:, 0], coords[:, 1], coords[:, 2]] = feats
        t = torch.from_numpy(dense.transpose(3, 0, 1, 2)[None])
        wt = torch.from_numpy(w_ref.transpose(4, 3, 0, 1, 2))  # (O,I,kz,ky,kx)
        with torch.no_grad():
            out_dense = torch.nn.functional.conv3d(t, wt, padding=1)
        out_dense = out_dense[0].numpy().transpose(1, 2, 3, 0)
        want = out_dense[coords[:, 0], coords[:, 1], coords[:, 2]]

        nmap = sparse.build_subm_neighbor_map(
            jnp.asarray(coords), jnp.asarray(mask), shape)
        got = sparse.SparseConv(cout, use_bias=False).apply(
            {"params": {"kernel": jnp.asarray(w_ours)}},
            jnp.asarray(feats)[None], nmap[None])[0]
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                                   atol=1e-5)

    def test_full_backbone_state_dict_maps(self, rng):
        """A fabricated reference-layout state_dict loads into the sparse
        backbone's tree with matching shapes."""
        import jax
        import jax.numpy as jnp

        from partner_tpu.models.backbone import SpMiddleResNetFHD

        def bn(c):
            return {"weight": np.ones(c, np.float32),
                    "bias": np.zeros(c, np.float32),
                    "running_mean": np.zeros(c, np.float32),
                    "running_var": np.ones(c, np.float32)}

        sd = {}
        def put(prefix, d):
            for k, v in d.items():
                sd[f"{prefix}.{k}"] = v

        def block(prefix, c):
            sd[f"{prefix}.conv1.weight"] = rng.randn(3, 3, 3, c, c).astype(np.float32)
            sd[f"{prefix}.conv2.weight"] = rng.randn(3, 3, 3, c, c).astype(np.float32)
            put(f"{prefix}.bn1", bn(c))
            put(f"{prefix}.bn2", bn(c))

        sd["conv_input.0.weight"] = rng.randn(3, 3, 3, 5, 16).astype(np.float32)
        put("conv_input.1", bn(16))
        block("conv1.0", 16)
        block("conv1.1", 16)
        for name, ci, co in (("conv2", 16, 32), ("conv3", 32, 64),
                             ("conv4", 64, 128)):
            sd[f"{name}.0.weight"] = rng.randn(3, 3, 3, ci, co).astype(np.float32)
            put(f"{name}.1", bn(co))
            block(f"{name}.3", co)
            block(f"{name}.4", co)
        sd["extra_conv.0.weight"] = rng.randn(3, 1, 1, 128, 128).astype(np.float32)
        put("extra_conv.1", bn(128))

        params, stats = tc.convert_backbone_state_dict(sd)

        bb = SpMiddleResNetFHD(num_input_features=5, index_method="binary")
        grid = (16, 32, 24)
        n = 32
        total = grid[0] * grid[1] * grid[2]
        lin = np.sort(rng.choice(total, n, replace=False))
        z = lin // (grid[1] * grid[0])
        rem = lin - z * grid[1] * grid[0]
        coords = np.stack([z, rem // grid[0], rem % grid[0]], 1).astype(np.int32)
        feats = jnp.asarray(rng.rand(1, n, 5).astype(np.float32))
        variables = bb.init(jax.random.PRNGKey(0), feats,
                            jnp.asarray(coords)[None],
                            jnp.ones((1, n), bool), grid, train=False)

        ref_shapes = jax.tree_util.tree_map(np.shape, variables["params"])
        got_shapes = jax.tree_util.tree_map(np.shape, params)
        # every converted param must exist with the right shape (biases are
        # absent in the reference and stay at our init)
        def check(prefix, got, ref):
            for k, v in got.items():
                assert k in ref, f"{prefix}{k} missing in our tree"
                if isinstance(v, dict):
                    check(prefix + k + "/", v, ref[k])
                else:
                    assert v == ref[k], (prefix + k, v, ref[k])
        check("", got_shapes, ref_shapes)
