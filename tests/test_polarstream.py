"""PolarStream streaming detector: sector equivalence, predict, loss."""

import numpy as np
import pytest

from partner_tpu import testing

TINY_PR = testing.TINY_PR
GRID = (64, 128, 24)  # r, az, z (pillars use z=1)


def _pillar_cfg(n_sectors, neck_type="RPNTECP", invariant=True):
    vs = [(TINY_PR[3] - TINY_PR[0]) / GRID[0],
          (TINY_PR[4] - TINY_PR[1]) / GRID[1],
          TINY_PR[5] - TINY_PR[2]]
    vg = dict(range=TINY_PR, voxel_size=vs, nsectors=n_sectors,
              max_voxel_num=[8192, 8192], voxel_shape="cylinder")
    return dict(
        type="PolarStream",
        reader=dict(type="DynamicPFNet",
                    # invariant: base feature = rho only + offset-style
                    # decorations, so the whole pipeline is rotation-
                    # equivariant and sector==monolithic holds exactly
                    num_input_features=1 if invariant else 4,
                    num_filters=(32,),
                    xyz_cluster=not invariant, xy_center=not invariant,
                    raz_cluster=True, ra_center=True),
        # ds 2,2 + us 1,2 -> neck output at 1/2 the pillar grid
        neck=dict(type=neck_type, layer_nums=[2, 2],
                  ds_layer_strides=[2, 2], ds_num_filters=[32, 64],
                  us_layer_strides=[1, 2], us_num_filters=[32, 32],
                  num_input_features=32),
        bbox_head=dict(
            type="CenterHeadSingle",
            in_channels=64,
            tasks=[dict(num_class=1, class_names=["car"])],
            common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                          "rot": (2, 2)},
            dataset="nuscenes",
            weight=0.25,
            code_weights=[1.0] * 8,
            voxel_generator=vg,
            out_size_factor=2,
        ),
    )


def _points(rng, b=1, n=1600, cap=2048):
    import jax.numpy as jnp

    boxes, cart = testing.synthetic_polar_scene(rng, TINY_PR, n, n_boxes=3)
    from partner_tpu.core import box_np_ops

    polar = box_np_ops.transform_points(cart[:, :3], "cylinder")
    polar = np.concatenate([polar, cart[:, 3:4]], 1)[:, :4]
    # the equivalence check needs points strictly inside azimuth cells:
    # nudge any point near a sector-boundary cell edge
    pad = np.zeros((cap, 4), np.float32)
    m = np.zeros((cap,), bool)
    k = min(len(polar), cap)
    pad[:k] = polar[:k]
    m[:k] = True
    return boxes, jnp.asarray(pad[None]).repeat(b, 0), jnp.asarray(m[None]).repeat(b, 0)


class TestSectorEquivalence:
    def test_interior_hm_matches_monolithic(self, rng):
        """4-sector streaming == monolithic away from sector trailing edges.

        Rotation-invariant pillar decorations + shared params: the polar
        grid makes sector rotation an azimuth translation, so all interior
        cells must agree; only each sector's trailing-edge receptive field
        differs (TECP pads it with zeros until the next sector arrives —
        the reference has the same latency-mode semantics).
        """
        import jax

        from partner_tpu.models import build_detector

        det4 = build_detector(_pillar_cfg(4), test_cfg={})
        det1 = build_detector(_pillar_cfg(1), test_cfg={})
        _, pts, mask = _points(rng)
        ex = {"points": pts, "points_mask": mask}

        variables = det4.init(jax.random.PRNGKey(0), ex)

        # compare NECK outputs: the head's RSNorm takes per-forward stats
        # over the (sector-sized) azimuth extent, so head maps legitimately
        # differ between streaming and monolithic — as in the reference
        def neck_feats(mod, example, train=False):
            points, mask_ = example["points"], example["points_mask"]
            outs, ctx = [], None
            for s in range(mod.n_sectors):
                pts_s, sel = mod._rotate_to_sector(points, mask_, s)
                canvas = mod._encode_sector(pts_s, sel, False)
                x, ctx = mod.neck(canvas, ctx, train=False)
                outs.append(x)
            return outs

        p4 = det4.module.apply(variables, ex, train=False, method=neck_feats)
        p1 = det1.module.apply(variables, ex, train=False, method=neck_feats)

        hm4 = np.concatenate([np.asarray(s) for s in p4], axis=1)
        hm1 = np.asarray(p1[0])
        assert hm4.shape == hm1.shape  # (B, az/8, r/8, C)

        sec_az = hm1.shape[1] // 4
        # trailing-edge zeros corrupt ~receptive-field rows before each
        # boundary and ~#convs rows after it (via the carried context)
        margin = 6
        interior = np.ones(hm1.shape[1], bool)
        for s in range(4):
            lo, hi = s * sec_az, (s + 1) * sec_az
            interior[max(0, lo - margin): lo + margin] = False
            interior[hi - margin: min(hm1.shape[1], hi + margin)] = False
        diff = np.abs(hm4[:, interior] - hm1[:, interior])
        assert diff.max() < 2e-3, diff.max()
        # and the boundary cells DO differ (the context carry is real)
        assert np.abs(hm4 - hm1).max() > 1e-4


class TestPolarStreamPredict:
    def test_fixed_shapes_and_finite(self, rng):
        import jax

        from partner_tpu.models import build_detector

        tc = dict(score_threshold=0.05,
                  post_center_limit_range=[-40, -40, -5, 40, 40, 5],
                  nms=dict(nms_pre_max_size=256, nms_post_max_size=32,
                           nms_iou_threshold=0.5))
        det = build_detector(_pillar_cfg(4), test_cfg=tc)
        _, pts, mask = _points(rng)
        ex = {"points": pts, "points_mask": mask}
        variables = det.init(jax.random.PRNGKey(0), ex)
        out = det.predict(variables, ex)
        assert out["box3d_lidar"].shape == (1, 4 * 32, 7)
        assert out["scores"].shape == (1, 4 * 32)
        assert np.all(np.isfinite(np.asarray(out["box3d_lidar"])))
        # kept boxes must lie inside the full sweep azimuth range
        m = np.asarray(out["mask"][0])
        if m.any():
            b = np.asarray(out["box3d_lidar"][0])[m]
            az = np.arctan2(b[:, 1], b[:, 0])
            assert np.all(az >= TINY_PR[1] - 1e-3)
            assert np.all(az <= TINY_PR[4] + 1e-3)


class TestSectorTargetsAndLoss:
    def test_assign_label_sectors_and_loss(self, rng):
        import jax
        import jax.numpy as jnp

        from partner_tpu.data.pipeline import AssignLabel
        from partner_tpu.models import build_detector

        boxes, pts, mask = _points(rng)
        classes = np.ones(len(boxes), np.int64)
        vs = [(TINY_PR[3] - TINY_PR[0]) / GRID[0],
              (TINY_PR[4] - TINY_PR[1]) / GRID[1],
              TINY_PR[5] - TINY_PR[2]]
        al = AssignLabel(cfg=dict(
            target_assigner=dict(tasks=[dict(num_class=1,
                                             class_names=["car"])]),
            out_size_factor=2, max_objs=16, voxel_shape="cylinder",
            nsectors=4,
        ), with_votemap=False, with_global_box=False)
        res = {"mode": "train",
               "lidar": {"voxels": dict(shape=(GRID[0], GRID[1], 1),
                                        range=np.asarray(TINY_PR),
                                        size=np.asarray(vs)),
                         "annotations": {"gt_boxes": boxes,
                                         "gt_classes": classes}}}
        res, _ = al(res, {})
        t = res["lidar"]["targets"]
        assert t["hm"][0].shape == (4, 1, GRID[1] // 4 // 2, GRID[0] // 2)
        # every gt lands in exactly one sector
        assert sum(int(t["mask"][0][s].sum()) for s in range(4)) == len(boxes)

        det = build_detector(_pillar_cfg(4), test_cfg={})
        ex = {"points": pts, "points_mask": mask}
        for k in ("hm", "anno_box", "ind", "mask", "cat"):
            ex[k] = [jnp.asarray(t[k][0])[None]]  # add batch dim
        variables = det.init(jax.random.PRNGKey(0), ex)
        ld, _ = det.loss(variables, ex, jax.random.PRNGKey(1))
        assert np.isfinite(float(ld["loss"]))


class TestDetSeg:
    def test_multitask_loss_and_point_labels(self, rng):
        import jax
        import jax.numpy as jnp

        from partner_tpu.models import build_detector
        from partner_tpu.models.polarstream import majority_cell_labels

        cfg = _pillar_cfg(2)
        cfg["seg_head"] = dict(type="SingleConvHead", num_classes=8,
                               weight=2.0)
        tc = dict(score_threshold=0.05,
                  post_center_limit_range=[-40, -40, -5, 40, 40, 5],
                  nms=dict(nms_pre_max_size=128, nms_post_max_size=16,
                           nms_iou_threshold=0.5))
        det = build_detector(cfg, test_cfg=tc)
        boxes, pts, mask = _points(rng)
        ex = {"points": pts, "points_mask": mask,
              "points_label": jnp.asarray(
                  rng.randint(0, 9, np.asarray(mask).shape).astype(np.int32))}

        from partner_tpu.data.pipeline import AssignLabel
        vs = [(TINY_PR[3] - TINY_PR[0]) / GRID[0],
              (TINY_PR[4] - TINY_PR[1]) / GRID[1],
              TINY_PR[5] - TINY_PR[2]]
        al = AssignLabel(cfg=dict(
            target_assigner=dict(tasks=[dict(num_class=1,
                                             class_names=["car"])]),
            out_size_factor=2, max_objs=16, voxel_shape="cylinder",
            nsectors=2,
        ), with_votemap=False, with_global_box=False)
        res = {"mode": "train",
               "lidar": {"voxels": dict(shape=(GRID[0], GRID[1], 1),
                                        range=np.asarray(TINY_PR),
                                        size=np.asarray(vs)),
                         "annotations": {
                             "gt_boxes": boxes,
                             "gt_classes": np.ones(len(boxes), np.int64)}}}
        res, _ = al(res, {})
        for k in ("hm", "anno_box", "ind", "mask", "cat"):
            ex[k] = [jnp.asarray(res["lidar"]["targets"][k][0])[None]]

        variables = det.init(jax.random.PRNGKey(0), ex)
        ld, _ = det.loss(variables, ex, jax.random.PRNGKey(1))
        assert "seg_loss" in ld and np.isfinite(float(ld["seg_loss"]))
        assert np.isfinite(float(ld["loss"]))

        out = det.predict(variables, ex)
        assert "point_seg_labels" in out
        lab = np.asarray(out["point_seg_labels"])
        assert lab.shape == np.asarray(mask).shape
        m = np.asarray(mask)
        assert lab[m].min() >= 0 and lab[m].max() <= 8

    def test_majority_labels_oracle(self, rng):
        import jax.numpy as jnp
        from partner_tpu.models.polarstream import majority_cell_labels

        grid = (4, 6, 1)  # n_r=4, n_az=6
        n = 50
        a = rng.randint(0, 6, n).astype(np.int32)
        r = rng.randint(0, 4, n).astype(np.int32)
        ok = rng.rand(n) > 0.1
        lab = rng.randint(0, 4, n).astype(np.int32)  # classes 0..3 (0=unlab)
        got = np.asarray(majority_cell_labels(
            jnp.asarray(a)[None], jnp.asarray(r)[None],
            jnp.asarray(ok)[None], jnp.asarray(lab)[None], grid, 3))[0]
        want = np.zeros((6, 4), np.int64)
        for ai in range(6):
            for ri in range(4):
                sel = (a == ai) & (r == ri) & ok & (lab > 0)
                if sel.any():
                    want[ai, ri] = np.bincount(lab[sel], minlength=4)[1:].argmax() + 1
        np.testing.assert_array_equal(got, want)

    def test_majority_labels_vs_executed_reference_kernel(self, rng):
        """Golden: the reference's numba assign_voxel_labels
        (pipelines/preprocess.py:170-191, executed with numba stubbed) on
        the labeled-point subset. Label 0 is our 'unlabeled' sentinel (the
        reference counts it as a class), so parity is asserted on lab>0
        points — the population both implementations assign from."""
        import jax.numpy as jnp

        from partner_tpu.models.polarstream import majority_cell_labels
        from reference_loader import load_reference_assigner

        AssignLabel, _ = load_reference_assigner()

        grid = (4, 6, 1)  # n_r=4, n_az=6
        n = 80
        a = rng.randint(0, 6, n).astype(np.int32)
        r = rng.randint(0, 4, n).astype(np.int32)
        ok = rng.rand(n) > 0.1
        lab = rng.randint(0, 4, n).astype(np.int32)

        got = np.asarray(majority_cell_labels(
            jnp.asarray(a)[None], jnp.asarray(r)[None],
            jnp.asarray(ok)[None], jnp.asarray(lab)[None], grid, 3))[0]

        sel = ok & (lab > 0)
        pairs = np.stack([a[sel], r[sel], np.zeros(sel.sum(), np.int32),
                          lab[sel]], 1).astype(np.int32)
        pairs = pairs[np.lexsort((pairs[:, 2], pairs[:, 1], pairs[:, 0]))]
        want = np.zeros((6, 4, 1), np.int32)
        AssignLabel.assign_voxel_labels(pairs, want)
        np.testing.assert_array_equal(got, want[..., 0])
