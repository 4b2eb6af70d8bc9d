import numpy as np
import jax
import jax.numpy as jnp
import pytest

from partner_tpu import testing
from partner_tpu.models import build_detector

PR = testing.TINY_PR
GRID = (64, 128, 1)
VS = [testing.TINY_VS[0], testing.TINY_VS[1], PR[5] - PR[2]]


def pillar_cfg():
    vg = dict(range=PR, voxel_size=VS)
    return dict(
        type="PointPillars",
        reader=dict(
            type="DynamicPFNet", num_input_features=5, num_filters=[32],
            voxel_shape="cylinder", xyz_cluster=True, raz_cluster=True,
            xy_center=True, ra_center=True,
        ),
        neck=dict(
            type="RPN", layer_nums=[2, 2], ds_layer_strides=[4, 2],
            ds_num_filters=[32, 64], us_layer_strides=[1, 2],
            us_num_filters=[32, 32], num_input_features=32,
        ),
        bbox_head=dict(
            type="CenterHeadSinglePos",
            in_channels=64,
            tasks=[dict(num_class=1, class_names=["car"])],
            dataset="nuscenes",
            weight=0.5,
            code_weights=[1.0] * 10,
            common_heads={"reg": (2, 2), "rot_vel": (2, 2), "height": (1, 2),
                          "dim": (3, 2)},
            voxel_shape="cylinder",
            voxel_generator=dict(range=PR, voxel_size=VS, nsectors=1),
            out_size_factor=4,
        ),
        max_pillars=4096,
    )


@pytest.fixture(scope="module")
def pp_det():
    rng = np.random.RandomState(5)
    det = build_detector(pillar_cfg(), test_cfg=dict(
        score_threshold=0.1,
        post_center_limit_range=[-40, -40, -5, 40, 40, 5],
        nms=dict(nms_pre_max_size=128, nms_post_max_size=8,
                 nms_iou_threshold=0.2),
    ))
    ex = testing.make_example(rng, b=2, n_points=2000, cap=4096)
    # pillars consume raw padded points
    from partner_tpu.core.targets import CenterTargetAssigner

    assigner = CenterTargetAssigner(
        tasks=[dict(num_class=1, class_names=["car"])], out_size_factor=4,
        voxel_shape="cylinder",
    )
    per = {"hm": [], "anno_box": [], "ind": [], "mask": [], "cat": []}
    gt = np.asarray(ex["global_box"])
    for i in range(2):
        valid = gt[i, :, 7] > 0
        boxes = np.zeros((int(valid.sum()), 10), np.float32)
        boxes[:, :7] = gt[i, valid, :7]
        boxes[:, -1] = gt[i, valid, 6]
        t = assigner.assign(boxes, np.ones(len(boxes), np.int32),
                            (64, 128, 1), VS, PR)
        for k in per:
            per[k].append(t[k][0])
    ex.update({
        "hm": [jnp.asarray(np.stack(per["hm"])).transpose(0, 2, 3, 1)],
        "anno_box": [jnp.asarray(np.stack(per["anno_box"]))],
        "ind": [jnp.asarray(np.stack(per["ind"]))],
        "mask": [jnp.asarray(np.stack(per["mask"]))],
        "cat": [jnp.asarray(np.stack(per["cat"]))],
    })
    variables = det.init(jax.random.PRNGKey(0), ex)
    return det, variables, ex


class TestPointPillars:
    def test_forward_shapes(self, pp_det):
        det, variables, ex = pp_det
        preds = det.apply(variables, ex, train=False)
        p = preds["det_preds"][0]
        assert p["hm"].shape == (2, 32, 16, 1)

    def test_loss_and_predict(self, pp_det):
        det, variables, ex = pp_det
        ld, _ = det.loss(variables, ex)
        assert np.isfinite(float(ld["loss"]))
        out = det.predict(variables, ex)
        assert out["box3d_lidar"].shape[0] == 2
