import numpy as np

from partner_tpu.core import targets

GRID = np.array([1152, 2048, 40])
VS = [0.065, 0.00307, 0.15]
PR = [0.3, -3.14368, -2.0, 75.18, 3.14368, 4.0]
TASKS = [dict(num_class=1, class_names=["Vehicle"])]


def make_assigner(**kw):
    return targets.CenterTargetAssigner(
        tasks=TASKS, out_size_factor=8, gaussian_overlap=0.1, max_objs=500,
        min_radius=2, voxel_shape="cylinder", **kw
    )


def box_at(x, y, yaw=0.0, dims=(4.5, 2.0, 1.8), z=0.5):
    return np.array([x, y, z, *dims, yaw], dtype=np.float32)


class TestGaussianRadius:
    def test_monotonic_in_size(self):
        r1 = targets.gaussian_radius((4, 4), 0.1)
        r2 = targets.gaussian_radius((8, 8), 0.1)
        assert r2 > r1 > 0

    def test_draw_peak_at_center(self):
        hm = np.zeros((32, 32), np.float32)
        targets.draw_gaussian(hm, (10, 12), 3)
        assert hm[12, 10] == 1.0
        assert hm.max() == 1.0

    def test_draw_clipped_at_border(self):
        hm = np.zeros((16, 16), np.float32)
        targets.draw_gaussian(hm, (0, 0), 5)
        assert hm[0, 0] == 1.0


class TestPolarAssign:
    def test_peak_cell_and_regression(self):
        a = make_assigner()
        boxes = np.stack([box_at(20.0, 10.0, yaw=0.4)])
        classes = np.array([1])
        out = a.assign(boxes, classes, GRID, VS, PR)
        hm, anno, ind, mask, cat = (
            out["hm"][0], out["anno_box"][0], out["ind"][0], out["mask"][0],
            out["cat"][0],
        )
        n_r, n_az = 144, 256
        assert hm.shape == (1, n_az, n_r)
        assert mask[0] == 1 and mask[1:].sum() == 0
        r = np.hypot(20.0, 10.0)
        phi = np.arctan2(10.0, 20.0)
        r_i = int((r - PR[0]) / VS[0] / 8)
        a_i = int((phi - PR[1]) / VS[1] / 8)
        assert ind[0] == a_i * n_r + r_i
        assert hm[0, a_i, r_i] == 1.0
        # decode regression: cell corner real position + offset == center
        r_real = r_i * 8 * VS[0] + PR[0]
        a_real = a_i * 8 * VS[1] + PR[1]
        cx, cy = r_real * np.cos(a_real), r_real * np.sin(a_real)
        np.testing.assert_allclose(cx + anno[0, 0], 20.0, atol=1e-4)
        np.testing.assert_allclose(cy + anno[0, 1], 10.0, atol=1e-4)
        np.testing.assert_allclose(anno[0, 2], 0.5)
        np.testing.assert_allclose(np.exp(anno[0, 3:6]), [4.5, 2.0, 1.8], rtol=1e-5)
        np.testing.assert_allclose(anno[0, 8], np.sin(0.4), atol=1e-6)
        np.testing.assert_allclose(anno[0, 9], np.cos(0.4), atol=1e-6)

    def test_out_of_range_skipped(self):
        a = make_assigner()
        boxes = np.stack([box_at(200.0, 0.0)])  # rho beyond range
        out = a.assign(boxes, np.array([1]), GRID, VS, PR)
        assert out["mask"][0].sum() == 0
        assert out["hm"][0].max() == 0.0

    def test_rectify_rotates_into_ray_frame(self):
        a = make_assigner(rectify=True)
        phi = np.pi / 3
        r = 30.0
        boxes = np.stack([box_at(r * np.cos(phi), r * np.sin(phi), yaw=phi)])
        out = a.assign(boxes, np.array([1]), GRID, VS, PR)
        anno = out["anno_box"][0]
        # yaw - center azimuth == 0 -> sin 0, cos 1
        np.testing.assert_allclose(anno[0, 8], 0.0, atol=1e-6)
        np.testing.assert_allclose(anno[0, 9], 1.0, atol=1e-6)

    def test_multi_task_split(self):
        tasks = [
            dict(num_class=1, class_names=["car"]),
            dict(num_class=2, class_names=["ped", "cyc"]),
        ]
        a = targets.CenterTargetAssigner(
            tasks=tasks, out_size_factor=8, voxel_shape="cylinder"
        )
        boxes = np.stack([box_at(10, 0), box_at(20, 5), box_at(30, -5)])
        classes = np.array([1, 2, 3])  # car, ped, cyc
        out = a.assign(boxes, classes, GRID, VS, PR)
        assert out["hm"][0].shape[0] == 1
        assert out["hm"][1].shape[0] == 2
        assert out["mask"][0].sum() == 1
        assert out["mask"][1].sum() == 2
        assert set(out["cat"][1][:2].tolist()) == {0, 1}


class TestVotemap:
    def test_center_channels_and_gaussian(self):
        boxes = np.stack([box_at(20.0, 10.0, yaw=0.2)])
        vm = targets.draw_votemap(
            boxes, np.array([0]), 1, GRID, VS, PR, feature_map_stride=8
        )
        assert vm.shape == (256, 144, 5)
        r = np.hypot(20.0, 10.0)
        phi = np.arctan2(10.0, 20.0)
        r_i = int((r - PR[0]) / VS[0] / 8)
        a_i = int((phi - PR[1]) / VS[1] / 8)
        np.testing.assert_allclose(vm[a_i, r_i, :2], [20.0, 10.0], atol=1e-5)
        np.testing.assert_allclose(vm[a_i, r_i, 2], r, atol=1e-5)
        np.testing.assert_allclose(vm[a_i, r_i, 3], phi, atol=1e-5)
        assert vm[a_i, r_i, 4] == 1.0
        # gaussian decays away from center
        assert vm[:, :, 4].sum() > 1.0

    def test_empty_boxes(self):
        vm = targets.draw_votemap(
            np.zeros((0, 7), np.float32), np.zeros((0,)), 1, GRID, VS, PR
        )
        assert vm.sum() == 0.0

    def test_near_origin_box_truncated(self):
        # box centered near origin spans most azimuths; must not crash and
        # must produce a bounded azimuth window
        boxes = np.stack([box_at(0.5, 0.1, yaw=0.0)])
        vm = targets.draw_votemap(boxes, np.array([0]), 1, GRID, VS, PR)
        assert np.isfinite(vm).all()
