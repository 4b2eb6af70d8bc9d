import numpy as np
import jax.numpy as jnp

from partner_tpu.ops import rotated_iou, nms


def mc_intersection_area(box_a, box_b, n=200000, seed=0):
    """Monte-carlo oracle for rotated rect intersection area."""
    rng = np.random.RandomState(seed)

    def corners(b):
        c, s = np.cos(b[4]), np.sin(b[4])
        pts = np.array(
            [[-b[2] / 2, -b[3] / 2], [-b[2] / 2, b[3] / 2],
             [b[2] / 2, b[3] / 2], [b[2] / 2, -b[3] / 2]]
        )
        rot = np.array([[c, s], [-s, c]])
        return pts @ rot + b[:2]

    allc = np.concatenate([corners(box_a), corners(box_b)])
    lo, hi = allc.min(0) - 0.1, allc.max(0) + 0.1
    samples = rng.uniform(lo, hi, (n, 2))

    def inside(b, p):
        d = p - b[:2]
        c, s = np.cos(b[4]), np.sin(b[4])
        lx = d[:, 0] * c + d[:, 1] * s
        ly = -d[:, 0] * s + d[:, 1] * c
        return (np.abs(lx) <= b[2] / 2) & (np.abs(ly) <= b[3] / 2)

    frac = (inside(box_a, samples) & inside(box_b, samples)).mean()
    return frac * np.prod(hi - lo)


def random_bev_boxes(rng, n, spread=10.0):
    b = np.zeros((n, 5), dtype=np.float32)
    b[:, :2] = rng.uniform(-spread, spread, (n, 2))
    b[:, 2:4] = rng.uniform(1.0, 5.0, (n, 2))
    b[:, 4] = rng.uniform(-np.pi, np.pi, n)
    return b


class TestRotatedIoU:
    def test_identical_boxes(self):
        b = jnp.array([[0.0, 0.0, 4.0, 2.0, 0.3]])
        iou = np.asarray(rotated_iou.boxes_iou_bev(b, b))
        np.testing.assert_allclose(iou, 1.0, atol=1e-4)

    def test_disjoint_boxes(self):
        a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        b = jnp.array([[10.0, 10.0, 2.0, 2.0, 1.0]])
        iou = np.asarray(rotated_iou.boxes_iou_bev(a, b))
        np.testing.assert_allclose(iou, 0.0, atol=1e-6)

    def test_axis_aligned_overlap(self):
        # two unit squares overlapping in a 0.5 x 1 strip
        a = jnp.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
        b = jnp.array([[0.5, 0.0, 1.0, 1.0, 0.0]])
        iou = float(rotated_iou.boxes_iou_bev(a, b)[0, 0])
        np.testing.assert_allclose(iou, 0.5 / 1.5, atol=1e-4)

    def test_cross_rotation(self):
        # square vs same square rotated 45deg: known overlap ratio
        a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        b = jnp.array([[0.0, 0.0, 2.0, 2.0, np.pi / 4]])
        inter = float(rotated_iou.rect_intersection_area(a[0], b[0]))
        # octagon area = 8*(sqrt(2)-1) for side-2 squares
        np.testing.assert_allclose(inter, 8 * (np.sqrt(2) - 1), rtol=1e-3)

    def test_monte_carlo_random_pairs(self, rng):
        boxes = random_bev_boxes(rng, 12, spread=3.0)
        a, b = boxes[:6], boxes[6:]
        inter = np.asarray(
            rotated_iou.rect_intersection_area(jnp.asarray(a), jnp.asarray(b))
        )
        for i in range(6):
            exp = mc_intersection_area(a[i], b[i], seed=i)
            np.testing.assert_allclose(inter[i], exp, atol=0.08)

    def test_iou3d_aligned(self):
        a = jnp.array([[0, 0, 0, 2, 2, 2, 0.0]], dtype=jnp.float32)
        b = jnp.array([[0, 0, 1, 2, 2, 2, 0.0]], dtype=jnp.float32)
        # overlap volume = 2*2*1=4, union = 8+8-4=12
        np.testing.assert_allclose(
            np.asarray(rotated_iou.boxes_iou3d(a, b)), 4 / 12, atol=1e-5
        )


class TestRotatedNMS:
    def test_suppresses_duplicates(self):
        boxes = jnp.array(
            [[0, 0, 4, 2, 0.0], [0.1, 0, 4, 2, 0.02], [20, 0, 4, 2, 0.0]],
            dtype=jnp.float32,
        )
        scores = jnp.array([0.9, 0.8, 0.7])
        keep, kmask = nms.rotated_nms(boxes, scores, 0.5, post_max_size=3)
        kept = set(np.asarray(keep)[np.asarray(kmask)].tolist())
        assert kept == {0, 2}

    def test_matches_numpy_greedy_oracle(self, rng):
        boxes = random_bev_boxes(rng, 64, spread=8.0)
        scores = rng.uniform(0.1, 1.0, 64).astype(np.float32)
        keep, kmask = nms.rotated_nms(
            jnp.asarray(boxes), jnp.asarray(scores), 0.3, post_max_size=64
        )
        got = np.asarray(keep)[np.asarray(kmask)].tolist()

        # numpy greedy oracle using the same IoU kernel
        iou_full = np.asarray(
            rotated_iou.boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes))
        )
        alive = np.ones(64, bool)
        exp = []
        s = scores.copy()
        while alive.any():
            i = int(np.argmax(np.where(alive, s, -np.inf)))
            exp.append(i)
            alive &= iou_full[i] <= 0.3
            alive[i] = False
        assert got == exp

    def test_pcdet_entry_prefilter(self, rng):
        boxes7 = np.zeros((32, 7), np.float32)
        boxes7[:, :2] = rng.uniform(-5, 5, (32, 2))
        boxes7[:, 3:6] = 2.0
        boxes7[:, 6] = rng.uniform(-1, 1, 32)
        scores = rng.uniform(size=32).astype(np.float32)
        keep, kmask = nms.rotate_nms_pcdet(
            jnp.asarray(boxes7), jnp.asarray(scores), 0.7,
            pre_max_size=16, post_max_size=8,
        )
        assert keep.shape == (8,)
        kept_scores = scores[np.asarray(keep)[np.asarray(kmask)]]
        # all kept boxes came from the top-16 prefilter
        thresh = np.sort(scores)[-16]
        assert (kept_scores >= thresh).all()

    def test_per_class_keeps_cross_class_overlaps(self):
        boxes = jnp.array([[0, 0, 4, 2, 0.0], [0, 0, 4, 2, 0.0]], dtype=jnp.float32)
        scores = jnp.array([0.9, 0.8])
        labels = jnp.array([0, 1])
        keep, kmask = nms.batched_rotated_nms(boxes, scores, labels, 0.5, 2)
        assert int(np.asarray(kmask).sum()) == 2


class TestSHIntersection:
    def test_matches_candidate_vertex_kernel(self, rng):
        import jax.numpy as jnp
        boxes = random_bev_boxes(rng, 40, spread=4.0)
        a, b = jnp.asarray(boxes[:20]), jnp.asarray(boxes[20:])
        ref = np.asarray(rotated_iou.rect_intersection_area(a, b))
        got = np.asarray(rotated_iou.rect_intersection_area_sh(a, b))
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)

    def test_identical_and_disjoint(self):
        import jax.numpy as jnp
        a = jnp.array([[0.0, 0.0, 4.0, 2.0, 0.3]])
        self_area = float(rotated_iou.rect_intersection_area_sh(a[0], a[0]))
        np.testing.assert_allclose(self_area, 8.0, rtol=1e-5)
        b = jnp.array([[50.0, 0.0, 4.0, 2.0, 1.0]])
        assert float(rotated_iou.rect_intersection_area_sh(a[0], b[0])) == 0.0

    def test_containment(self):
        import jax.numpy as jnp
        big = jnp.array([0.0, 0.0, 10.0, 10.0, 0.4])
        small = jnp.array([0.5, -0.5, 1.0, 2.0, -1.1])
        np.testing.assert_allclose(
            float(rotated_iou.rect_intersection_area_sh(small, big)), 2.0,
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            float(rotated_iou.rect_intersection_area_sh(big, small)), 2.0,
            rtol=1e-4,
        )


class TestGreenIntersection:
    """The Green's-theorem kernel used by the NMS hot path."""

    def test_matches_candidate_vertex_kernel(self, rng):
        import jax.numpy as jnp
        boxes = random_bev_boxes(rng, 40, spread=4.0)
        a, b = jnp.asarray(boxes[:20]), jnp.asarray(boxes[20:])
        ref = np.asarray(rotated_iou.rect_intersection_area(a, b))
        got = np.asarray(rotated_iou.rect_intersection_area_green(a, b))
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)

    def test_identical_rot90_touching(self):
        import jax.numpy as jnp
        a = jnp.array([[0.0, 0.0, 4.0, 2.0, 0.3]])
        np.testing.assert_allclose(
            float(rotated_iou.rect_intersection_area_green(a, a)[0]), 8.0,
            rtol=1e-5)
        sq1 = jnp.array([[1.0, 1.0, 3.0, 3.0, 0.0]])
        sq2 = jnp.array([[1.0, 1.0, 3.0, 3.0, np.pi / 2]])
        np.testing.assert_allclose(
            float(rotated_iou.rect_intersection_area_green(sq1, sq2)[0]), 9.0,
            rtol=1e-4)
        t1 = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        t2 = jnp.array([[2.0, 0.0, 2.0, 2.0, 0.0]])
        got = float(rotated_iou.rect_intersection_area_green(t1, t2)[0])
        assert abs(got) < 1e-3

    def test_containment(self):
        import jax.numpy as jnp
        big = jnp.array([0.0, 0.0, 10.0, 10.0, 0.4])
        small = jnp.array([0.5, -0.5, 1.0, 2.0, -1.1])
        for x, y in ((small, big), (big, small)):
            np.testing.assert_allclose(
                float(rotated_iou.rect_intersection_area_green(x, y)), 2.0,
                rtol=1e-4)
