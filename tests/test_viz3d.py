"""3D PLY scene export (utils/viz3d.py) + the demo CLI's --export_ply.

Replaces the reference's interactive open3d/mayavi viewer
(/root/reference/det3d/utils/viz_util.py) with a standard-file export;
the PLY is parsed back here to pin the geometry."""

import os
import pickle
import sys

import numpy as np
import pytest


def _parse_ply(path):
    with open(path) as f:
        lines = f.read().splitlines()
    nv = ne = None
    for i, ln in enumerate(lines):
        if ln.startswith("element vertex"):
            nv = int(ln.split()[-1])
        elif ln.startswith("element edge"):
            ne = int(ln.split()[-1])
        elif ln == "end_header":
            body = lines[i + 1:]
            break
    verts = np.array([[float(v) for v in ln.split()[:3]]
                      for ln in body[:nv]])
    cols = np.array([[int(v) for v in ln.split()[3:]]
                     for ln in body[:nv]])
    edges = np.array([[int(v) for v in ln.split()]
                      for ln in body[nv:nv + ne]]).reshape(-1, 2)
    return verts, cols, edges


class TestPlyScene:
    def test_roundtrip_counts_and_geometry(self, tmp_path):
        from partner_tpu.core.box_np_ops import center_to_corner_box3d
        from partner_tpu.utils.viz3d import write_ply_scene

        rng = np.random.RandomState(0)
        pts = rng.randn(50, 4).astype(np.float32)
        det = np.array([[1, 2, 0, 4.2, 1.8, 1.6, 0.3],
                        [-3, 5, 0.5, 2.0, 2.0, 2.0, -1.0]], np.float32)
        gt = np.array([[0, 0, 0, 4.0, 2.0, 1.5, 0.0]], np.float32)
        path = write_ply_scene(str(tmp_path / "s.ply"), pts, det, gt)
        verts, cols, edges = _parse_ply(path)

        assert len(verts) == 50 + 8 * 3
        assert len(edges) == 12 * 3
        # cloud vertices come first, then gt, then det corners
        np.testing.assert_allclose(verts[:50], pts[:, :3], atol=1e-3)
        want_gt = np.asarray(center_to_corner_box3d(
            gt[:, :3], gt[:, 3:6], gt[:, -1])).reshape(-1, 3)
        np.testing.assert_allclose(verts[50:58], want_gt, atol=1e-3)
        # colors: gt green block then det red blocks
        assert (cols[50:58] == [44, 160, 44]).all()
        assert (cols[58:] == [214, 39, 40]).all()
        # every edge stays inside its own box's 8 corners
        owner = (edges - 50) // 8
        assert (owner[:, 0] == owner[:, 1]).all()
        # edges don't reference cloud points
        assert (edges >= 50).all() and (edges < len(verts)).all()

    def test_no_boxes_and_no_intensity(self, tmp_path):
        from partner_tpu.utils.viz3d import write_ply_scene

        pts = np.zeros((5, 3), np.float32)
        path = write_ply_scene(str(tmp_path / "s.ply"), pts)
        verts, cols, edges = _parse_ply(path)
        assert len(verts) == 5 and len(edges) == 0
        assert (cols == 140).all()

    def test_open3d_gate_raises_without_package(self):
        from partner_tpu.utils.viz3d import to_open3d

        with pytest.raises(ImportError):
            to_open3d(np.zeros((3, 4)))


class TestDemoExportPly:
    def test_cli_writes_png_and_ply(self, tmp_path, monkeypatch):
        sys.path.insert(0, "/root/repo/tools")
        import demo

        rng = np.random.RandomState(0)
        dets = {"tokA": {
            "box3d_lidar": np.array(
                [[1, 2, 0, 4.2, 1.8, 1.6, 0.3]], np.float32),
            "scores": np.array([0.9], np.float32),
            "label_preds": np.array([0]),
        }}
        infos = [{"token": "tokA",
                  "points": rng.randn(100, 4).astype(np.float32),
                  "gt_boxes": np.array(
                      [[0, 0, 0, 4, 2, 1.5, 0, 0, 0.1]], np.float32)}]
        pred = tmp_path / "prediction.pkl"
        info = tmp_path / "infos.pkl"
        with open(pred, "wb") as f:
            pickle.dump(dets, f)
        with open(info, "wb") as f:
            pickle.dump(infos, f)
        out = tmp_path / "out"
        monkeypatch.setattr(sys, "argv", [
            "demo.py", "--prediction", str(pred), "--info_path", str(info),
            "--out_dir", str(out), "--export_ply"])
        demo.main()
        assert (out / "tokA.png").exists()
        verts, _, edges = _parse_ply(str(out / "tokA.ply"))
        assert len(verts) == 100 + 8 * 2 and len(edges) == 24
