"""Golden byte validation of the devkit-free Waymo objects.bin writer.

Compiles a twin of the waymo-open-dataset schema (metrics.Objects /
label.Label, transcribed from the public protos) with the system protoc
into a descriptor set, builds messages through google.protobuf's dynamic
message factory, and asserts the hand-rolled encoder
(partner_tpu/eval/waymo_proto.py) produces byte-identical output —
i.e. the bin the framework writes without ``waymo_open_dataset`` is the
bin the devkit would have written (VERDICT r4 next #8; reference writer:
det3d/datasets/waymo/waymo_common.py:52-115)."""

import os
import subprocess
import sys

import numpy as np
import pytest

PROTO = """
syntax = "proto2";
package waymo.open_dataset;

message Label {
  message Box {
    optional double center_x = 1;
    optional double center_y = 2;
    optional double center_z = 3;
    optional double length = 4;
    optional double width = 5;
    optional double height = 6;
    optional double heading = 7;
  }
  optional Box box = 1;
  enum Type {
    TYPE_UNKNOWN = 0;
    TYPE_VEHICLE = 1;
    TYPE_PEDESTRIAN = 2;
    TYPE_SIGN = 3;
    TYPE_CYCLIST = 4;
  }
  optional Type type = 3;
  optional string id = 4;
}

message Object {
  optional Label object = 1;
  optional float score = 2;
  optional bool overlap_with_nlz = 3;
  optional string context_name = 4;
  optional int64 frame_timestamp_micros = 5;
}

message Objects {
  repeated Object objects = 1;
}
"""


@pytest.fixture(scope="module")
def pb(tmp_path_factory):
    """(ObjectsCls, ObjectCls) built from the protoc descriptor set."""
    d = tmp_path_factory.mktemp("waymo_proto")
    src = d / "waymo_twin.proto"
    src.write_text(PROTO)
    ds = d / "ds.pb"
    r = subprocess.run(
        ["protoc", f"--proto_path={d}", f"--descriptor_set_out={ds}",
         str(src)],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"protoc unavailable/failed: {r.stderr[:200]}")
    from google.protobuf import descriptor_pb2, descriptor_pool, \
        message_factory

    fds = descriptor_pb2.FileDescriptorSet.FromString(ds.read_bytes())
    pool = descriptor_pool.DescriptorPool()
    for f in fds.file:
        pool.Add(f)
    objects_cls = message_factory.GetMessageClass(
        pool.FindMessageTypeByName("waymo.open_dataset.Objects"))
    object_cls = message_factory.GetMessageClass(
        pool.FindMessageTypeByName("waymo.open_dataset.Object"))
    return objects_cls, object_cls


def _protobuf_bytes(object_cls, objects_cls, rows):
    objects = objects_cls()
    for r in rows:
        o = object_cls()
        o.context_name = r["context"]
        o.frame_timestamp_micros = r["ts"]
        b = o.object.box
        (b.center_x, b.center_y, b.center_z, b.length, b.width, b.height,
         b.heading) = r["box"]
        o.object.type = r["type"]
        if r.get("id") is not None:
            o.object.id = r["id"]
        o.score = r["score"]
        objects.objects.append(o)
    return objects.SerializeToString()


def _ours_bytes(rows):
    from partner_tpu.eval import waymo_proto as wp

    out = []
    for r in rows:
        label = wp.encode_label(wp.encode_box(*r["box"]), r["type"],
                                r.get("id"))
        out.append(wp.encode_object(label, r["score"], r["context"],
                                    r["ts"]))
    return wp.encode_objects(out)


def _rows(rng, n=7, with_id=False):
    rows = []
    for i in range(n):
        rows.append({
            "context": f"segment-{rng.randint(1e6)}_with_camera_labels",
            "ts": int(rng.randint(1, 2 ** 62)),
            "box": rng.randn(7).astype(np.float64) * 10,
            "type": int(rng.choice([1, 2, 4])),
            "score": float(rng.rand()),
            "id": (f"{rng.randint(1e9):032x}" if with_id else None),
        })
    return rows


class TestHandEncoderGolden:
    def test_bytes_match_protobuf(self, pb, rng):
        objects_cls, object_cls = pb
        rows = _rows(rng)
        assert _ours_bytes(rows) == _protobuf_bytes(object_cls, objects_cls,
                                                    rows)

    def test_bytes_match_protobuf_with_tracking_ids(self, pb, rng):
        objects_cls, object_cls = pb
        rows = _rows(rng, with_id=True)
        assert _ours_bytes(rows) == _protobuf_bytes(object_cls, objects_cls,
                                                    rows)

    def test_zero_and_negative_values(self, pb, rng):
        """proto2 presence: explicitly-set zeros serialize; negative
        heading exercises the two's-complement varint (int64) and double
        paths."""
        objects_cls, object_cls = pb
        rows = [{
            "context": "", "ts": 0,
            "box": np.array([0.0, -1.5, 0.0, 4.2, -0.0, 1.6, -2.75]),
            "type": 1, "score": 0.0, "id": None,
        }]
        assert _ours_bytes(rows) == _protobuf_bytes(object_cls, objects_cls,
                                                    rows)


class TestCreatePdDetection:
    def test_writer_end_to_end_and_coordinate_transform(self, pb, rng,
                                                        tmp_path):
        """create_pd_detection without the devkit: real proto bytes, the
        det3d->Waymo dim swap and heading = -yaw - pi/2
        (waymo_common.py:68-72) applied."""
        from partner_tpu.eval.waymo import create_pd_detection

        objects_cls, _ = pb
        boxes = np.array([[1.0, 2.0, 0.5, 4.0, 1.8, 1.5, 0.3],
                          [-3.0, 7.0, 0.0, 0.8, 0.7, 1.7, -1.2]],
                         np.float32)
        detections = {"tok0": {
            "box3d_lidar": boxes,
            "scores": np.array([0.9, 0.4], np.float32),
            "label_preds": np.array([0, 1]),
        }}
        infos = [{"token": "tok0",
                  "anno": {"scene_name": "segment-123", "frame_id": 777}}]
        out = create_pd_detection(detections, infos, str(tmp_path))
        assert os.path.basename(out) == "detection_pred.bin"

        parsed = objects_cls.FromString(open(out, "rb").read())
        assert len(parsed.objects) == 2
        o = parsed.objects[0]
        assert o.context_name == "segment-123"
        assert o.frame_timestamp_micros == 777
        b = o.object.box
        # dims swapped: length <- dy, width <- dx
        assert b.length == pytest.approx(1.8, abs=1e-6)
        assert b.width == pytest.approx(4.0, abs=1e-6)
        assert b.heading == pytest.approx(-0.3 - np.pi / 2, abs=1e-6)
        assert o.object.type == 1  # Vehicle
        assert parsed.objects[1].object.type == 2  # Pedestrian
        assert parsed.objects[1].score == pytest.approx(0.4, abs=1e-6)

    def test_tracking_ids_written(self, pb, rng, tmp_path):
        from partner_tpu.eval.waymo import create_pd_detection

        objects_cls, _ = pb
        detections = {"tok0": {
            "box3d_lidar": np.zeros((3, 7), np.float32),
            "scores": np.array([0.9, 0.8, 0.7], np.float32),
            "label_preds": np.array([0, 0, 0]),
            "tracking_ids": np.array([5, 9, 5]),
        }}
        infos = [{"token": "tok0", "anno": {"scene_name": "s",
                                            "frame_id": 1}}]
        out = create_pd_detection(detections, infos, str(tmp_path),
                                  tracking=True)
        assert os.path.basename(out) == "tracking_pred.bin"
        parsed = objects_cls.FromString(open(out, "rb").read())
        ids = [o.object.id for o in parsed.objects]
        assert len(ids[0]) == 32  # uuid4 hex
        assert ids[0] == ids[2] != ids[1]  # stable per tracking id
