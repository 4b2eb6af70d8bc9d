"""Native (C++) host-pipeline kernels, loaded via ctypes.

The reference keeps its CPU hot loops in numba JIT kernels
(/root/reference/det3d/ops/point_cloud/point_cloud_ops.py:8-74,
/root/reference/det3d/core/sampler/preprocess.py:855-938); this package is
the rebuild's native runtime for the same role: the hard voxelizer, GT-AUG
box-collision, and points-in-box kernels that bound DataLoader-worker
throughput (SURVEY §3.1 "hot loops").

Build model: `src/partner_native.cpp` is compiled on first use with g++
(-O3, position independent) into a shared library cached next to the source,
keyed by a hash of the source text, so rebuilds happen only when the source
changes. If no toolchain is available the callers fall back to the
vectorized-numpy implementations (ops/voxelize.py, data/augment.py,
core/box_np_ops.py), which are also the parity oracles for the tests.

Public API (all numpy in/out):
  available() -> bool
  points_to_voxel(points, voxel_size, pc_range, max_points, max_voxels)
  box_collision_test(corners_a, corners_b) -> bool (N, K)
  points_in_rbbox(points, boxes) -> bool (P, N)
"""

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "src",
                    "partner_native.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_and_load():
    with open(_SRC, "r") as f:
        src_text = f.read()
    tag = hashlib.sha256(src_text.encode()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "PARTNER_NATIVE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".build"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"partner_native_{tag}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               "-o", tmp, _SRC]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)  # atomic for concurrent workers
    lib = ctypes.CDLL(so_path)

    lib.ptn_points_to_voxel.restype = ctypes.c_int
    lib.ptn_points_to_voxel.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.ptn_box_collision.restype = None
    lib.ptn_box_collision.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
    ]
    lib.ptn_points_in_rbbox.restype = None
    lib.ptn_points_in_rbbox.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
    ]
    return lib


def _lib():
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        with _LOCK:
            if _LIB is None and not _TRIED:
                _TRIED = True
                if os.environ.get("PARTNER_DISABLE_NATIVE"):
                    return None
                try:
                    _LIB = _build_and_load()
                except (OSError, subprocess.CalledProcessError):
                    _LIB = None
    return _LIB


def available() -> bool:
    return _lib() is not None


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def points_to_voxel(points, voxel_size, pc_range, max_points, max_voxels):
    """FCFS hard voxelization (native). Same contract as
    ops/voxelize.py:points_to_voxel: returns (voxels, coords, num_points)
    trimmed to the emitted voxel count."""
    lib = _lib()
    assert lib is not None, "native library unavailable"
    points = np.ascontiguousarray(points, dtype=np.float32)
    voxel_size = np.ascontiguousarray(voxel_size, dtype=np.float32)
    pc_range = np.ascontiguousarray(pc_range, dtype=np.float32)
    n, c = points.shape
    voxels = np.zeros((max_voxels, max_points, c), dtype=np.float32)
    coords = np.zeros((max_voxels, 3), dtype=np.int32)
    num_points = np.zeros((max_voxels,), dtype=np.int32)
    n_vox = lib.ptn_points_to_voxel(
        _ptr(points), n, c, _ptr(voxel_size), _ptr(pc_range),
        int(max_points), int(max_voxels),
        _ptr(voxels), _ptr(coords), _ptr(num_points),
    )
    return voxels[:n_vox], coords[:n_vox], num_points[:n_vox]


def box_collision_test(corners_a, corners_b):
    """SAT rectangle-overlap matrix (native), bool (N, K)."""
    lib = _lib()
    assert lib is not None, "native library unavailable"
    a = np.ascontiguousarray(corners_a, dtype=np.float32)
    b = np.ascontiguousarray(corners_b, dtype=np.float32)
    n, k = len(a), len(b)
    out = np.zeros((n, k), dtype=np.uint8)
    if n and k:
        lib.ptn_box_collision(_ptr(a), n, _ptr(b), k, _ptr(out))
    return out.astype(bool)


def points_in_rbbox(points, boxes):
    """Rotated-3D-box membership (native), bool (P, N). Yaw is read from the
    last box column (works for 7- and 9-dim boxes), like
    core/box_np_ops.py:points_in_rbbox."""
    lib = _lib()
    assert lib is not None, "native library unavailable"
    p = np.ascontiguousarray(points, dtype=np.float32)
    b = np.ascontiguousarray(boxes, dtype=np.float32)
    n, k = len(p), len(b)
    out = np.zeros((n, k), dtype=np.uint8)
    if n and k:
        lib.ptn_points_in_rbbox(_ptr(p), n, p.shape[1], _ptr(b), k,
                                b.shape[1], _ptr(out))
    return out.astype(bool)
