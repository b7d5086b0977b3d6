"""ctypes bindings for the native C++ data-loader core.

Loads ``native/libmopa_loader.so`` (built by ``tools/build_native.sh``; see
``native/mopa_loader.cpp``) and exposes the host hot-path ops: raw scan IO,
frustum projection, augment+scale and voxel dedup. Every function has a
numpy fallback so the framework runs without the native build.
"""

from __future__ import annotations

import ctypes
import os.path as osp
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
                  "native", "libmopa_loader.so")
    if not osp.exists(so):
        # one-shot lazy build; stays None on failure (fallback path)
        script = osp.join(osp.dirname(osp.dirname(so)), "tools",
                          "build_native.sh")
        try:
            subprocess.run(["bash", script], check=True, capture_output=True,
                           timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.mopa_read_scan.restype = ctypes.c_int
    lib.mopa_read_labels.restype = ctypes.c_int
    lib.mopa_voxel_dedup.restype = ctypes.c_int
    lib.mopa_augment_scale.restype = ctypes.c_int
    if not hasattr(lib, "mopa_build_plan3"):  # stale .so — rebuild once
        script = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                          "..", "tools", "build_native.sh")
        try:
            subprocess.run(["bash", script], check=True, capture_output=True,
                           timeout=120)
            lib = ctypes.CDLL(so)
        except Exception:
            return None
        if not hasattr(lib, "mopa_build_plan3"):
            return None
        lib.mopa_read_scan.restype = ctypes.c_int
        lib.mopa_read_labels.restype = ctypes.c_int
        lib.mopa_voxel_dedup.restype = ctypes.c_int
        lib.mopa_augment_scale.restype = ctypes.c_int
    lib.mopa_build_plan3.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def read_scan(path: str, capacity: int = 200000) -> np.ndarray:
    """(N, 4) float32 xyzi."""
    lib = _lib()
    if lib is None:
        return np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    buf = np.empty((capacity, 4), np.float32)
    n = lib.mopa_read_scan(path.encode(), _ptr(buf, ctypes.c_float), capacity)
    if n < 0:
        raise IOError("cannot read scan " + path)
    return buf[:n]


def read_labels(path: str, capacity: int = 200000) -> np.ndarray:
    """(N,) int32 semantic ids (lower 16 bits)."""
    lib = _lib()
    if lib is None:
        lab = np.fromfile(path, dtype=np.uint32)
        return (lab & 0xFFFF).astype(np.int32)
    buf = np.empty(capacity, np.int32)
    n = lib.mopa_read_labels(path.encode(), _ptr(buf, ctypes.c_int32), capacity)
    if n < 0:
        raise IOError("cannot read labels " + path)
    return buf[:n]


def frustum_project(points_xyzi: np.ndarray, proj_3x4: np.ndarray,
                    img_w: int, img_h: int):
    """((N, 2) float32 (row, col), (N,) bool keep)."""
    lib = _lib()
    pts = np.ascontiguousarray(points_xyzi, np.float32)
    n = pts.shape[0]
    if lib is None:
        hom = np.concatenate([pts[:, :3], np.ones((n, 1), np.float32)], 1)
        uvw = hom @ np.asarray(proj_3x4, np.float32).T
        w = uvw[:, 2]
        uv = uvw[:, :2] / np.where(np.abs(w[:, None]) > 1e-9, w[:, None], 1e-9)
        rc = np.stack([uv[:, 1], uv[:, 0]], 1).astype(np.float32)
        keep = ((pts[:, 0] > 0) & (w > 0) & (uv[:, 0] > 0) & (uv[:, 0] < img_w)
                & (uv[:, 1] > 0) & (uv[:, 1] < img_h))
        return rc, keep
    rc = np.empty((n, 2), np.float32)
    keep = np.empty(n, np.uint8)
    proj = np.ascontiguousarray(proj_3x4, np.float32)
    lib.mopa_frustum_project(_ptr(pts, ctypes.c_float), n,
                             _ptr(proj, ctypes.c_float), img_w, img_h,
                             _ptr(rc, ctypes.c_float), _ptr(keep, ctypes.c_uint8))
    return rc, keep.astype(bool)


def augment_scale(points_xyz: np.ndarray, rot_3x3, scale: float,
                  full_scale: int, transl_3):
    """((N, 3) int32 coords, (N,) bool in-receptive-field)."""
    lib = _lib()
    pts = np.ascontiguousarray(points_xyz, np.float32)
    n = pts.shape[0]
    rot = np.ascontiguousarray(rot_3x3, np.float32)
    transl = np.ascontiguousarray(transl_3, np.float32)
    if lib is None:
        c = np.rint(pts @ rot * scale)
        mn, mx = c.min(0), c.max(0)
        off = -mn + np.clip(full_scale - (mx - mn) - 0.001, 0, None) * transl
        c = (c + off).astype(np.int32)
        keep = (c.min(1) >= 0) & (c.max(1) < full_scale)
        return c, keep
    coords = np.empty((n, 3), np.int32)
    keep = np.empty(n, np.uint8)
    lib.mopa_augment_scale(_ptr(pts, ctypes.c_float), n,
                           _ptr(rot, ctypes.c_float), ctypes.c_float(scale),
                           full_scale, _ptr(transl, ctypes.c_float),
                           _ptr(coords, ctypes.c_int32),
                           _ptr(keep, ctypes.c_uint8))
    return coords, keep.astype(bool)


def voxel_dedup(coords: np.ndarray, capacity: int | None = None):
    """torchsparse sparse_quantize semantics: (index (U,), inverse (N,))."""
    lib = _lib()
    c = np.ascontiguousarray(coords, np.int32)
    n = c.shape[0]
    capacity = capacity or n
    if lib is None:
        _, index, inverse = np.unique(c, axis=0, return_index=True,
                                      return_inverse=True)
        return index.astype(np.int32), inverse.astype(np.int32)
    index = np.empty(capacity, np.int32)
    inverse = np.empty(n, np.int32)
    u = lib.mopa_voxel_dedup(_ptr(c, ctypes.c_int32), n,
                             _ptr(index, ctypes.c_int32),
                             _ptr(inverse, ctypes.c_int32), capacity)
    return index[:u], inverse


# nibble deltas saturate at 15 -> fixup entry; measured ~6k (unrotated) to ~10k (augmented) >14-deltas per
# 16k-point LiDAR-geometry sample, so 16384 leaves headroom (overflow
# returns None and the caller falls back to device-side plan builds)
FIXUP_BUDGET = 16384


def build_plan_arrays(coords: np.ndarray, valid: np.ndarray,
                      capacities) -> dict | None:
    """Full per-sample UNet voxel plan on the host (C++), or None when the
    native library is unavailable (callers fall back to device builds).

    Returns the DELTA-COMPRESSED wire arrays (format v3, see
    ``native/mopa_loader.cpp::mopa_build_plan3``) that
    ``scn_unet.plan_from_host_arrays`` decodes in-graph into plans
    bit-identical to ``scn_unet.build_unet_plan_batched``'s:
    ``rankn (ceil(sum1*8/2),) u8`` — nibble-packed rank deltas of the 8
    NON-CENTER columns (the center column is rank = slot - e0, recomputed
    on device from the existence bits);
    ``ebits (sum1*3,) u8`` (24 non-center existence bits/voxel) +
    ``cbits (sum_l ceil(cap_l/8),) u8`` (the center column's dz=-1 bit;
    its dz=0 bit is slot < nums and its dz=+1 bit is the next row's dz=-1);
    ``downn (sum8/2,) u8`` nibbles + ``downe (sum_{l>=1} cap_l,) u8``;
    ``f2c (sumf,) i16`` (absolute — fine->coarse slots are not monotone);
    ``upoffn (ceil(sumf/2),) u8`` nibble-packed octants;
    ``fix (F,) i32`` nibble-saturation fixups, packed (pos << 11) | excess
    with excesses > 2047 split across same-pos entries (scatter-add sums);
    ``inverse (P,) i32``, ``counts (cap0,) i32``, ``nums (L,) i32``.
    """
    lib = _lib()
    if lib is None:
        return None
    caps = np.asarray(capacities, np.int32)
    nl = len(caps)
    coords = np.ascontiguousarray(coords, np.int32)
    valid_u8 = np.ascontiguousarray(valid, np.uint8)
    n = coords.shape[0]
    sum1 = int(caps.sum())
    sum8 = int(caps[1:].sum()) * 8
    sumf = int(caps[:-1].sum())
    sumc = int(sum((int(c) + 7) // 8 for c in caps))
    inverse = np.empty(n, np.int32)
    counts = np.empty(int(caps[0]), np.int32)
    rankn = np.empty((sum1 * 8 + 1) // 2, np.uint8)
    ebits = np.empty(sum1 * 3, np.uint8)
    cbits = np.empty(sumc, np.uint8)
    downn = np.empty(max((sum8 + 1) // 2, 1), np.uint8)
    downe = np.empty(max(int(caps[1:].sum()), 1), np.uint8)
    f2c = np.empty(max(sumf, 1), np.int16)
    upoffn = np.empty(max((sumf + 1) // 2, 1), np.uint8)
    fix = np.empty(FIXUP_BUDGET, np.int32)
    nums = np.empty(nl, np.int32)
    rc = lib.mopa_build_plan3(
        _ptr(coords, ctypes.c_int32), _ptr(valid_u8, ctypes.c_uint8),
        ctypes.c_int(n), ctypes.c_int(nl), _ptr(caps, ctypes.c_int32),
        _ptr(inverse, ctypes.c_int32), _ptr(counts, ctypes.c_int32),
        _ptr(rankn, ctypes.c_uint8), _ptr(ebits, ctypes.c_uint8),
        _ptr(cbits, ctypes.c_uint8),
        _ptr(downn, ctypes.c_uint8), _ptr(downe, ctypes.c_uint8),
        _ptr(f2c, ctypes.c_int16), _ptr(upoffn, ctypes.c_uint8),
        _ptr(fix, ctypes.c_int32), ctypes.c_int(FIXUP_BUDGET),
        _ptr(nums, ctypes.c_int32))
    if rc != 0:
        return None
    return {"inverse": inverse, "counts": counts, "nums": nums,
            "rankn": rankn, "ebits": ebits, "cbits": cbits,
            "downn": downn[:(sum8 + 1) // 2],
            "downe": downe[:int(caps[1:].sum())],
            "f2c": f2c[:sumf], "upoffn": upoffn[:(sumf + 1) // 2],
            "fix": fix}
