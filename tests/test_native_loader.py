import numpy as np
import pytest

from mopa_tpu.data import native_loader as nl


@pytest.fixture(scope="module")
def native():
    if not nl.available():
        pytest.skip("native library not built")
    return True


def test_native_builds_and_reads_scan(native, tmp_path):
    scan = np.random.default_rng(0).normal(size=(100, 4)).astype(np.float32)
    p = tmp_path / "s.bin"
    scan.tofile(str(p))
    got = nl.read_scan(str(p))
    np.testing.assert_array_equal(got, scan)


def test_native_read_labels(native, tmp_path):
    lab = (np.arange(50, dtype=np.uint32) | (7 << 16)).astype(np.uint32)
    p = tmp_path / "l.label"
    lab.tofile(str(p))
    got = nl.read_labels(str(p))
    np.testing.assert_array_equal(got, np.arange(50))


def test_frustum_project_matches_numpy(native):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(500, 4)).astype(np.float32) * 10
    proj = np.array([[300, 0, 240, 0], [0, 300, 150, 0], [0, 0, 1, 0]],
                    np.float32) @ np.array(
        [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]], np.float32)
    rc_c, keep_c = nl.frustum_project(pts, proj, 480, 302)

    # numpy reference (same code path as the fallback)
    lib, nl._LIB = nl._LIB, None
    rc_np, keep_np = nl.frustum_project(pts, proj, 480, 302)
    nl._LIB = lib
    np.testing.assert_array_equal(keep_c, keep_np)
    np.testing.assert_allclose(rc_c[keep_c], rc_np[keep_np], rtol=1e-5)


def test_voxel_dedup_matches_numpy(native):
    rng = np.random.default_rng(2)
    coords = rng.integers(0, 8, size=(300, 3)).astype(np.int32)
    index, inverse = nl.voxel_dedup(coords)
    # inverse consistency: every point maps to a voxel with its own coords
    np.testing.assert_array_equal(coords[index][inverse], coords)
    uniq = np.unique(coords, axis=0)
    assert index.shape[0] == uniq.shape[0]


def test_augment_scale_matches_numpy(native):
    rng = np.random.default_rng(3)
    pts = rng.uniform(-40, 40, (1000, 3)).astype(np.float32)
    rot = np.eye(3, dtype=np.float32)
    transl = np.array([0.3, 0.6, 0.1], np.float32)
    c_c, k_c = nl.augment_scale(pts, rot, 20.0, 4096, transl)
    lib, nl._LIB = nl._LIB, None
    c_np, k_np = nl.augment_scale(pts, rot, 20.0, 4096, transl)
    nl._LIB = lib
    np.testing.assert_array_equal(k_c, k_np)
    np.testing.assert_array_equal(c_c, c_np)
