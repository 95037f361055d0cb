"""Native C++ component tests (skipped when no toolchain can build the lib)."""

import numpy as np
import pytest

from rvpt_tpu.native import bvh_native, get_lib, obj_native
from rvpt_tpu.scene import bvh as B
from rvpt_tpu.scene import obj_io

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable (no toolchain?)"
)


def random_prims(n, seed=0):
    r = np.random.default_rng(seed)
    v0 = r.uniform(-3, 3, (n, 3)).astype(np.float32)
    v1 = v0 + r.uniform(-1, 1, (n, 3)).astype(np.float32)
    v2 = v0 + r.uniform(-1, 1, (n, 3)).astype(np.float32)
    return B.triangle_bounds(v0, v1, v2)


@pytest.mark.parametrize("n", [1, 2, 17, 400])
def test_native_bvh_valid(n):
    centers, bmin, bmax = random_prims(n, seed=n)
    host = bvh_native.build(centers, bmin, bmax)
    assert host is not None
    B.validate(host, bmin, bmax)
    assert len(host.first) <= max(2 * n - 1, 1)


def test_native_bvh_matches_python_tree():
    """Same inputs -> structurally identical tree to the NumPy builder (both
    implement the identical algorithm with f64 binning)."""
    centers, bmin, bmax = random_prims(300, seed=9)
    py = B.build_bvh(centers, bmin, bmax)
    cc = bvh_native.build(centers, bmin, bmax)
    assert np.array_equal(py.first, cc.first)
    assert np.array_equal(py.count, cc.count)
    assert np.array_equal(py.prim_indices, cc.prim_indices)
    assert np.allclose(py.bmin, cc.bmin, atol=1e-6)
    assert np.allclose(py.bmax, cc.bmax, atol=1e-6)


def test_native_obj_matches_python(tmp_path):
    v, f = obj_io.make_icosphere(subdiv=2)
    p = str(tmp_path / "ico.obj")
    obj_io.save_obj(p, v, f)
    out = obj_native.parse_obj_file(p)
    assert out is not None
    vn, fn = out
    assert np.allclose(vn, v, atol=1e-5)
    assert np.array_equal(fn, f)


def test_native_obj_quads_and_negatives(tmp_path):
    p = str(tmp_path / "q.obj")
    with open(p, "w") as fh:
        fh.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1/1/1 2/2/2 3/3/3 4/4/4\nf -4 -3 -2\n")
    vn, fn = obj_native.parse_obj_file(p)
    v2, f2 = obj_io.parse_obj(open(p).read())
    assert np.allclose(vn, v2)
    assert np.array_equal(fn, f2)


def test_native_obj_missing_file():
    assert obj_native.parse_obj_file("/nonexistent/x.obj") is None
