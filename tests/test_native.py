"""Native host-tier tests: C++ implementations agree with Python.

Builds native/libevomotion_host.so (g++) if absent; skips if no toolchain.
"""

import numpy as np
import pytest

from evomotion_tpu import native
from evomotion_tpu.serialize.codec import binary_string_to_float, float_to_binary_string
from evomotion_tpu.utils.mt19937 import MT19937

if not native.available() and not native.build():
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def test_codec_matches_python():
    rng = np.random.default_rng(0)
    for v in rng.normal(size=50).astype(np.float32):
        bits = native.float_to_bits(float(v))
        assert format(bits, "032b") == float_to_binary_string(float(v))
        back = native.bits_to_float(bits)
        assert np.float32(back).tobytes() == np.float32(v).tobytes()
    assert native.bits_to_float(int("01000001000000000000000000000000", 2)) == 8.0
    assert binary_string_to_float(format(native.float_to_bits(0.5), "032b")) == 0.5


def test_mt19937_matches_python():
    py = MT19937(1234)
    cpp = native.NativeMT19937(1234)
    for _ in range(100):
        assert py.next_u32() == cpp.next_u32()
    py2 = MT19937(42)
    cpp2 = native.NativeMT19937(42)
    for _ in range(50):
        assert abs(py2.uniform_float() - cpp2.uniform_float()) == 0.0
    # bulk fill continues the same stream
    fill = cpp2.uniform_fill(10)
    expect = np.array([py2.uniform_float() for _ in range(10)], dtype=np.float32)
    np.testing.assert_array_equal(fill, expect)


def test_parse_obj_matches_python():
    import os

    path = "/root/reference/evo_motion_model/resources/obj/cube.obj"
    if not os.path.exists(path):
        pytest.skip("reference obj not mounted")
    from evomotion_tpu.physics.shapes import parse_obj

    py_verts = parse_obj(path)[0]
    cpp_verts = native.parse_obj_vertices(path)
    np.testing.assert_allclose(np.sort(cpp_verts, 0), np.sort(py_verts, 0), atol=1e-6)


def test_reduce_hull_cube():
    # cube corners + interior points: hull = the 8 corners
    rng = np.random.default_rng(1)
    corners = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)], dtype=np.float32
    )
    interior = rng.uniform(-0.9, 0.9, size=(100, 3)).astype(np.float32)
    pts = np.concatenate([corners, interior])
    hull = native.reduce_hull(pts, max_verts=48)
    assert len(hull) == 8
    np.testing.assert_allclose(np.sort(np.abs(hull), 0), np.ones((8, 3)), atol=1e-6)


def test_reduce_hull_decimation_bounds():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)  # on unit sphere
    hull = native.reduce_hull(pts, max_verts=32)
    assert 4 <= len(hull) <= 32
    # all returned points are original sphere points
    assert np.allclose(np.linalg.norm(hull, axis=1), 1.0, atol=1e-5)


def test_greedy_color_matches_python_fallback():
    rng = np.random.default_rng(3)
    n = 40
    edges = rng.integers(0, n, size=(120, 2)).astype(np.int32)
    edges = edges[edges[:, 0] != edges[:, 1]]
    colors, n_colors = native.greedy_color(n, edges)
    # validity: no conflicting pair shares a color
    for a, b in edges:
        assert colors[a] != colors[b]
    assert n_colors == colors.max() + 1
