"""GT-mesh depth renderer (reference utils/evaluation.py:7-68)."""
import os

import numpy as np

from nerf_slam_tpu.utils.evaluation import MeshRenderer, load_mesh


def _two_tri_quad(z=2.0, half=1.0):
    """A quad in the z=const plane facing the origin camera."""
    verts = np.array([[-half, -half, z], [half, -half, z],
                      [half, half, z], [-half, half, z]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


def test_render_quad_depth():
    verts, faces = _two_tri_quad(z=2.0)
    W, H = 32, 24
    intr = (20.0, 20.0, W / 2, H / 2)
    r = MeshRenderer((verts, faces), intr, (W, H), tri_chunk=8,
                     px_chunk=256)
    depth = r.render_mesh(np.eye(4))
    assert depth.shape == (H, W)
    # center pixel hits the plane at z-depth 2
    np.testing.assert_allclose(depth[H // 2, W // 2], 2.0, atol=1e-3)
    # corner rays miss the quad (half-extent 1 at z 2 -> tan <= 0.5;
    # corner ray tan ~ (16/20, 12/20))
    assert depth[0, 0] == 0.0
    # camera translated by +1 in z: depth shrinks to 1
    c2w = np.eye(4)
    c2w[2, 3] = 1.0
    d2 = r.render_mesh(c2w)
    np.testing.assert_allclose(d2[H // 2, W // 2], 1.0, atol=1e-3)


def test_nearest_surface_wins():
    v1, f1 = _two_tri_quad(z=2.0)
    v2, f2 = _two_tri_quad(z=1.0, half=0.1)     # small near occluder
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + 4])
    r = MeshRenderer((verts, faces), (20.0, 20.0, 16.0, 12.0), (32, 24),
                     tri_chunk=4, px_chunk=256)
    depth = r.render_mesh(np.eye(4))
    np.testing.assert_allclose(depth[12, 16], 1.0, atol=1e-3)


def test_load_obj_and_ply(tmp_path):
    verts, faces = _two_tri_quad()
    obj = tmp_path / "m.obj"
    with open(obj, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for tri in faces:
            f.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")
    lv, lf = load_mesh(str(obj))
    np.testing.assert_allclose(lv, verts)
    np.testing.assert_array_equal(lf, faces)

    ply = tmp_path / "m.ply"
    with open(ply, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(verts)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                f"element face {len(faces)}\n"
                "property list uchar int vertex_indices\n"
                "end_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for tri in faces:
            f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")
    lv, lf = load_mesh(str(ply))
    np.testing.assert_allclose(lv, verts)
    np.testing.assert_array_equal(lf, faces)

    # binary little-endian with quad faces (fan-triangulated)
    plyb = tmp_path / "b.ply"
    with open(plyb, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n"
                b"element vertex 4\n"
                b"property float x\nproperty float y\nproperty float z\n"
                b"element face 1\n"
                b"property list uchar int vertex_indices\n"
                b"end_header\n")
        f.write(verts.astype("<f4").tobytes())
        f.write(np.uint8(4).tobytes())
        f.write(np.array([0, 1, 2, 3], "<i4").tobytes())
    lv, lf = load_mesh(str(plyb))
    np.testing.assert_allclose(lv, verts)
    np.testing.assert_array_equal(lf, np.array([[0, 1, 2], [0, 2, 3]]))
