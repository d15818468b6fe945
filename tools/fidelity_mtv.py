"""Quantify the proxy-hull narrowphase fidelity gap (PARITY "known gaps").

The member narrowphase runs SAT on DECIMATED proxy hulls (ModelBuilder.
NP_VERTS extreme points + edge-subdivision test points, model.
member_edge_dirs edge directions) where Bullet runs GJK/EPA on the full
hulls (reference item.cpp:17-52). This tool measures what that costs, in
numbers, against configurations with an analytically known minimum
translation vector (MTV):

  box-face    — axis-aligned unit boxes overlapping depth d on a face:
                MTV = -y, depth = d (proxy is EXACT for boxes: 8 verts, 3
                edge dirs fit every budget — a sanity row)
  box-corner  — the top box tilted 45/35 deg so a corner penetrates the
                face: MTV = -y for small d
  box-edge    — two boxes rotated 45 deg about orthogonal horizontal axes
                so edges cross: MTV = -y via the edge-edge axis
  sphere      — two unit spheres overlapping depth d: MTV along the center
                line; the proxy DECIMATES the sphere hull, so this row
                carries the real budget sensitivity

Reported per (case, depth, budget): angle error of the deepest contact
normal vs analytic (deg) and depth error (= |-gap_raw - d|, m). Run:

  python tools/fidelity_mtv.py            # prints the table
"""

import dataclasses
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from evomotion_tpu.physics import engine as E
from evomotion_tpu.physics.model import ModelBuilder
from evomotion_tpu.physics.shapes import get_shape


def _cube():
    h = 0.5
    return np.array(
        [[sx * h, sy * h, sz * h] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )


def quat_axis(axis, ang):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate([axis * np.sin(ang / 2), [np.cos(ang / 2)]])


def quat_mul(a, b):
    x1, y1, z1, w1 = a
    x2, y2, z2, w2 = b
    return np.array([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ])


IDENT = np.array([0.0, 0.0, 0.0, 1.0])


def make_model(verts_a, verts_b, np_verts, edge_dirs):
    b = ModelBuilder()
    b.NP_VERTS = np_verts
    b.add_body("a", verts_a, (1, 1, 1), 1.0, (0, 0, 0), IDENT, margin=0.0)
    b.add_body("b", verts_b, (1, 1, 1), 1.0, (0, 2, 0), IDENT, margin=0.0)
    return dataclasses.replace(
        b.finalize(), solver="pallas", member_contacts=True,
        member_edge_dirs=edge_dirs,
    )


def measure(model, pos_b, quat_b, n_true, depth_true):
    pos = jnp.asarray(
        np.stack([np.zeros(3), pos_b]).astype(np.float32)
    )
    quat = jnp.asarray(np.stack([IDENT, quat_b]).astype(np.float32))
    pt, nrm, gap, vid = E._dyn_narrowphase(model, pos, quat)
    gap = np.asarray(gap[0])
    nrm = np.asarray(nrm[0])
    k = int(np.argmin(gap))
    # normal convention: from B toward A
    n = nrm[k] / max(np.linalg.norm(nrm[k]), 1e-12)
    cosang = float(np.clip(np.dot(n, n_true), -1.0, 1.0))
    ang_err = np.degrees(np.arccos(cosang))
    depth = -float(gap[k])  # margin=0 -> raw penetration
    return ang_err, abs(depth - depth_true), depth


def main():
    depths = [0.01, 0.05, 0.1, 0.2]
    budgets = [(12, 4), (26, 6), (42, 9)]  # (NP_VERTS, member_edge_dirs)
    cube = _cube()
    sphere = np.asarray(get_shape("sphere").hull_verts, float)

    def case_box_face(d):
        # B on top of A: B bottom at 0.5 - d
        return cube, cube, np.array([0.0, 1.0 - d, 0.0]), IDENT, \
            np.array([0.0, -1.0, 0.0]), d

    def case_box_corner(d):
        q = quat_mul(quat_axis([1, 0, 0], np.radians(35.26)),
                     quat_axis([0, 1, 0], np.radians(45.0)))
        # lowest rotated corner, computed (not assumed): rotation-order
        # sensitive
        x, y, z, w = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        r = -min((cube @ R.T)[:, 1])
        return cube, cube, np.array([0.0, 0.5 + r - d, 0.0]), q, \
            np.array([0.0, -1.0, 0.0]), d

    def case_box_edge(d):
        # A rotated 45 about z (top edge up), B rotated 45 about x
        # (bottom edge down), crossing edges -> MTV -y. Build A rotated so
        # body A's hull itself is rotated via its vert list.
        def rot(verts, axis, deg):
            q = quat_axis(axis, np.radians(deg))
            x, y, z, w = q
            R = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ])
            return verts @ R.T
        va = rot(cube, [0, 0, 1], 45.0)  # top edge along x at y=+0.7071
        vb = cube
        qb = quat_axis([0, 0, 1], np.radians(45.0))
        h = np.sqrt(2) / 2
        # B's bottom edge along z... use B rotated about x instead
        qb = quat_axis([1, 0, 0], np.radians(45.0))
        return va, vb, np.array([0.0, 2 * h - d, 0.0]), qb, \
            np.array([0.0, -1.0, 0.0]), d

    def case_sphere(d):
        # unit-radius spheres, centers 2 - d apart along a skewed direction
        u = np.array([0.6, 0.64, 0.48])
        u = u / np.linalg.norm(u)
        return sphere, sphere, (2.0 - d) * u, IDENT, -u, d

    cases = {
        "box-face": case_box_face,
        "box-corner": case_box_corner,
        "box-edge": case_box_edge,
        "sphere": case_sphere,
    }

    print(f"{'case':<11}{'depth':>6} | " + " | ".join(
        f"V={v:<2} E={e} ang(deg)/depth-err(m)" for v, e in budgets
    ))
    rows = {}
    for name, fn in cases.items():
        for d in depths:
            line = f"{name:<11}{d:>6.2f} | "
            cells = []
            for v, e in budgets:
                va, vb, pb, qb, n_true, dep = fn(d)
                model = make_model(va, vb, v, e)
                ang, derr, det = measure(model, pb, qb, n_true, dep)
                cells.append(f"{ang:7.2f} / {derr:8.4f}")
                rows[(name, d, v, e)] = (ang, derr)
            print(line + " | ".join(f"{c:>24}" for c in cells))
    # summary for PARITY.md
    worst12 = max(v[0] for k, v in rows.items() if k[2] == 12)
    worst42 = max(v[0] for k, v in rows.items() if k[2] == 42)
    wd12 = max(v[1] for k, v in rows.items() if k[2] == 12)
    wd42 = max(v[1] for k, v in rows.items() if k[2] == 42)
    print(f"\nworst normal error : {worst12:.2f} deg @ default budget (12,4); "
          f"{worst42:.2f} deg @ (42,9)")
    print(f"worst depth error  : {wd12:.4f} m @ default budget; {wd42:.4f} m @ (42,9)")


if __name__ == "__main__":
    main()
