"""GDML import tests: primitive tessellation + volume tree walk."""
import os
import tempfile

import numpy as np
import pytest

from chroma_tpu.gdml import GDMLLoader
from chroma_tpu.gdml import mesh_gen

GDML = '''<?xml version="1.0"?>
<gdml>
  <define>
    <position name="pmt_pos" unit="mm" x="0" y="0" z="400"/>
    <rotation name="pmt_rot" unit="deg" x="0" y="0" z="45"/>
  </define>
  <materials/>
  <solids>
    <box name="world_box" lunit="mm" x="5000" y="5000" z="5000"/>
    <tube name="tank" lunit="mm" rmin="0" rmax="1000" z="2000"
          deltaphi="6.283185307179586"/>
    <orb name="pmt_ball" lunit="mm" r="100"/>
  </solids>
  <structure>
    <volume name="pmt_log">
      <materialref ref="glass"/>
      <solidref ref="pmt_ball"/>
    </volume>
    <volume name="tank_log">
      <materialref ref="water"/>
      <solidref ref="tank"/>
      <physvol>
        <volumeref ref="pmt_log"/>
        <positionref ref="pmt_pos"/>
        <rotationref ref="pmt_rot"/>
      </physvol>
    </volume>
    <volume name="world_log">
      <materialref ref="air"/>
      <solidref ref="world_box"/>
      <physvol>
        <volumeref ref="tank_log"/>
        <position name="tank_pos" unit="mm" x="0" y="0" z="0"/>
      </physvol>
    </volume>
  </structure>
  <setup name="Default" version="1.0">
    <world ref="world_log"/>
  </setup>
</gdml>
'''


def _write_gdml():
    f = tempfile.NamedTemporaryFile('w', suffix='.gdml', delete=False)
    f.write(GDML)
    f.close()
    return f.name


def test_primitive_meshes_are_closed():
    for mesh in (mesh_gen.tube(0, 10, 20),
                 mesh_gen.tube(5, 10, 20),
                 mesh_gen.sphere(0, 10),
                 mesh_gen.sphere(5, 10),
                 mesh_gen.polycone(0, 2 * np.pi,
                                   [(0, 5, -10), (0, 8, 0), (0, 3, 10)]),
                 mesh_gen.torus(0, 2, 10),
                 mesh_gen.eltube(3, 5, 10),
                 mesh_gen.trd(5, 3, 4, 2, 6)):
        assert len(mesh.triangles) > 0
        # closed surface: every edge shared by exactly two triangles
        tris = np.sort(
            np.stack([mesh.triangles[:, [0, 1]], mesh.triangles[:, [1, 2]],
                      mesh.triangles[:, [2, 0]]]).reshape(-1, 2), axis=1)
        _, counts = np.unique(tris, axis=0, return_counts=True)
        assert (counts == 2).all(), type(mesh)


def test_tube_dimensions():
    mesh = mesh_gen.tube(0, 1000, 2000)
    lo, hi = mesh.get_bounds()
    np.testing.assert_allclose(hi[2] - lo[2], 2000, rtol=1e-6)
    assert abs(hi[0] - 1000) < 1e-3


def test_gdml_loader_builds_detector():
    path = _write_gdml()
    try:
        loader = GDMLLoader(path)
        assert loader.world.name == 'world_log'

        def classifier(volume_ref, material_ref, parent_material_ref):
            from chroma_tpu.demo.optics import vacuum, water
            if volume_ref == 'pmt_log':
                return 'pmt', dict(material1=vacuum, material2=water,
                                   surface=None, channel_type=0)
            if volume_ref == 'world_log':
                return 'omit', dict()
            return 'solid', dict(material1=water, material2=vacuum,
                                 surface=None)

        det = loader.build_detector(volume_classifier=classifier)
        det.flatten()
        assert det.num_channels() == 1
        assert len(det.mesh.triangles) > 100
        # the PMT was displaced to z=400 and sits inside the tank
        pmt_tris = det.solid_id == det.channel_index_to_solid_id[0]
        pmt_verts = det.mesh.vertices[
            np.unique(det.mesh.triangles[pmt_tris])]
        center = pmt_verts.mean(axis=0)
        np.testing.assert_allclose(center, [0, 0, 400], atol=1.0)
    finally:
        os.unlink(path)


def _closed(mesh):
    tris = np.sort(
        np.stack([mesh.triangles[:, [0, 1]], mesh.triangles[:, [1, 2]],
                  mesh.triangles[:, [2, 0]]]).reshape(-1, 2), axis=1)
    _, counts = np.unique(tris, axis=0, return_counts=True)
    return (counts == 2).all()


def test_csg_boolean_volumes():
    """BSP mesh booleans against analytic volumes of overlapping boxes
    (reference meshes these through OpenCASCADE: gdml/gen_mesh.py:39-70)."""
    from chroma_tpu.csg import (mesh_union, mesh_subtract, mesh_intersect,
                                mesh_volume)
    from chroma_tpu.geometry import Mesh
    a = mesh_gen.box(20.0, 20.0, 20.0)              # [-10, 10]^3
    b_raw = mesh_gen.box(20.0, 20.0, 20.0)
    b = Mesh(b_raw.vertices + np.array([10.0, 0, 0], dtype=np.float32),
             b_raw.triangles)                        # [0, 20] x [-10,10]^2

    v_a = 8000.0
    v_overlap = 4000.0
    union = mesh_union(a, b)
    assert abs(mesh_volume(union) - (2 * v_a - v_overlap)) < 1.0
    diff = mesh_subtract(a, b)
    assert abs(mesh_volume(diff) - (v_a - v_overlap)) < 1.0
    inter = mesh_intersect(a, b)
    assert abs(mesh_volume(inter) - v_overlap) < 1.0
    # NB: BSP output contains T-vertices, so the strict shared-edge test
    # does not apply; the exact signed volumes above prove the surfaces
    # are geometrically closed and consistently wound.


@pytest.mark.slow
def test_csg_sphere_subtract():
    "Curved-surface boolean: box minus centered ball."
    from chroma_tpu.csg import mesh_subtract, mesh_volume
    a = mesh_gen.box(40.0, 40.0, 40.0)
    ball = mesh_gen.orb(10.0, nsteps=32)
    v_ball = mesh_volume(ball)              # tessellated ball volume
    out = mesh_subtract(a, ball)
    assert abs(mesh_volume(out) - (64000.0 - v_ball)) < 10.0


BOOL_GDML = GDML.replace(
    '<orb name="pmt_ball" lunit="mm" r="100"/>',
    '''<orb name="pmt_ball" lunit="mm" r="100"/>
    <box name="slab" lunit="mm" x="300" y="300" z="100"/>
    <subtraction name="holey_slab">
      <first ref="slab"/>
      <second ref="drill"/>
      <position name="drill_pos" unit="mm" x="0" y="0" z="0"/>
    </subtraction>
    <tube name="drill" lunit="mm" rmin="0" rmax="50" z="120"
          deltaphi="6.283185307179586"/>''').replace(
    '<solidref ref="tank"/>',
    '<solidref ref="holey_slab"/>')


def test_gdml_boolean_solid():
    "A subtraction solid loads, meshes, and has the drilled volume."
    from chroma_tpu.csg import mesh_volume
    f = tempfile.NamedTemporaryFile('w', suffix='.gdml', delete=False)
    f.write(BOOL_GDML)
    f.close()
    try:
        loader = GDMLLoader(f.name)
        mesh = loader.get_mesh('holey_slab')
        expect = 300.0 * 300 * 100 - np.pi * 50 ** 2 * 100
        vol = mesh_volume(mesh)
        # the tessellated drill (32-gon) removes slightly less than a
        # true cylinder
        assert abs(vol - expect) / expect < 0.02
    finally:
        os.unlink(f.name)
