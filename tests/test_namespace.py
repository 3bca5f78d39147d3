"""API-surface smoke tests: the canonical user namespace (reference: phi/flow.py)
and top-level helpers."""
import numpy as np


def test_flow_star_import():
    import phiflow_tpu.flow as flow
    required = [
        'math', 'geom', 'field', 'physics', 'vis', 'advect', 'diffuse', 'fluid',
        'Tensor', 'Shape', 'batch', 'spatial', 'channel', 'instance', 'dual',
        'wrap', 'tensor', 'vec', 'stack', 'Solve', 'solve_linear', 'jit_compile',
        'jit_compile_linear', 'gradient', 'iterate', 'extrapolation', 'PERIODIC', 'ZERO_GRADIENT',
        'Geometry', 'Point', 'Sphere', 'Box', 'Cuboid', 'UniformGrid', 'union', 'Cylinder',
        'Field', 'Grid', 'CenteredGrid', 'StaggeredGrid', 'PointCloud', 'Noise',
        'resample', 'sample', 'spatial_gradient', 'divergence', 'curl', 'laplace',
        'Obstacle', 'make_incompressible', 'Scene', 'plot', 'show', 'control', 'action',
        'Mesh', 'mesh', 'load_su2', 'load_gmsh', 'Graph', 'graph',
    ]
    missing = [n for n in required if not hasattr(flow, n)]
    assert not missing, f"missing from flow namespace: {missing}"


def test_verify():
    import phiflow_tpu
    phiflow_tpu.verify()
    assert phiflow_tpu.detect_backends()


def test_iterate_trajectory():
    import phiflow_tpu.math as math
    from phiflow_tpu.math import batch, extrapolation
    from phiflow_tpu.field import CenteredGrid, Noise
    from phiflow_tpu.physics import diffuse

    g = CenteredGrid(Noise(), extrapolation.PERIODIC, x=8, y=8)
    traj = math.iterate(lambda f: diffuse.explicit(f, 0.1, 1.), batch(time=4), g)
    assert traj.shape.get_size('time') == 5  # includes initial state
    assert float(math.std(traj.values[{'time': 4}])) < float(math.std(traj.values[{'time': 0}]))


def test_scene_roundtrip(tmp_path):
    import phiflow_tpu.math as math
    from phiflow_tpu.math import extrapolation
    from phiflow_tpu.field import CenteredGrid, StaggeredGrid, Noise, Scene

    scene = Scene.create(str(tmp_path))
    s = CenteredGrid(Noise(), extrapolation.PERIODIC, x=8, y=8)
    v = StaggeredGrid(Noise(vector='x,y'), extrapolation.ZERO, x=8, y=8)
    scene.write(smoke=s, velocity=v, frame=3)
    scene.put_properties(dt=0.5, description="test run")
    s2 = scene.read_field('smoke', frame=3)
    math.assert_close(s.values, s2.values)
    v2 = scene.read_field('velocity', frame=3)
    math.assert_close(v.vector['x'].values, v2.vector['x'].values)
    assert scene.properties['dt'] == 0.5
    assert 'smoke' in scene.fieldnames and 3 in scene.frames
    scene2 = Scene.at(scene.path)
    assert scene2.properties['description'] == "test run"
    assert len(Scene.list(str(tmp_path))) == 1
