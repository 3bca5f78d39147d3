"""Web GUI (Dash-app analog) smoke tests — server lifecycle, API, PNG rendering."""
import json
import urllib.request

import numpy as np

from phiflow_tpu.field import CenteredGrid
from phiflow_tpu.math import extrapolation
from phiflow_tpu.vis import WebGui
from phiflow_tpu.vis._vis_base import VisModel


class _Model(VisModel):
    def __init__(self):
        super().__init__(name='TestSim')
        self.grid = CenteredGrid(lambda pos: pos.vector['x'], extrapolation.ZERO, x=8, y=8)
        self.steps = 0

    @property
    def field_names(self):
        return ('grid',)

    def get_field(self, name, dim_selection=None):
        return self.grid

    def progress(self):
        self.grid = self.grid * 1.1
        self.steps += 1


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read(), r.headers.get('Content-Type')


def test_web_gui_roundtrip():
    gui = WebGui(port=0)  # ephemeral port
    gui.setup(_Model())
    gui.show(block=False)
    try:
        base = f'http://127.0.0.1:{gui.port}'
        page, ctype = _get(base + '/')
        assert b'TestSim' in page and 'text/html' in ctype
        status, _ = _get(base + '/api/status')
        s = json.loads(status)
        assert s['steps'] == 0 and s['fields'] == ['grid']
        # step via POST
        req = urllib.request.Request(base + '/api/step', method='POST')
        with urllib.request.urlopen(req, timeout=10) as r:
            assert json.loads(r.read())['steps'] == 1
        assert gui.app.steps == 1
        png, ctype = _get(base + '/plot?field=grid')
        assert png[:8] == b'\x89PNG\r\n\x1a\n' and 'image/png' in ctype
        png2, _ = _get(base + '/curves')
        assert png2[:8] == b'\x89PNG\r\n\x1a\n'
    finally:
        gui.close()


def test_board_page_and_endpoints():
    """Φ-Board page: benchmark + sysinfo endpoints (reference:
    phi/vis/_dash/board.py:25,56,91)."""
    import json
    import urllib.request
    from phiflow_tpu.vis._web import WebGui

    class Model(VisModel):
        @property
        def field_names(self):
            return ('f',)

        def get_field(self, name, sel):
            from phiflow_tpu.field import CenteredGrid
            from phiflow_tpu.math import extrapolation
            return CenteredGrid(0., extrapolation.ZERO, x=4, y=4)

        def progress(self):
            self.steps += 1

    gui = WebGui(port=0)
    gui.setup(Model())
    gui.show(block=False)
    base = f"http://127.0.0.1:{gui.port}"
    try:
        page = urllib.request.urlopen(f"{base}/board", timeout=10).read().decode()
        assert 'Board' in page and 'benchmark' in page.lower()
        info = json.loads(urllib.request.urlopen(f"{base}/api/sysinfo", timeout=10).read())
        assert 'backend' in info and info['device_count'] >= 1
        bench_result = json.loads(urllib.request.urlopen(
            urllib.request.Request(f"{base}/api/benchmark?n=3", method='POST'), timeout=30).read())
        assert bench_result['steps'] == 3 and bench_result['ms_per_step'] >= 0
    finally:
        gui.close()


def test_multiview_info_log_pages():
    """Side-by-Side / Quad / Info / Log pages (reference page list:
    phi/vis/_dash/dash_gui.py:27-42, info.py, log.py)."""
    gui = WebGui(port=0)
    gui.setup(_Model())
    gui.show(block=False)
    base = f'http://127.0.0.1:{gui.port}'
    try:
        sbs, ctype = _get(base + '/side-by-side')
        assert 'text/html' in ctype and sbs.count(b'class="view"') == 2
        quad, _ = _get(base + '/quad')
        assert quad.count(b'class="view"') == 4
        info, _ = _get(base + '/info')
        assert b'TestSim' in info and b'Backend' in info and b'Fields' in info
        log_page, _ = _get(base + '/log')
        assert b'Log' in log_page
        log_json, _ = _get(base + '/api/log')
        assert 'text' in json.loads(log_json)  # no scene -> explanatory message
    finally:
        gui.close()


def test_log_page_with_scene(tmp_path):
    """With a Scene attached, /api/log serves the scene's info.log contents."""
    from phiflow_tpu.field import Scene
    from phiflow_tpu.vis._log import SceneLog

    class SceneModel(_Model):
        def __init__(self, scene):
            super().__init__()
            self.scene = scene

    scene = Scene.create(str(tmp_path))
    log = SceneLog(scene)
    log.log('hello from the simulation')
    gui = WebGui(port=0)
    gui.setup(SceneModel(scene))
    gui.show(block=False)
    try:
        text = json.loads(_get(f'http://127.0.0.1:{gui.port}/api/log')[0])['text']
        assert 'hello from the simulation' in text
    finally:
        gui.close()
