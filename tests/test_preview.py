"""Interactive preview substitute (apps/preview.py) — drives the HTTP facade
the way the reference's GLFW callbacks drive the GL window
(apps/src/preview.cpp:172-211, main.cpp:221-339)."""

import http.client
import json
import math
import threading
import time

import numpy as np
import pytest

from mygpuraytracer_tpu.apps.preview import (
    OrbitCamera, PreviewSession, make_server,
)
from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.scene.builtin import cornell_box


def test_orbit_camera_roundtrip():
    """Deriving (zoom, theta, phi) then rebuilding position is identity."""
    s = cornell_box(resolution=(16, 16))
    cam = s.state.camera
    orbit = OrbitCamera(cam)
    np.testing.assert_allclose(orbit.position(), cam.position, atol=1e-5)


def test_orbit_camera_verbs():
    s = cornell_box(resolution=(16, 16))
    orbit = OrbitCamera(s.state.camera)
    # theta clamps to [0.001, pi] (main.cpp:315)
    orbit.orbit(0.0, -1e6, 16, 16)
    assert abs(orbit.theta - math.pi) < 1e-6
    # zoom clamps at 0.1 (main.cpp:320)
    orbit.zoom_by(-1e6, 16)
    assert orbit.zoom == pytest.approx(0.1)
    # pan moves lookAt in the ground plane; recenter restores it.
    # (fresh camera: at theta=pi the flattened forward/right basis is
    # degenerate and pan is a no-op, same as the reference's ground-plane
    # projection at main.cpp:326-331)
    orbit = OrbitCamera(s.state.camera)
    before = orbit.look_at.copy()
    orbit.pan(30.0, -12.0)
    assert not np.allclose(orbit.look_at, before)
    assert orbit.look_at[1] == pytest.approx(before[1])  # y untouched
    orbit.recenter()
    np.testing.assert_allclose(orbit.look_at, orbit.og_look_at)


@pytest.fixture
def preview():
    scene = cornell_box(resolution=(32, 32))
    session = PreviewSession(scene, RenderOptions(), iterations=64, batch=2)
    server = make_server(session, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    session.start()
    conn = http.client.HTTPConnection(*server.server_address, timeout=30)
    yield session, conn
    conn.close()
    server.shutdown()
    server.server_close()
    session.stop()


def _get(conn, path):
    conn.request("GET", path)
    r = conn.getresponse()
    return r.status, r.read()


def _post(conn, path, body):
    conn.request("POST", path, json.dumps(body))
    r = conn.getresponse()
    return r.status, r.read()


def _wait_for_iteration(conn, minimum, timeout=60):
    t0 = time.time()
    while time.time() - t0 < timeout:
        _, body = _get(conn, "/state")
        state = json.loads(body)
        if state["iteration"] >= minimum:
            return state
        time.sleep(0.1)
    raise TimeoutError(f"iteration never reached {minimum}")


def test_preview_progressive_and_camera_reset(preview, tmp_path):
    session, conn = preview
    session.out_dir = str(tmp_path)

    state = _wait_for_iteration(conn, 4)
    assert state["iterations"] == 64
    assert state["fps"] >= 0

    # frame endpoint serves a real PNG of the scene resolution
    status, png = _get(conn, "/frame.png")
    assert status == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"

    # index page serves the viewer
    status, page = _get(conn, "/")
    assert status == 200 and b"TPU Path Tracer" in page

    # orbit verb resets accumulation (camchanged -> iteration = 0).
    # Reset detection must be poll-rate robust: inferring a reset from an
    # iteration DECREASE can miss when the accumulator re-climbs past the
    # old max between polls, so /state exposes a monotone `resets` counter
    # incremented when the render loop actually applies the camera move.
    resets0 = json.loads(_get(conn, "/state")[1])["resets"]
    _post(conn, "/camera", {"orbit": [5, 3]})
    t0 = time.time()
    saw_reset = False
    while time.time() - t0 < 30:
        st = json.loads(_get(conn, "/state")[1])
        if st["resets"] > resets0:
            saw_reset = True
            break
        time.sleep(0.01)
    assert saw_reset, "camera change must zero the accumulator"

    # save produces the saveImage outputs
    _wait_for_iteration(conn, 2)
    status, body = _post(conn, "/save", {"denoise": False})
    saved = json.loads(body)["saved"]
    assert status == 200 and len(saved) == 2
    assert any(p.endswith("samp.png") for p in saved)
    assert any(p.endswith("albedo.png") for p in saved)

    # bad JSON is a 400, not a server crash
    conn.request("POST", "/camera", "{not json")
    resp = conn.getresponse()
    resp.read()
    assert resp.status == 400
