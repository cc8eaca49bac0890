"""Serving layer: job queue semantics + HTTP API + tiny-model integration."""

import base64
import http.client
import io
import json
import os
import time

import numpy as np
import pytest
from PIL import Image

from animate_anything_tpu.serving import VideoServer, controller_generate_fn


def _wait(server_conn_factory, job_id, timeout=300.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        conn = server_conn_factory()
        conn.request("GET", f"/jobs/{job_id}")
        r = json.loads(conn.getresponse().read())
        if r["status"] in ("done", "error"):
            return r
        time.sleep(0.2)
    raise TimeoutError


def test_server_queue_and_http(tmp_path):
    calls = []

    def fake_generate(req):
        calls.append(req)
        p = tmp_path / f"{len(calls)}.gif"
        frames = [Image.fromarray(np.zeros((8, 8, 3), np.uint8))] * 2
        frames[0].save(p, save_all=True, append_images=frames[1:])
        if req.get("prompt") == "boom":
            raise RuntimeError("requested failure")
        return str(p)

    server = VideoServer(fake_generate)
    httpd = server.serve(0)  # ephemeral port
    port = httpd.server_address[1]
    conn = lambda: http.client.HTTPConnection("127.0.0.1", port, timeout=10)

    # healthz
    c = conn(); c.request("GET", "/healthz")
    h = json.loads(c.getresponse().read())
    assert h["ok"] is True

    # enqueue two jobs + one failing job; FIFO completion
    ids = []
    for prompt in ("a", "b", "boom"):
        c = conn()
        body = json.dumps({"prompt": prompt, "image_path": "x"})
        c.request("POST", "/generate", body=body,
                  headers={"Content-Type": "application/json"})
        r = c.getresponse()
        assert r.status == 202
        ids.append(json.loads(r.read())["job_id"])

    done = [_wait(conn, i, timeout=30) for i in ids]
    assert done[0]["status"] == "done" and done[1]["status"] == "done"
    assert done[2]["status"] == "error" and "requested failure" in done[2]["error"]
    assert [c_["prompt"] for c_ in calls] == ["a", "b", "boom"]
    assert "generate_seconds" in done[0]

    # result bytes are the gif
    c = conn(); c.request("GET", f"/result/{ids[0]}")
    r = c.getresponse()
    assert r.status == 200 and r.getheader("Content-Type") == "image/gif"
    assert r.read()[:3] == b"GIF"

    # unknown job
    c = conn(); c.request("GET", "/jobs/nope")
    assert c.getresponse().status == 404

    httpd.shutdown()
    server.shutdown()


@pytest.mark.slow
def test_server_tiny_model_end_to_end(tmp_path):
    """Full path: HTTP request → queue → AnimateController (tiny) → gif."""
    from app import AnimateController

    controller = AnimateController(
        model_size="tiny", output_dir=str(tmp_path / "out"),
        validation_data=dict(height=32, width=32, num_frames=3),
    )
    server = VideoServer(controller_generate_fn(controller))
    httpd = server.serve(0)
    port = httpd.server_address[1]
    conn = lambda: http.client.HTTPConnection("127.0.0.1", port, timeout=10)

    img = Image.fromarray((np.random.default_rng(0).random((32, 32, 3)) * 255)
                          .astype(np.uint8))
    buf = io.BytesIO(); img.save(buf, format="PNG")
    body = json.dumps({
        "image_b64": base64.b64encode(buf.getvalue()).decode(),
        "prompt": "a red square moves",
        "sample_steps": 2,
        "motion_scale": 4.0,
        "seed": 0,
    })
    c = conn()
    c.request("POST", "/generate", body=body,
              headers={"Content-Type": "application/json"})
    job_id = json.loads(c.getresponse().read())["job_id"]

    r = _wait(conn, job_id, timeout=600)
    assert r["status"] == "done", r
    assert os.path.exists(r["result_path"])

    httpd.shutdown()
    server.shutdown()


@pytest.mark.slow
def test_server_svd_route(tmp_path):
    """workload='svd' dispatches to the SVD controller; unknown workloads
    error cleanly."""
    import app_svd
    from animate_anything_tpu.serving import (multi_workload_generate_fn,
                                              svd_controller_generate_fn)

    controller = app_svd.AnimateController(
        model_size="tiny", output_dir=str(tmp_path / "svd_out"),
        validation_data=dict(num_frames=3),
    )
    gen = multi_workload_generate_fn(
        {"svd": svd_controller_generate_fn(controller)})
    server = VideoServer(gen)
    httpd = server.serve(0)
    port = httpd.server_address[1]
    conn = lambda: http.client.HTTPConnection("127.0.0.1", port, timeout=10)

    img = Image.fromarray((np.random.default_rng(0).random((64, 64, 3)) * 255)
                          .astype(np.uint8))
    buf = io.BytesIO(); img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()

    c = conn()
    c.request("POST", "/generate", body=json.dumps({
        "workload": "svd", "image_b64": b64, "sample_steps": 2, "seed": 0,
    }), headers={"Content-Type": "application/json"})
    job_id = json.loads(c.getresponse().read())["job_id"]
    r = _wait(conn, job_id, timeout=600)
    assert r["status"] == "done", r
    assert os.path.exists(r["result_path"])

    # default workload 'latent' is not registered on this server
    c = conn()
    c.request("POST", "/generate", body=json.dumps({"image_b64": b64}),
              headers={"Content-Type": "application/json"})
    job_id = json.loads(c.getresponse().read())["job_id"]
    r = _wait(conn, job_id, timeout=60)
    assert r["status"] == "error" and "unknown workload" in r["error"]

    httpd.shutdown()
    server.shutdown()


def test_serving_mask_reaches_alpha_layer():
    """A grayscale client mask must land in the drawing layer's ALPHA channel
    (the channel app.AnimateController reads), not be lost to convert('RGBA')."""
    captured = {}

    class FakeController:
        def animate(self, init_img, **kw):
            captured["init"] = init_img
            captured.update(kw)
            return "x.gif"

    gen = controller_generate_fn(FakeController())
    img = Image.fromarray((np.random.default_rng(0).random((32, 32, 3)) * 255)
                          .astype(np.uint8))
    mask = np.zeros((16, 16), np.uint8)  # different size → resize path
    mask[:8] = 255                       # top half animates
    b = io.BytesIO(); img.save(b, format="PNG")
    mb = io.BytesIO(); Image.fromarray(mask, mode="L").save(mb, format="PNG")
    gen({"image_b64": base64.b64encode(b.getvalue()).decode(),
         "mask_b64": base64.b64encode(mb.getvalue()).decode(),
         "prompt": "p"})
    alpha = captured["init"]["layers"][0][..., 3]
    assert alpha.shape == (32, 32)
    assert alpha[:16].min() == 255 and alpha[16:].max() == 0


def test_serving_job_eviction(tmp_path):
    """Finished jobs drop their request payload and are evicted FIFO beyond
    MAX_FINISHED."""
    p = tmp_path / "r.gif"
    Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(p)

    server = VideoServer(lambda req: str(p))
    server.MAX_FINISHED = 2
    jobs = [server.submit({"payload": "x" * 1000, "i": i}) for i in range(5)]
    t0 = time.time()
    while server.done_count < 5 and time.time() - t0 < 30:
        time.sleep(0.05)
    assert server.done_count == 5
    # only the 2 newest finished jobs remain, with empty request payloads
    assert len(server.jobs) == 2
    assert jobs[0].id not in server.jobs and jobs[4].id in server.jobs
    assert all(j.request == {} for j in server.jobs.values())
    server.shutdown()
