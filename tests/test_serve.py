"""Online HTTP scoring service: micro-batcher correctness + HTTP e2e.

`cli/serve.py` is beyond-parity surface (the reference has no serving
entry); its contract here is (a) the micro-batching device worker returns
each request ITS OWN video's score regardless of grouping, and (b) the
HTTP layer round-trips raw video bytes and local paths end-to-end on the
tiny model.
"""

import http.client
import io
import json
import threading
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from aigv_assessor_tpu.cli.serve import ScoringService, make_handler

QUESTIONS = [
    "How would you rate the static quality of this video?",
    "How would you rate the temporal quality of this video?",
]


@pytest.fixture(scope="module")
def service():
    svc = ScoringService(
        questions=QUESTIONS,
        model_scale="tiny",
        batch_size=4,
        num_segments=4,
        max_wait_ms=20.0,
        bf16=False,
        max_seq_length=512,
    )
    svc.warmup()
    yield svc
    svc.close()


def _pixels(svc, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(
        size=(svc.num_segments, svc.image_size, svc.image_size, 3)
    ).astype(np.float32)


class TestMicroBatcher:
    def test_each_request_gets_its_own_score(self, service):
        """Concurrent submits land in one padded batch; every caller must
        get the score of ITS video (order within the batch is arbitrary)."""
        inputs = [_pixels(service, s) for s in range(5)]  # > batch_size
        solo = [service.submit(px) for px in inputs]
        results = [None] * len(inputs)

        def run(i):
            results[i] = service.submit(inputs[i])

        threads = [threading.Thread(target=run, args=(i,)) for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i, (a, b) in enumerate(zip(results, solo)):
            assert a is not None, f"request {i} never completed"
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_score_shape_and_scale(self, service):
        scores = service.submit(_pixels(service, 9))
        assert scores.shape == (len(QUESTIONS),)
        assert np.all(np.isfinite(scores))

    def test_stats_accumulate(self, service):
        before = service.stats.snapshot(service.batch_size)["batches"]
        service.submit(_pixels(service, 11))
        snap = service.stats.snapshot(service.batch_size)
        assert snap["batches"] > before
        assert snap["jobs"] >= snap["batches"]
        assert 0 < snap["mean_batch_fill"] <= service.batch_size
        assert snap["flush_s_per_batch"] >= 0.0


class TestHTTP:
    @pytest.fixture(scope="class")
    def server(self, service):
        srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield srv.server_address
        srv.shutdown()

    def _gif_bytes(self):
        from PIL import Image

        frames = [
            Image.new("RGB", (64, 48), (i * 40 % 255, 80, 120))
            for i in range(6)
        ]
        buf = io.BytesIO()
        frames[0].save(
            buf, format="GIF", save_all=True, append_images=frames[1:],
            duration=100,
        )
        return buf.getvalue()

    def test_statz(self, server):
        host, port = server
        conn = http.client.HTTPConnection(host, port, timeout=120)
        conn.request("GET", "/statz")
        r = conn.getresponse()
        assert r.status == 200
        body = json.loads(r.read())
        assert body["batch_capacity"] == 4
        assert "decode_s_mean" in body

    def test_healthz(self, server):
        host, port = server
        conn = http.client.HTTPConnection(host, port, timeout=120)
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200
        body = json.loads(r.read())
        assert body["status"] == "ok" and body["questions"] == QUESTIONS

    def test_score_raw_gif_bytes(self, server):
        host, port = server
        conn = http.client.HTTPConnection(host, port, timeout=300)
        conn.request(
            "POST", "/score", body=self._gif_bytes(),
            headers={"Content-Type": "image/gif"},
        )
        r = conn.getresponse()
        assert r.status == 200, r.read()
        scores = json.loads(r.read())["scores"]
        assert set(scores) == set(QUESTIONS)
        assert all(np.isfinite(v) for v in scores.values())

    def test_score_local_path(self, server, tmp_path):
        p = tmp_path / "clip.gif"
        p.write_bytes(self._gif_bytes())
        host, port = server
        conn = http.client.HTTPConnection(host, port, timeout=300)
        conn.request(
            "POST", "/score", body=json.dumps({"path": str(p)}),
            headers={"Content-Type": "application/json"},
        )
        r = conn.getresponse()
        assert r.status == 200, r.read()
        assert set(json.loads(r.read())["scores"]) == set(QUESTIONS)

    def test_bad_request(self, server):
        host, port = server
        conn = http.client.HTTPConnection(host, port, timeout=120)
        conn.request(
            "POST", "/score", body=b"{\"nope\": 1}",
            headers={"Content-Type": "application/json"},
        )
        assert conn.getresponse().status == 400
        conn = http.client.HTTPConnection(host, port, timeout=120)
        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404
