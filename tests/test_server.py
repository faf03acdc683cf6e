"""HTTP serving stack: MicroBatcher semantics, request preprocessing
(train/serve skew guards), and an end-to-end HTTP round trip."""

import base64
import concurrent.futures as cf
import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from d2r_tpu.server import InferenceService, MicroBatcher, make_server


# ---------------------------------------------------------------- batcher
class TestMicroBatcher:
    def test_concurrent_submits_coalesce_into_one_flush(self):
        calls = []

        def run(items):
            calls.append(len(items))
            return [i * 10 for i in items]

        mb = MicroBatcher(run, max_batch=8, max_wait_ms=200.0)
        try:
            with cf.ThreadPoolExecutor(4) as pool:
                futs = list(pool.map(lambda i: mb.submit(i), range(4)))
            results = [f.result(timeout=5) for f in futs]
        finally:
            mb.close()
        assert results == [0, 10, 20, 30]       # routed to the right caller
        assert sum(calls) == 4
        assert len(calls) <= 2                  # coalesced, not 4 launches

    def test_max_batch_splits_flushes(self):
        calls = []

        def run(items):
            calls.append(len(items))
            return items

        mb = MicroBatcher(run, max_batch=2, max_wait_ms=50.0)
        try:
            futs = [mb.submit(i) for i in range(5)]
            assert [f.result(timeout=5) for f in futs] == list(range(5))
        finally:
            mb.close()
        assert max(calls) <= 2 and sum(calls) == 5

    def test_flush_error_fails_only_that_flush(self):
        state = {"fail": True}

        def run(items):
            if state["fail"]:
                state["fail"] = False
                raise RuntimeError("boom")
            return items

        mb = MicroBatcher(run, max_batch=4, max_wait_ms=10.0)
        try:
            bad = mb.submit("a")
            with pytest.raises(RuntimeError, match="boom"):
                bad.result(timeout=5)
            good = mb.submit("b")              # the loop must keep serving
            assert good.result(timeout=5) == "b"
        finally:
            mb.close()

    def test_low_qps_flushes_after_probe_not_max_wait(self):
        """A lone request must not pay the full max_wait window: with no
        follower inside the probe (max_wait/10), it flushes early."""
        mb = MicroBatcher(lambda items: items, max_batch=8,
                          max_wait_ms=400.0)  # probe = 40 ms
        try:
            t0 = time.monotonic()
            assert mb.submit("solo").result(timeout=5) == "solo"
            elapsed = time.monotonic() - t0
        finally:
            mb.close()
        # well under the 400 ms window (generous bound for a loaded CI box)
        assert elapsed < 0.25, f"lone request waited {elapsed * 1e3:.0f} ms"

    def test_follower_in_probe_extends_to_full_window(self):
        """A follower arriving inside the probe re-arms the full max_wait
        gather, so a staggered burst still coalesces."""
        calls = []

        def run(items):
            calls.append(len(items))
            return items

        mb = MicroBatcher(run, max_batch=4, max_wait_ms=500.0)  # probe 50 ms
        try:
            f0 = mb.submit(0)
            time.sleep(0.02)       # inside the probe window
            f1 = mb.submit(1)
            time.sleep(0.15)       # outside probe, inside full window
            f2 = mb.submit(2)
            assert [f.result(timeout=5) for f in (f0, f1, f2)] == [0, 1, 2]
        finally:
            mb.close()
        assert calls and calls[0] == 3, calls  # one coalesced flush

    def test_submit_after_close_raises(self):
        mb = MicroBatcher(lambda items: items, max_batch=2, max_wait_ms=1.0)
        mb.close()
        with pytest.raises(RuntimeError):
            mb.submit(1)


# ------------------------------------------------------- preprocessing
class _FakePredictor:
    """Just enough Predictor surface for InferenceService."""

    def __init__(self, cfg, batch_buckets=(4,)):
        self.cfg = cfg
        self.seq_len = cfg.max_seq
        self.batch_buckets = sorted(batch_buckets)

    def predict(self, input_ids, attention_mask, token_type_ids,
                pixel_values):
        n = input_ids.shape[0]
        probs = np.full((n, self.cfg.num_classes),
                        1.0 / self.cfg.num_classes, np.float32)
        return {"label": probs.argmax(-1), "probs": probs}


def _tiny_service(raw_uint8=True, **kw):
    from d2r_tpu.config import tiny_test_config
    from d2r_tpu.data.tokenizer import load_tokenizer

    cfg = tiny_test_config()
    tok = load_tokenizer("nonexistent-tiny",
                         vocab_size=cfg.text_config().vocab_size)
    return InferenceService(_FakePredictor(cfg), tok,
                            raw_uint8=raw_uint8, **kw), cfg


class TestPreprocess:
    def test_text_only_placeholder_matches_training_pipeline(self):
        from d2r_tpu.data.image import placeholder_pixels

        svc, cfg = _tiny_service(raw_uint8=True)
        try:
            item = svc.preprocess("a happy day", None)
            np.testing.assert_array_equal(
                item["pixel_values"],
                placeholder_pixels(svc.image_size, raw_uint8=True))
            assert item["input_ids"].shape == (cfg.max_seq,)
            assert item["attention_mask"][0] == 1
        finally:
            svc.close()

    def test_corrupt_image_bytes_fall_back_to_grey(self):
        from d2r_tpu.data.image import gray_fallback

        svc, _ = _tiny_service(raw_uint8=True)
        try:
            item = svc.preprocess("text", b"definitely not an image")
            np.testing.assert_array_equal(
                item["pixel_values"],
                gray_fallback(svc.image_size, raw_uint8=True))
        finally:
            svc.close()

    def test_valid_image_bytes_match_pil_preprocessing(self):
        PIL = pytest.importorskip("PIL")
        from PIL import Image
        from d2r_tpu.data.image import preprocess_pil

        svc, _ = _tiny_service(raw_uint8=False)
        try:
            rng = np.random.default_rng(0)
            arr = rng.integers(0, 256, size=(40, 52, 3)).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")  # lossless
            item = svc.preprocess("text", buf.getvalue())
            expect = preprocess_pil(Image.fromarray(arr), svc.image_size,
                                    raw_uint8=False)
            np.testing.assert_allclose(item["pixel_values"], expect,
                                       atol=1e-6)
        finally:
            svc.close()


# -------------------------------------------------------- hot reload
class TestPredictMany:
    def test_preprocesses_all_items_before_first_submit(self):
        """Bulk path must finish ALL host-side preprocessing before the
        first submit: interleaving lets the batcher's max_wait expire
        between items and flushes micro-batches of ~1."""
        svc, cfg = _tiny_service()
        try:
            order = []
            real_pre, real_submit = svc.preprocess, svc.batcher.submit
            svc.preprocess = lambda t, i: (order.append("pre"),
                                           real_pre(t, i))[1]
            svc.batcher.submit = lambda item: (order.append("submit"),
                                               real_submit(item))[1]
            out = svc.predict_many([("a", None), ("b", None), ("c", None)])
            assert len(out) == 3
            assert order == ["pre"] * 3 + ["submit"] * 3
        finally:
            svc.close()

    def test_preprocess_failure_counts_every_item(self):
        """If the bulk request dies in preprocessing (before any future
        exists), every item must count as a failed request — same per-item
        accounting as the submit path."""
        svc, cfg = _tiny_service()
        try:
            def boom(text, image_bytes):
                raise RuntimeError("preprocess boom")

            svc.preprocess = boom
            with pytest.raises(RuntimeError, match="preprocess boom"):
                svc.predict_many([("a", None)] * 3)
            snap = svc.stats.snapshot()
            assert snap["requests_total"] == 3
            assert snap["errors_total"] == 3
        finally:
            svc.close()

    def test_partial_failure_counts_only_failed_items(self):
        """One bad item in a bulk request must not report the whole batch
        as failed in /metrics."""
        svc, cfg = _tiny_service()
        try:
            calls = []

            def submit(item):
                f = cf.Future()
                if len(calls) == 1:
                    f.set_exception(RuntimeError("boom"))
                else:
                    f.set_result({"label": 0, "probs": [1.0, 0.0]})
                calls.append(item)
                return f

            svc.batcher.submit = submit
            with pytest.raises(RuntimeError, match="boom"):
                svc.predict_many([("a", None)] * 3)
            snap = svc.stats.snapshot()
            assert snap["requests_total"] == 3
            assert snap["errors_total"] == 1
        finally:
            svc.close()


class _BiasedPredictor(_FakePredictor):
    """Distinguishable constant distribution, for swap assertions."""

    def __init__(self, cfg, probs, **kw):
        super().__init__(cfg, **kw)
        self._probs = np.asarray(probs, np.float32)

    def predict(self, input_ids, attention_mask, token_type_ids,
                pixel_values):
        n = input_ids.shape[0]
        probs = np.tile(self._probs, (n, 1))
        return {"label": probs.argmax(-1), "probs": probs}


class TestReload:
    def test_swap_guards_and_busy_lock(self):
        from d2r_tpu.config import tiny_test_config
        from d2r_tpu.data.tokenizer import load_tokenizer

        cfg = tiny_test_config()
        tok = load_tokenizer("nonexistent-tiny",
                             vocab_size=cfg.text_config().vocab_size)
        built = {}

        def factory(load_path):
            if load_path == "wrong-seq":
                bad = tiny_test_config(max_seq=cfg.max_seq * 2)
                return _BiasedPredictor(bad, [1, 0, 0])
            built["path"] = load_path
            return _BiasedPredictor(cfg, [0, 0, 1])

        svc = InferenceService(_BiasedPredictor(cfg, [1, 0, 0]), tok,
                               predictor_factory=factory)
        try:
            assert svc.predict_one("x")["label"] == 0
            svc.reload("ckpt-b")
            assert built["path"] == "ckpt-b"
            assert svc.predict_one("x")["label"] == 2  # swapped
            assert svc.stats.snapshot()["reloads_total"] == 1

            with pytest.raises(ValueError, match="max_seq"):
                svc.reload("wrong-seq")
            assert svc.predict_one("x")["label"] == 2  # old model kept

            with svc._reload_lock:  # simulate an in-flight reload
                with pytest.raises(BlockingIOError):
                    svc.reload("ckpt-c")
        finally:
            svc.close()

    def test_reload_unconfigured_raises(self):
        svc, _ = _tiny_service()
        try:
            with pytest.raises(RuntimeError, match="not configured"):
                svc.reload("anywhere")
        finally:
            svc.close()


# ----------------------------------------------------------- HTTP e2e
def _post(url, payload, timeout=120):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


class TestHTTPEndToEnd:
    @pytest.fixture(scope="class")
    def server(self):
        """Tiny REAL model behind the full HTTP stack, ephemeral port."""
        import jax
        import jax.numpy as jnp
        from d2r_tpu.config import tiny_test_config
        from d2r_tpu.data.dataset import synthetic_batch
        from d2r_tpu.data.tokenizer import load_tokenizer
        from d2r_tpu.models.unimo import D2RClassifier
        from d2r_tpu.serve import Predictor

        cfg = tiny_test_config()
        model = D2RClassifier(cfg)
        vc = cfg.vision_config()
        batch = synthetic_batch(2, cfg.max_seq, vc.image_size,
                                vocab_size=cfg.text_config().vocab_size)
        variables = jax.jit(model.init)(
            jax.random.key(0),
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["token_type_ids"]),
            jnp.asarray(batch["labels"]),
            jnp.asarray(batch["pixel_values"]))
        pred = Predictor(cfg, variables, batch_buckets=(2,),
                         seq_buckets=(cfg.max_seq,))
        # compile ahead of serving so no request future waits on a compile
        # (requests carry uint8 pixels -> warm the uint8 program)
        pred.warmup(pixel_dtype=jnp.uint8)
        tok = load_tokenizer("nonexistent-tiny",
                             vocab_size=cfg.text_config().vocab_size)

        def factory(load_path):
            # POST /reload factory: "seed-N" -> same geometry, new init
            seed = int(load_path.rsplit("-", 1)[-1])
            v2 = jax.jit(model.init)(
                jax.random.key(seed),
                jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["attention_mask"]),
                jnp.asarray(batch["token_type_ids"]),
                jnp.asarray(batch["labels"]),
                jnp.asarray(batch["pixel_values"]))
            p2 = Predictor(cfg, v2, batch_buckets=(2,),
                           seq_buckets=(cfg.max_seq,))
            p2.warmup(pixel_dtype=jnp.uint8)
            return p2

        svc = InferenceService(pred, tok, raw_uint8=True, max_wait_ms=20.0,
                               label_names=("neutral", "positive", "negative"),
                               predictor_factory=factory)
        httpd = make_server(svc, "127.0.0.1", 0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        yield url, cfg
        httpd.shutdown()
        svc.close()

    def test_healthz(self, server):
        url, cfg = server
        with urllib.request.urlopen(url + "/healthz", timeout=10) as r:
            body = json.loads(r.read())
        assert r.status == 200 and body["status"] == "ok"
        assert body["max_seq"] == cfg.max_seq

    def test_predict_text_and_image(self, server):
        PIL = pytest.importorskip("PIL")
        from PIL import Image

        url, cfg = server
        rng = np.random.default_rng(1)
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 256, size=(32, 32, 3)
                                     ).astype(np.uint8)).save(buf, "JPEG")
        status, body = _post(url + "/predict", {
            "text": "what a great sunny day",
            "image_b64": base64.b64encode(buf.getvalue()).decode()})
        assert status == 200, body
        assert 0 <= body["label"] < cfg.num_classes
        assert body["label_name"] in ("neutral", "positive", "negative")
        np.testing.assert_allclose(sum(body["probs"]), 1.0, rtol=1e-4)

    def test_predict_text_only_and_bad_request(self, server):
        url, cfg = server
        status, body = _post(url + "/predict", {"text": "no image here"})
        assert status == 200 and len(body["probs"]) == cfg.num_classes
        status, body = _post(url + "/predict", {"not_text": 1})
        assert status == 400 and "text" in body["error"]

    def test_oversized_body_rejected_413_without_reading(self, server):
        """A multi-GB Content-Length must be refused BEFORE the body is
        read — one hostile request must not OOM the serving process."""
        import http.client

        url, _cfg = server
        host = url.split("//", 1)[1]
        conn = http.client.HTTPConnection(host, timeout=30)
        try:
            conn.putrequest("POST", "/predict")
            conn.putheader("Content-Type", "application/json")
            # declare 2 GB but send a few bytes: the server must answer off
            # the header alone (it never allocates or waits for the body)
            conn.putheader("Content-Length", str(2 << 30))
            conn.endheaders()
            conn.send(b'{"text": "hi"}')
            resp = conn.getresponse()
            body = json.loads(resp.read())
            assert resp.status == 413, body
            assert "limit" in body["error"]
        finally:
            conn.close()

    def test_negative_content_length_rejected_400(self, server):
        """Content-Length: -1 must not reach rfile.read(-1) (which buffers
        until EOF — the unbounded read the body cap exists to prevent)."""
        import http.client

        url, _cfg = server
        conn = http.client.HTTPConnection(url.split("//", 1)[1], timeout=30)
        try:
            conn.putrequest("POST", "/predict")
            conn.putheader("Content-Type", "application/json")
            conn.putheader("Content-Length", "-1")
            conn.endheaders()
            resp = conn.getresponse()
            assert resp.status == 400, resp.read()[:200]
        finally:
            conn.close()

    def test_oversized_image_item_rejected_413(self, server, monkeypatch):
        """Per-item decoded image bytes are capped (cap shrunk for the test
        so no real multi-MB payload is needed)."""
        import d2r_tpu.server as server_mod

        url, _cfg = server
        monkeypatch.setattr(server_mod, "MAX_IMAGE_BYTES", 16)
        payload = {"text": "x",
                   "image_b64": base64.b64encode(b"z" * 64).decode()}
        status, body = _post(url + "/predict", payload)
        assert status == 413 and "image_b64" in body["error"]
        # batch path hits the same cap
        status, body = _post(url + "/predict_batch", {"items": [payload]})
        assert status == 413 and "image_b64" in body["error"]

    def test_metrics_endpoint(self, server):
        """/metrics: request/flush counters and latency percentiles track
        traffic — asserted as before/after deltas so the test is independent
        of how much traffic earlier tests in this class generated."""
        url, cfg = server

        def snap():
            with urllib.request.urlopen(url + "/metrics", timeout=10) as r:
                return json.loads(r.read())

        before = snap()
        status, _ = _post(url + "/predict", {"text": "metric me"})
        assert status == 200
        after = snap()
        assert after["requests_total"] == before["requests_total"] + 1
        assert after["flushes_total"] >= before["flushes_total"] + 1
        assert after["latency_ms"]["count"] >= 1
        assert after["latency_ms"]["p50"] > 0
        assert after["latency_ms"]["p99"] >= after["latency_ms"]["p50"]
        assert after["batch_size"]["max"] <= 2  # bucket cap
        assert after["uptime_s"] > 0
        # bad requests (400 in the handler) never reach the service, so
        # errors_total only counts service-level failures
        assert after["errors_total"] == before["errors_total"]

    def test_metrics_prometheus_format(self, server):
        """GET /metrics?format=prometheus (or an openmetrics/text Accept
        header) returns the exposition format with the same numbers the
        JSON snapshot carries."""
        url, cfg = server
        status, _ = _post(url + "/predict", {"text": "prometheus sample"})
        assert status == 200
        with urllib.request.urlopen(url + "/metrics", timeout=10) as r:
            js = json.loads(r.read())
        with urllib.request.urlopen(
                url + "/metrics?format=prometheus", timeout=10) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert f"d2r_requests_total {js['requests_total']}" in text
        assert f"d2r_flushes_total {js['flushes_total']}" in text
        # standard Prometheus summary convention: quantile in [0, 1]
        assert 'd2r_request_latency_ms{quantile="0.5"}' in text
        assert 'd2r_request_latency_ms{quantile="0.99"}' in text
        assert "# TYPE d2r_requests_total counter" in text
        # Accept-header negotiation (what a Prometheus scraper sends)
        req = urllib.request.Request(
            url + "/metrics",
            headers={"Accept": "application/openmetrics-text; version=1.0"})
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.headers["Content-Type"].startswith("text/plain")

    def test_concurrent_requests_share_launches(self, server):
        """Four parallel requests through the real stack all succeed and
        agree with a direct sequential call (padding rows can't leak)."""
        url, cfg = server
        payload = {"text": "identical request"}
        with cf.ThreadPoolExecutor(4) as pool:
            outs = list(pool.map(
                lambda _: _post(url + "/predict", payload), range(4)))
        assert all(s == 200 for s, _ in outs)
        probs = np.array([o["probs"] for _, o in outs])
        np.testing.assert_allclose(
            probs, np.broadcast_to(probs[0], probs.shape), atol=2e-5)

    def test_predict_batch(self, server):
        """/predict_batch: order-preserving bulk results that agree with
        the single-request path; malformed and oversize bodies get 400."""
        url, cfg = server
        texts = ["bulk one", "bulk two", "bulk one"]
        status, body = _post(url + "/predict_batch",
                             {"items": [{"text": t} for t in texts]})
        assert status == 200, body
        results = body["results"]
        assert len(results) == 3
        # identical inputs -> identical outputs, in order
        np.testing.assert_allclose(results[0]["probs"], results[2]["probs"],
                                   atol=2e-5)
        _, single = _post(url + "/predict", {"text": "bulk one"})
        np.testing.assert_allclose(results[0]["probs"], single["probs"],
                                   atol=2e-5)

        status, body = _post(url + "/predict_batch", {"items": []})
        assert status == 400 and "items" in body["error"]
        status, body = _post(url + "/predict_batch",
                             {"items": [{"text": "x"}, {"no_text": 1}]})
        assert status == 400
        status, body = _post(url + "/predict_batch",
                             {"items": [{"text": "x"}] * 513})
        assert status == 400 and "too many" in body["error"]

    def test_http_reload_swaps_model(self, server):
        """POST /reload hot-swaps to a same-geometry checkpoint with zero
        downtime: predictions change, counters tick, bad bodies get 400.
        Runs LAST in this class — it permanently swaps the fixture model."""
        url, cfg = server
        payload = {"text": "stable request for the swap check"}
        _, before = _post(url + "/predict", payload)

        status, body = _post(url + "/reload", {"not_load_path": 1})
        assert status == 400 and "load_path" in body["error"]

        status, body = _post(url + "/reload", {"load_path": "seed-7"})
        assert status == 200, body
        assert body["status"] == "reloaded"

        status, after = _post(url + "/predict", payload)
        assert status == 200
        assert not np.allclose(before["probs"], after["probs"], atol=1e-6), \
            "reload did not change the served parameters"
        with urllib.request.urlopen(url + "/metrics", timeout=10) as r:
            m = json.loads(r.read())
        assert m["reloads_total"] == 1

    def test_reload_under_concurrent_traffic(self, server):
        """Hot swap while requests are in flight: every predict during the
        swap must succeed (old or new model — never a 500/torn state), and
        the swap itself must land. Runs after test_http_reload_swaps_model
        (both permanently swap the fixture model)."""
        url, cfg = server
        stop = threading.Event()
        errors, codes = [], []

        def hammer():
            while not stop.is_set():
                try:
                    # generous timeout: the reload's factory compiles on the
                    # same single CPU core and can starve in-flight requests
                    # for tens of seconds on a loaded CI host — slow is
                    # fine, failed is not
                    status, body = _post(url + "/predict",
                                         {"text": "load during swap"},
                                         timeout=300)
                    codes.append(status)
                    if status != 200:
                        errors.append(body)
                    else:
                        assert len(body["probs"]) == cfg.num_classes
                except Exception as e:  # noqa: BLE001 — collected below
                    errors.append(repr(e))

        threads = [threading.Thread(target=hammer) for _ in range(2)]
        for t in threads:
            t.start()
        try:
            time.sleep(0.3)  # traffic flowing
            status, body = _post(url + "/reload", {"load_path": "seed-9"},
                                 timeout=300)
            assert status == 200, body
            time.sleep(0.3)  # traffic against the swapped model
        finally:
            stop.set()
            for t in threads:
                t.join(timeout=300)
        assert not errors, f"{len(errors)} failed during swap: {errors[:3]}"
        assert len(codes) >= 2 and all(c == 200 for c in codes)
