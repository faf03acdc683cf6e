#!/usr/bin/env python
"""HTTP-level serving latency A/B: adaptive probe vs fixed coalescing wait.

Measures what a real client sees for SPORADIC single requests (the low-QPS
regime the MicroBatcher's adaptive probe targets): full HTTP round-trip
through ThreadingHTTPServer -> InferenceService -> MicroBatcher ->
Predictor. Runs TWO services on the same predictor — probe_ms default
(max_wait/10) vs probe_ms=max_wait (the old fixed-window behaviour) — with
requests INTERLEAVED A/B/A/B in one session so machine-speed drift lands in
both arms equally (round-4 verdict: the sequential n=19 arms wouldn't
survive a t-test). Reports p50/p90/mean + spread per mode, plus a burst
check ASSERTING coalescing still works with the probe on.

CPU (tiny) by default so it can run anywhere; --flagship on the TPU
records the production-geometry number (the tunnel's ~27 ms RTT is in
both arms, so the delta isolates the batcher wait).
"""

import argparse
import json
import os
import statistics
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _one_request(url, body, i):
    req = urllib.request.Request(
        url + "/predict", data=body,
        headers={"Content-Type": "application/json"}, method="POST")
    t0 = time.perf_counter()
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            r.read()
    except urllib.error.HTTPError as e:
        raise AssertionError(
            f"request {i}: HTTP {e.code}: {e.read()[:400]}") from e
    return time.perf_counter() - t0


def _http_warm(url, attempts=40, retry_s=15.0):
    """One throwaway request per arm BEFORE timing. A cold TPU compile at
    request time can exceed the service's 30 s result timeout (HTTP 500
    TimeoutError) while the compile keeps running in the batcher thread —
    retry until the program is hot instead of failing the A/B."""
    body = json.dumps({"text": "warmup"}).encode()
    for a in range(attempts):
        try:
            _one_request(url, body, -1)
            return
        except AssertionError as e:
            if "TimeoutError" not in str(e) or a == attempts - 1:
                raise
            print(f"warm {url}: server still compiling "
                  f"(attempt {a + 1}), retrying in {retry_s:.0f}s", flush=True)
            time.sleep(retry_s)


def _measure_interleaved(urls, n, gap_s):
    """Sporadic single requests, the arms INTERLEAVED request-by-request
    (A,B,A,B,...) so any within-session drift affects both arms equally.
    ``urls`` is {mode: url}; requires n >= 2 (the first sample per arm is
    dropped as connection/bucket warmup)."""
    assert n >= 2, "need n >= 2: the warmup sample per arm is dropped"
    body = json.dumps({"text": "latency probe request"}).encode()
    times = {mode: [] for mode in urls}
    for i in range(n):
        for mode, url in urls.items():
            times[mode].append(_one_request(url, body, i))
            time.sleep(gap_s)
    out = {}
    for mode, ts in times.items():
        xs = sorted(ts[1:])  # drop the first (connection/bucket warm)
        out[mode] = {
            "p50_ms": round(xs[len(xs) // 2] * 1e3, 2),
            "p90_ms": round(xs[min(int(len(xs) * 0.9), len(xs) - 1)] * 1e3, 2),
            "mean_ms": round(statistics.mean(xs) * 1e3, 2),
            "stdev_ms": round(statistics.stdev(xs) * 1e3, 2),
            "n": len(xs)}
    return out


def _burst(url, k):
    """k concurrent requests; returns flushes observed via /metrics."""
    with urllib.request.urlopen(url + "/metrics", timeout=30) as r:
        before = json.loads(r.read())["flushes_total"]
    body = json.dumps({"text": "burst"}).encode()
    errs = []

    def one():
        try:
            req = urllib.request.Request(
                url + "/predict", data=body,
                headers={"Content-Type": "application/json"}, method="POST")
            with urllib.request.urlopen(req, timeout=60) as r:
                assert r.status == 200
                r.read()
        except Exception as e:  # noqa: BLE001
            errs.append(repr(e))

    ts = [threading.Thread(target=one) for _ in range(k)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    with urllib.request.urlopen(url + "/metrics", timeout=30) as r:
        after = json.loads(r.read())["flushes_total"]
    return after - before


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", default=100, type=int,
                    help="requests per arm (interleaved; >= 2 because the "
                         "warmup sample per arm is dropped)")
    ap.add_argument("--gap_ms", default=60.0, type=float,
                    help="gap between sporadic requests (>> max_wait)")
    ap.add_argument("--max_wait_ms", default=5.0, type=float)
    ap.add_argument("--flagship", action="store_true",
                    help="production geometry (bf16, pallas) — for the "
                         "TPU record; default tiny/cpu-friendly")
    ap.add_argument("--device", default=None, choices=["cpu"],
                    help="force the CPU backend")
    ap.add_argument("--out", default="HTTP_LATENCY_AB.json")
    args = ap.parse_args()
    if args.n < 2:
        ap.error("--n must be >= 2 (the warmup sample per arm is dropped)")

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from d2r_tpu.config import D2RConfig, tiny_test_config
    from d2r_tpu.data.dataset import synthetic_batch
    from d2r_tpu.data.tokenizer import load_tokenizer
    from d2r_tpu.models.unimo import D2RClassifier
    from d2r_tpu.serve import Predictor
    from d2r_tpu.server import InferenceService, make_server
    from d2r_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.flagship:
        cfg = D2RConfig(DR_step=4, max_seq=64, compute_dtype="bfloat16",
                        use_pallas=True)
        buckets = (1, 8)
    else:
        cfg = tiny_test_config()
        buckets = (1, 8)

    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    b = synthetic_batch(1, cfg.max_seq, vc.image_size,
                        vocab_size=cfg.text_config().vocab_size, seed=0)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.asarray(b["input_ids"]),
        jnp.asarray(b["attention_mask"]), jnp.asarray(b["token_type_ids"]),
        jnp.asarray(b["labels"]), jnp.asarray(b["pixel_values"]))
    pred = Predictor(cfg, variables, batch_buckets=buckets,
                     seq_buckets=(cfg.max_seq,))
    pred.warmup(pixel_dtype=jnp.uint8)
    tok = load_tokenizer("nonexistent-tiny",
                         vocab_size=cfg.text_config().vocab_size)

    # both arms live simultaneously on the same predictor, requests
    # interleaved one-by-one — within-session drift cancels in the delta
    arms = {}
    try:
        for mode, probe_ms in (("adaptive", None),
                               ("fixed", args.max_wait_ms)):
            svc = InferenceService(pred, tok, raw_uint8=True,
                                   max_wait_ms=args.max_wait_ms,
                                   probe_ms=probe_ms)
            httpd = make_server(svc, "127.0.0.1", 0)
            threading.Thread(target=httpd.serve_forever, daemon=True).start()
            arms[mode] = (svc, httpd,
                          f"http://127.0.0.1:{httpd.server_address[1]}")
        for _, _, url in arms.values():
            _http_warm(url)
        results = _measure_interleaved(
            {m: u for m, (_, _, u) in arms.items()}, args.n,
            args.gap_ms / 1e3)
        for mode in results:
            print(f"{mode:>8}: {results[mode]}", flush=True)
        # coalescing check: 8 concurrent requests must share flushes even
        # with the probe on — ASSERTED, not just recorded (round-4 advice:
        # a coalescing regression to 8 solo flushes must fail this tool)
        flushes = _burst(arms["adaptive"][2], 8)
        assert flushes <= 2, (
            f"adaptive probe broke coalescing: 8 concurrent requests took "
            f"{flushes} flushes (expected <= 2)")
        results["burst8_flushes_adaptive"] = flushes
    finally:
        for svc, httpd, _ in arms.values():
            httpd.shutdown()
            svc.close()

    delta = results["fixed"]["p50_ms"] - results["adaptive"]["p50_ms"]
    payload = {
        "metric": "http_single_request_p50_ms",
        "value": results,
        "p50_delta_ms_fixed_minus_adaptive": round(delta, 2),
        "max_wait_ms": args.max_wait_ms,
        "flagship": args.flagship,
        "backend": jax.default_backend(),
    }
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
