"""HTTP serving API: end-to-end over a live socket with the tiny model."""

import base64
import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lhrs_bot_tpu.models import VLMConfig, init_vlm_params
from lhrs_bot_tpu.serve.api import ServingFrontend, make_handler
from lhrs_bot_tpu.serve.engine import GenerationEngine
from lhrs_bot_tpu.serve.scheduler import ContinuousBatchingScheduler

from .fake_tokenizer import FakeTokenizer


@pytest.fixture(scope="module")
def server():
    cfg = VLMConfig.tiny_test(stage=0)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    engine = GenerationEngine(cfg, params, max_seq_len=96,
                              compute_dtype=jnp.float32,
                              cache_dtype=jnp.float32)
    sched = ContinuousBatchingScheduler(
        cfg, params, engine.llama_params, max_batch=2, max_seq_len=96,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32,
        prompt_bucket=16)
    frontend = ServingFrontend(sched, FakeTokenizer(cfg.llama.vocab_size),
                               image_size=28)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(frontend))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()
    frontend.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


class TestFrontendRobustness:
    class _FlakySched:
        """Duck-typed scheduler: first admit raises, later ones succeed."""

        def __init__(self):
            self.active = np.zeros(2, bool)
            self.slot_req = [None, None]
            self.calls = 0

        def admit(self, reqs):
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("boom")
            for r in reqs:
                r.output_ids = [5]
                r.done = True
            return len(reqs)

        def step(self, waiting=0):
            return 0

    def test_worker_survives_scheduler_error(self):
        sched = self._FlakySched()
        frontend = ServingFrontend(sched, FakeTokenizer(), image_size=28)
        try:
            first = frontend.generate_blocking("a", None, 4, timeout=30)
            assert first["finish_reason"] == "error"
            assert "boom" in first["error"]
            # the worker loop must still be alive and serve the next request
            second = frontend.generate_blocking("b", None, 4, timeout=30)
            assert second["finish_reason"] == "stop"
        finally:
            frontend.shutdown()

    def test_build_request_single_image_invariant(self):
        sched = self._FlakySched()
        frontend = ServingFrontend(sched, FakeTokenizer(), image_size=28)
        try:
            img = np.zeros((28, 28, 3), np.uint8)
            req = frontend.build_request(
                "<image> a <image> b <image>", img, 4)
            assert int((req.input_ids < 0).sum()) == 1
            req2 = frontend.build_request("<image> hello <image>", None, 4)
            assert int((req2.input_ids < 0).sum()) == 0
        finally:
            frontend.shutdown()


class TestFrontendCancel:
    def test_cancel_in_flight_request(self):
        import time

        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        engine = GenerationEngine(cfg, params, max_seq_len=96,
                                  compute_dtype=jnp.float32,
                                  cache_dtype=jnp.float32)
        sched = ContinuousBatchingScheduler(
            cfg, params, engine.llama_params, max_batch=2, max_seq_len=96,
            compute_dtype=jnp.float32, cache_dtype=jnp.float32,
            eos_token_id=-1, prompt_bucket=16, tokens_per_tick=1)
        frontend = ServingFrontend(sched, FakeTokenizer(cfg.llama.vocab_size),
                               image_size=28)
        try:
            req = frontend.build_request("count to one thousand", None, 80)
            ev = frontend.submit(req)
            deadline = time.monotonic() + 60
            while not req.output_ids and time.monotonic() < deadline:
                time.sleep(0.01)
            assert req.output_ids, "generation never started"
            assert frontend.cancel(req.uid)
            assert ev.wait(timeout=30)
            assert req.done and req.cancelled
            assert len(req.output_ids) < 80
            assert not frontend.cancel(req.uid)  # already finished
            # the freed slot still serves new work
            out = frontend.generate_blocking("hello", None, 3, timeout=60)
            assert out["finish_reason"] == "stop"
        finally:
            frontend.shutdown()

    def test_cancel_unknown_uid(self):
        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        engine = GenerationEngine(cfg, params, max_seq_len=64,
                                  compute_dtype=jnp.float32,
                                  cache_dtype=jnp.float32)
        sched = ContinuousBatchingScheduler(
            cfg, params, engine.llama_params, max_batch=1, max_seq_len=64,
            compute_dtype=jnp.float32, cache_dtype=jnp.float32,
            prompt_bucket=16)
        frontend = ServingFrontend(sched, FakeTokenizer(cfg.llama.vocab_size),
                               image_size=28)
        try:
            assert not frontend.cancel(12345)
        finally:
            frontend.shutdown()


class TestServingAPI:
    def test_health(self, server):
        with urllib.request.urlopen(server + "/health", timeout=30) as resp:
            data = json.loads(resp.read())
        assert data["status"] == "ok"

    def test_generate_text_only(self, server):
        status, data = _post(server, {"prompt": "describe the scene",
                                      "max_new_tokens": 4})
        assert status == 200
        assert data["finish_reason"] == "stop"
        assert isinstance(data["tokens"], list)

    def test_generate_with_image(self, server):
        from PIL import Image

        img = Image.fromarray(np.zeros((32, 32, 3), np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        status, data = _post(server, {
            "prompt": "what is this",
            "image_b64": base64.b64encode(buf.getvalue()).decode(),
            "max_new_tokens": 3})
        assert status == 200
        assert data["finish_reason"] == "stop"

    def test_concurrent_requests(self, server):
        results = []

        def call(i):
            results.append(_post(server, {"prompt": f"query {i}",
                                          "max_new_tokens": 3}))

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 4
        assert all(s == 200 for s, _ in results)

    def test_generate_stream(self, server):
        req = urllib.request.Request(
            server + "/generate_stream",
            data=json.dumps({"prompt": "stream me",
                             "max_new_tokens": 4}).encode(),
            headers={"Content-Type": "application/json"})
        lines = []
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.headers["Content-Type"] == "application/x-ndjson"
            for raw in resp:
                lines.append(json.loads(raw))
        assert lines[-1]["done"] is True
        assert lines[-1]["finish_reason"] == "stop"
        toks = [l["token"] for l in lines[:-1]]
        assert 1 <= len(toks) <= 4
        # deltas concatenate to the final text
        assert "".join(l["text_delta"] for l in lines[:-1]) == \
            lines[-1]["text"]

    def test_stream_disconnect_cancels(self):
        """Closing the streaming connection mid-generation frees the slot."""
        import socket
        import time

        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        engine = GenerationEngine(cfg, params, max_seq_len=96,
                                  compute_dtype=jnp.float32,
                                  cache_dtype=jnp.float32)
        sched = ContinuousBatchingScheduler(
            cfg, params, engine.llama_params, max_batch=1, max_seq_len=96,
            compute_dtype=jnp.float32, cache_dtype=jnp.float32,
            eos_token_id=-1, prompt_bucket=16, tokens_per_tick=1)
        frontend = ServingFrontend(sched, FakeTokenizer(cfg.llama.vocab_size),
                               image_size=28)
        httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                    make_handler(frontend))
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            body = json.dumps({"prompt": "never ending",
                               "max_new_tokens": 80}).encode()
            s = socket.create_connection(("127.0.0.1", httpd.server_port),
                                         timeout=60)
            s.sendall(b"POST /generate_stream HTTP/1.1\r\n"
                      b"Host: x\r\nContent-Type: application/json\r\n"
                      + f"Content-Length: {len(body)}\r\n\r\n".encode()
                      + body)
            s.recv(512)  # headers + first chunk(s) started flowing
            s.close()    # client walks away
            deadline = time.monotonic() + 60
            while sched.active.any() and time.monotonic() < deadline:
                time.sleep(0.05)
            assert not sched.active.any(), "slot never freed on disconnect"
        finally:
            httpd.shutdown()
            frontend.shutdown()

    def test_bad_request(self, server):
        status, data = _post(server, {"no_prompt": True})
        assert status == 400
        assert "error" in data

    def test_per_request_sampling_over_http(self, server):
        """temperature/top_p ride the JSON body: explicit temperature=0
        equals the default greedy result; a hot temperature diverges
        across calls (the tick program samples per slot)."""
        base = {"prompt": "describe the scene", "max_new_tokens": 6}
        _, greedy_default = _post(server, dict(base))
        _, greedy_explicit = _post(server, dict(base, temperature=0.0))
        assert greedy_default["tokens"] == greedy_explicit["tokens"]
        hot = {tuple(_post(server, dict(base, temperature=20.0,
                                        top_p=1.0))[1]["tokens"])
               for _ in range(4)}
        assert len(hot) > 1, "temperature=20 never diverged over HTTP"

    def test_vocab_mismatch_rejected(self):
        """A tokenizer emitting ids beyond the model vocab must 400 at
        request build: out-of-vocab embedding rows are NaN-filled and the
        NaN logits argmax to token 0 forever — a silent-garbage failure."""
        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        engine = GenerationEngine(cfg, params, max_seq_len=64,
                                  compute_dtype=jnp.float32,
                                  cache_dtype=jnp.float32)
        sched = ContinuousBatchingScheduler(
            cfg, params, engine.llama_params, max_batch=1, max_seq_len=64,
            compute_dtype=jnp.float32, cache_dtype=jnp.float32,
            prompt_bucket=16)
        frontend = ServingFrontend(sched, FakeTokenizer(vocab_size=2000),
                                   image_size=28)
        try:
            # enough distinct words that at least one hashes >= 256 with
            # overwhelming probability under any PYTHONHASHSEED
            words = " ".join(f"w{i}xq" for i in range(16))
            with pytest.raises(ValueError, match="vocab"):
                frontend.build_request(words, None, 4)
        finally:
            frontend.shutdown()

    def test_generate_multi_image(self, server):
        """images_b64 list: two images, markers auto-inserted, runs to
        completion through the batched scheduler."""
        from PIL import Image

        def b64(arr):
            img = Image.fromarray(arr)
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return base64.b64encode(buf.getvalue()).decode()

        rng = np.random.default_rng(3)
        imgs = [rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)
                for _ in range(2)]
        status, data = _post(server, {
            "prompt": "compare <image> with <image>",
            "images_b64": [b64(i) for i in imgs],
            "max_new_tokens": 3})
        assert status == 200
        assert data["finish_reason"] == "stop"
        assert 1 <= len(data["tokens"]) <= 3

    def test_stats_route(self, server):
        with urllib.request.urlopen(server + "/stats", timeout=30) as r:
            data = json.loads(r.read())
        assert data["status"] == "ok"
        assert "active" in data and "queued" in data

    def test_chat_completions(self, server):
        """OpenAI-compatible endpoint: multi-turn messages, usage counts,
        choices envelope."""
        body = {"model": "lhrs", "max_tokens": 4, "messages": [
            {"role": "system", "content": "you are a remote sensing bot"},
            {"role": "user", "content": "hello there"},
            {"role": "assistant", "content": "hi"},
            {"role": "user", "content": "what can you see"}]}
        req = urllib.request.Request(
            server + "/v1/chat/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            data = json.loads(resp.read())
        assert data["object"] == "chat.completion"
        choice = data["choices"][0]
        assert choice["message"]["role"] == "assistant"
        assert choice["finish_reason"] in ("stop", "length")
        u = data["usage"]
        assert u["total_tokens"] == (u["prompt_tokens"]
                                     + u["completion_tokens"])
        assert 1 <= u["completion_tokens"] <= 4

    def test_chat_completions_stream_and_vision(self, server):
        """SSE stream with a vision content part (data: URL image)."""
        from PIL import Image as PILImage

        buf = io.BytesIO()
        PILImage.fromarray(np.zeros((24, 24, 3), np.uint8)).save(
            buf, format="PNG")
        data_url = ("data:image/png;base64,"
                    + base64.b64encode(buf.getvalue()).decode())
        body = {"stream": True, "max_tokens": 3, "messages": [
            {"role": "user", "content": [
                {"type": "text", "text": "describe this"},
                {"type": "image_url", "image_url": {"url": data_url}}]}]}
        req = urllib.request.Request(
            server + "/v1/chat/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        events = []
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.headers["Content-Type"] == "text/event-stream"
            for raw in resp:
                raw = raw.strip()
                if not raw.startswith(b"data: "):
                    continue
                payload = raw[len(b"data: "):]
                if payload == b"[DONE]":
                    events.append("DONE")
                else:
                    events.append(json.loads(payload))
        assert events[-1] == "DONE"
        assert events[-2]["choices"][0]["finish_reason"] in ("stop",
                                                             "length")
        deltas = [e["choices"][0]["delta"].get("content", "")
                  for e in events[:-2] if e != "DONE"]
        assert any(deltas)

    def test_chat_bad_roles(self, server):
        body = {"messages": [{"role": "user", "content": "a"},
                             {"role": "assistant", "content": "b"}]}
        req = urllib.request.Request(
            server + "/v1/chat/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=60):
                status = 200
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 400  # last message must be role=user

    def test_warmup(self):
        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        engine = GenerationEngine(cfg, params, max_seq_len=64,
                                  compute_dtype=jnp.float32,
                                  cache_dtype=jnp.float32)
        sched = ContinuousBatchingScheduler(
            cfg, params, engine.llama_params, max_batch=2, max_seq_len=64,
            compute_dtype=jnp.float32, cache_dtype=jnp.float32,
            prompt_bucket=16)
        frontend = ServingFrontend(sched, FakeTokenizer(cfg.llama.vocab_size),
                                   image_size=28)
        try:
            dt = frontend.warmup(prompt_lens=(8, 24), batches=(1, 2),
                                 max_new=3)
            assert dt > 0
            assert not sched.active.any()
            # serving still healthy after warmup
            out = frontend.generate_blocking("hello", None, 3, timeout=60)
            assert out["finish_reason"] == "stop"
        finally:
            frontend.shutdown()

    def test_unknown_route(self, server):
        try:
            with urllib.request.urlopen(server + "/nope", timeout=30) as r:
                status = r.status
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 404
