"""Server protocol tests: /v1/models, completions (sync+SSE), chat
completions with template, stop strings, validation errors, CORS, web UI.
(The reference has no server tests at all — SURVEY.md §4.)"""

import json
import threading
import urllib.error
import urllib.request

import pytest

from tests.fixtures import build_full_model_dir
from tinygpt_tpu.server.http import ServerConfig, TinyGPTServer
from tinygpt_tpu.server.utils import (
    StopStringStreamer,
    check_stop_strings,
    parse_inference_params,
    BadRequest,
)
from tinygpt_tpu.tokenizer.chat_template import CHATML_TEMPLATE


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("srv_model")
    build_full_model_dir(str(d), seed=3)
    srv = TinyGPTServer(ServerConfig(
        model_dir=str(d), host="127.0.0.1", port=0, dtype="float32",
        max_tokens=6,
        # gpt2 has no chat template & no ChatML tokens → force one via the
        # CLI-priority path so the chat endpoint is exercised too
        chat_template=CHATML_TEMPLATE,
    ))
    srv.prepare()
    import http.server

    srv._httpd = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), __import__(
            "tinygpt_tpu.server.http", fromlist=["_make_handler"]
        )._make_handler(srv)
    )
    port = srv._httpd.server_address[1]
    t = threading.Thread(target=srv._httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", srv
    srv._httpd.shutdown()
    srv.worker.stop()


def _post(url, path, body, raw=False):
    req = urllib.request.Request(
        url + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    resp = urllib.request.urlopen(req, timeout=120)
    if raw:
        return resp
    return json.loads(resp.read())


def _get(url, path):
    return json.loads(urllib.request.urlopen(url + path, timeout=30).read())


def test_models_endpoint(server):
    url, srv = server
    d = _get(url, "/v1/models")
    assert d["object"] == "list"
    m = d["data"][0]
    assert m["id"] == srv.model_id
    assert m["capabilities"]["completions"] is True
    assert m["capabilities"]["chat_completions"] is True


def test_completions_nonstream(server):
    url, _ = server
    d = _post(url, "/v1/completions",
              {"prompt": "Hello", "max_tokens": 4})
    c = d["choices"][0]
    assert isinstance(c["text"], str)
    assert c["finish_reason"] in ("length", "stop")
    u = d["usage"]
    assert u["prompt_tokens"] > 0
    assert u["total_tokens"] == u["prompt_tokens"] + u["completion_tokens"]
    assert u["completion_tokens"] <= 4


def test_completions_stream_sse(server):
    url, _ = server
    resp = _post(url, "/v1/completions",
                 {"prompt": "Hello", "max_tokens": 4, "stream": True},
                 raw=True)
    assert resp.headers["Content-Type"].startswith("text/event-stream")
    body = resp.read().decode()
    frames = [f for f in body.split("\n\n") if f.startswith("data: ")]
    assert frames[-1] == "data: [DONE]"
    payloads = [json.loads(f[6:]) for f in frames[:-1]]
    # last payload has finish_reason + usage
    assert payloads[-1]["choices"][0]["finish_reason"] in ("length", "stop")
    assert "usage" in payloads[-1]
    text = "".join(p["choices"][0].get("text", "") for p in payloads)
    assert isinstance(text, str)


def test_chat_completions_nonstream(server):
    url, _ = server
    d = _post(url, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "Hi there"}],
        "max_tokens": 4,
    })
    msg = d["choices"][0]["message"]
    assert msg["role"] == "assistant"
    assert isinstance(msg["content"], str)


def test_chat_multimodal_text_parts(server):
    url, _ = server
    d = _post(url, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "Hello "},
            {"type": "text", "text": "world"},
        ]}],
        "max_tokens": 2,
    })
    assert d["choices"][0]["finish_reason"] in ("length", "stop")


def test_chat_stream_role_then_deltas(server):
    url, _ = server
    resp = _post(url, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "Hi"}],
        "max_tokens": 3, "stream": True,
    }, raw=True)
    body = resp.read().decode()
    frames = [f for f in body.split("\n\n") if f.startswith("data: ")]
    assert frames[-1] == "data: [DONE]"
    first = json.loads(frames[0][6:])
    assert first["choices"][0]["delta"] == {"role": "assistant"}
    last = json.loads(frames[-2][6:])
    assert last["choices"][0]["finish_reason"] in ("length", "stop")
    assert "usage" in last


def test_validation_errors(server):
    url, _ = server
    for body, frag in [
        ({"prompt": 42}, "prompt"),
        ({"prompt": "x", "temperature": 9}, "temperature"),
        ({"prompt": "x", "max_tokens": -1}, "max_tokens"),
        ({"prompt": "x", "stop": [3]}, "stop"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(url, "/v1/completions", body)
        assert exc.value.code == 400
        err = json.loads(exc.value.read())
        assert frag in err["error"]["message"]


def test_chat_missing_messages(server):
    url, _ = server
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(url, "/v1/chat/completions", {"messages": []})
    assert exc.value.code == 400


def test_unknown_route_404(server):
    url, _ = server
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(url, "/v1/embeddings", {})
    assert exc.value.code == 404


def test_web_ui_served(server):
    url, _ = server
    html = urllib.request.urlopen(url + "/", timeout=30).read().decode()
    assert "tinygpt_tpu" in html and "<html" in html


def test_health(server):
    url, _ = server
    assert _get(url, "/health")["status"] == "ok"


def test_concurrent_requests_interleave(server):
    """Continuous batching: several simultaneous requests all complete
    correctly (they share decode steps instead of queueing whole-request)."""
    import concurrent.futures

    url, srv = server
    assert type(srv.worker).__name__ == "BatchedInferenceWorker"

    def one(i):
        return _post(url, "/v1/completions",
                     {"prompt": f"request number {i}", "max_tokens": 5})

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        results = list(ex.map(one, range(4)))
    for d in results:
        assert d["choices"][0]["finish_reason"] in ("length", "stop")
        assert d["usage"]["completion_tokens"] <= 5


def test_sequential_scheduler_mode(tmp_path):
    """The reference-style one-at-a-time worker stays available."""
    import http.server as hs
    import threading as th

    from tests.fixtures import build_full_model_dir
    from tinygpt_tpu.server.http import (
        ServerConfig,
        TinyGPTServer,
        _make_handler,
    )

    d = str(tmp_path / "m")
    build_full_model_dir(d, seed=4)
    srv = TinyGPTServer(ServerConfig(
        model_dir=d, dtype="float32", max_tokens=4, scheduler="sequential",
    ))
    srv.prepare()
    assert type(srv.worker).__name__ == "InferenceWorker"
    httpd = hs.ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(srv))
    port = httpd.server_address[1]
    t = th.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        out = _post(f"http://127.0.0.1:{port}", "/v1/completions",
                    {"prompt": "hello", "max_tokens": 3})
        assert out["usage"]["completion_tokens"] <= 3
    finally:
        httpd.shutdown()
        srv.worker.stop()


# -- stop-string machinery (pure) -------------------------------------------

def test_check_stop_strings():
    assert check_stop_strings("hello world", ["world", "lo"]) == (3, "lo")
    assert check_stop_strings("abc", ["x"]) == (None, None)


def test_stop_streamer_split_across_chunks():
    st = StopStringStreamer(["STOP"], include_stop=False)
    out = st.push("hello ST")
    assert "ST" not in out  # held back
    out += st.push("OP world")
    assert st.stopped and st.matched == "STOP"
    assert out == "hello "


def test_stop_streamer_include_stop():
    st = StopStringStreamer(["END"], include_stop=True)
    out = st.push("abcEND xyz")
    assert out == "abcEND"


def test_stop_streamer_no_stop_flush():
    st = StopStringStreamer(["LONGSTOP"])
    acc = st.push("abcdefgh") + st.flush()
    assert acc == "abcdefgh"


def test_parse_inference_params_defaults():
    p = parse_inference_params({})
    assert p.sampler.is_greedy and not p.stream


def test_parse_inference_params_max_completion_tokens_alias():
    p = parse_inference_params({"max_completion_tokens": 7})
    assert p.max_tokens == 7
    with pytest.raises(BadRequest):
        parse_inference_params({"top_k": -1})
