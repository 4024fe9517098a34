"""HTTP serving layer (serving.py): micro-batching + endpoint behavior.

The reference has no serving path at all (deployment = rerunning
``main.py --eval``); these tests pin the framework's production surface:
one warm fixed-shape program behind a stdlib HTTP server, concurrent
requests grouped into device batches.
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from scl_deepfake_audio_detection_tpu.dsp.pad import pad_eval
from scl_deepfake_audio_detection_tpu.serving import (
    MicroBatcher,
    make_server,
)
from scl_deepfake_audio_detection_tpu.utils.audio_io import load_audio, save_wav

pytestmark = pytest.mark.slow  # heavy family: excluded from the smoke gate

CUT = 1000
SR = 16000


def fake_batch_score(block):
    """Deterministic per-row stand-in for the jitted scorer: [sb, 2]."""
    m = block.mean(axis=1).astype(np.float64)
    return np.stack([-np.abs(m), np.tanh(m * 100.0)], axis=1).astype(np.float32)


def expected_row(row):
    return fake_batch_score(row[None, :])[0]


# --------------------------------------------------------------------------
# MicroBatcher
# --------------------------------------------------------------------------


def test_microbatcher_groups_and_matches():
    """Concurrent submits share ONE fixed-shape forward; per-row values
    equal the direct function of that row (batching must not mix rows)."""
    shapes = []

    def spy(block):
        shapes.append(block.shape)
        return fake_batch_score(block)

    b = MicroBatcher(spy, cut=CUT, batch_size=4, max_wait_ms=300)
    try:
        rng = np.random.default_rng(0)
        rows = [rng.normal(size=CUT).astype(np.float32) * 0.1 for _ in range(4)]
        handles = [b.submit_async(r) for r in rows]
        outs = [h.wait() for h in handles]
        for r, o in zip(rows, outs):
            np.testing.assert_allclose(o, expected_row(r), atol=1e-6)
        assert shapes == [(4, CUT)]  # one batch, fixed shape
        assert b.batches == 1 and b.served == 4
        # a lone request still runs (partial batch padded to the same shape)
        lone = b.submit(rows[0])
        np.testing.assert_allclose(lone, expected_row(rows[0]), atol=1e-6)
        assert shapes[-1] == (4, CUT)
    finally:
        b.close()


def test_microbatcher_rejects_bad_row_and_wrong_batch_size():
    b = MicroBatcher(fake_batch_score, cut=CUT, batch_size=2, max_wait_ms=0)
    try:
        with pytest.raises(ValueError):
            b.submit(np.zeros(CUT + 1, np.float32))
    finally:
        b.close()
    with pytest.raises(ValueError):
        MicroBatcher(fake_batch_score, cut=CUT, batch_size=0)


def test_microbatcher_submit_after_close_raises():
    b = MicroBatcher(fake_batch_score, cut=CUT, batch_size=2, max_wait_ms=0)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(np.zeros(CUT, np.float32))
    with pytest.raises(RuntimeError, match="closed"):
        b.submit_long(np.zeros(CUT * 2, np.float32))


def test_microbatcher_error_propagates_then_recovers():
    """A scoring failure reaches every waiter as RuntimeError; the worker
    survives and serves the next request."""
    state = {"fail": True}

    def flaky(block):
        if state["fail"]:
            raise FloatingPointError("nan in scores")
        return fake_batch_score(block)

    b = MicroBatcher(flaky, cut=CUT, batch_size=2, max_wait_ms=0)
    try:
        with pytest.raises(RuntimeError, match="nan in scores"):
            b.submit(np.zeros(CUT, np.float32))
        state["fail"] = False
        out = b.submit(np.ones(CUT, np.float32) * 0.01)
        np.testing.assert_allclose(
            out, expected_row(np.ones(CUT, np.float32) * 0.01), atol=1e-6
        )
    finally:
        b.close()


def test_microbatcher_pipelines_deferred_results():
    """batch_score may return an UN-read result (a jax device array in
    production): the worker keeps two batches in flight, reading back via
    np.asarray.  Per-row values must still be exact, a readback-time
    failure must reach exactly its own group's waiters, and the worker
    must keep serving afterwards."""

    class Deferred:
        def __init__(self, arr, fail):
            self.arr, self.fail = arr, fail

        def __array__(self, dtype=None, copy=None):
            if self.fail:
                raise FloatingPointError("readback nan")
            return self.arr

    calls = {"n": 0}

    def deferred_score(block):
        calls["n"] += 1
        return Deferred(fake_batch_score(block), fail=calls["n"] == 2)

    b = MicroBatcher(deferred_score, cut=CUT, batch_size=1, max_wait_ms=0)
    try:
        rng = np.random.default_rng(1)
        rows = [rng.normal(size=CUT).astype(np.float32) * 0.1
                for _ in range(5)]
        handles = [b.submit_async(r) for r in rows]
        failed, ok = 0, 0
        for r, h in zip(rows, handles):
            try:
                np.testing.assert_allclose(h.wait(), expected_row(r),
                                           atol=1e-6)
                ok += 1
            except RuntimeError as e:
                assert "readback nan" in str(e)
                failed += 1
        assert (ok, failed) == (4, 1)
        assert b.errors == 1 and b.served == 5
        assert b.readback_s >= 0.0 and b.dispatch_s >= 0.0
    finally:
        b.close()


def test_microbatcher_long_audio_matches_direct():
    """submit_long == score_long_audio on the same scorer (chunked crops
    through the same [batch, cut] program, worker-serialized)."""
    from scl_deepfake_audio_detection_tpu.train.scoring import score_long_audio

    rng = np.random.default_rng(3)
    wav = rng.normal(size=int(CUT * 2.5)).astype(np.float32) * 0.1
    b = MicroBatcher(fake_batch_score, cut=CUT, batch_size=4, max_wait_ms=0)
    try:
        got = b.submit_long(wav)
    finally:
        b.close()
    want = score_long_audio(wav, fake_batch_score, window=CUT, batch=4)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-6)


# --------------------------------------------------------------------------
# HTTP server
# --------------------------------------------------------------------------


@pytest.fixture
def http_server():
    """Ephemeral-port server over the fake scorer; yields (base_url, server)."""
    server = make_server(
        fake_batch_score,
        cut=CUT,
        port=0,
        batch_size=4,
        # generous co-rider window: the batch-count pins below must not
        # flake when the CI core is contended
        max_wait_ms=100,
        padding_type="zero",
        model_tag="fake",
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    try:
        yield f"http://{host}:{port}", server
    finally:
        server.shutdown()
        server.close()
        t.join(timeout=10)


def _post(url, data, headers=None, timeout=240):
    # generous: the e2e test's first request pays the tiny-model XLA
    # compile, which can take minutes on a contended CI core
    req = urllib.request.Request(url, data=data, headers=headers or {})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post_err(url, data, headers=None):
    try:
        _post(url, data, headers)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())
    raise AssertionError("expected an HTTP error")


def test_http_score_json_path_and_upload(http_server, tmp_path):
    base, server = http_server
    rng = np.random.default_rng(7)
    wav = (rng.normal(size=720) * 0.2).astype(np.float32)
    p = str(tmp_path / "clip.wav")
    save_wav(p, wav, SR)
    want = float(expected_row(pad_eval(load_audio(p), "zero", CUT))[1])

    # JSON {"path": ...} (server-local file)
    code, out = _post(
        base + "/score",
        json.dumps({"path": p, "id": "r1"}).encode(),
        {"Content-Type": "application/json"},
    )
    assert code == 200 and out["id"] == "r1"
    assert out["score"] == pytest.approx(want, abs=1e-6)
    assert out["log_probs"][1] == pytest.approx(want, abs=1e-6)

    # raw bytes upload (decoded via the same chain, suffix from X-Filename)
    code, out2 = _post(
        base + "/score",
        open(p, "rb").read(),
        {"Content-Type": "audio/wav", "X-Filename": "clip.wav"},
    )
    assert code == 200 and out2["id"] == "clip.wav"
    assert out2["score"] == pytest.approx(want, abs=1e-6)

    code, health = _get(base + "/healthz")
    assert code == 200 and health["status"] == "ok"
    assert health["model"] == "fake" and health["cut"] == CUT
    assert health["served"] >= 2 and health["batches"] >= 2

    # Prometheus text exposition mirrors the same counters
    with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    assert f"scl_serve_requests_total {health['served']}" in text
    assert f"scl_serve_batches_total {health['batches']}" in text
    assert "scl_serve_errors_total 0" in text
    assert f"scl_serve_batch_capacity 4" in text
    assert "# TYPE scl_serve_requests_total counter" in text


def test_http_client_errors(http_server, tmp_path):
    base, _ = http_server
    # bad JSON -> 400
    code, out = _post_err(
        base + "/score", b"{nope", {"Content-Type": "application/json"}
    )
    assert code == 400 and "invalid JSON" in out["error"]
    # JSON without a path -> 400
    code, out = _post_err(
        base + "/score", b"{}", {"Content-Type": "application/json"}
    )
    assert code == 400 and "path" in out["error"]
    # nonexistent server-local file -> 400
    code, out = _post_err(
        base + "/score",
        json.dumps({"path": str(tmp_path / "missing.wav")}).encode(),
        {"Content-Type": "application/json"},
    )
    assert code == 400 and "cannot decode" in out["error"]
    # empty upload body -> 400
    code, out = _post_err(base + "/score", b"", {"Content-Type": "audio/wav"})
    assert code == 400
    # undecodable upload bytes -> 400
    code, out = _post_err(
        base + "/score", b"not audio at all", {"Content-Type": "audio/wav"}
    )
    assert code == 400 and "cannot decode" in out["error"]
    # unknown route -> 404
    code, out = _post_err(base + "/nope", b"{}")
    assert code == 404
    # oversized Content-Length -> 400 before any buffering
    code, out = _post_err(
        base + "/score", b"x",
        {"Content-Type": "audio/wav", "Content-Length": str(1 << 30)},
    )
    assert code == 400 and "exceeds" in out["error"]


def test_microbatcher_close_idempotent_and_drains_stragglers():
    """close() twice is safe; a request stuck in the queue after the worker
    exits (the submit/close race window) gets an error instead of a forever-
    blocked wait()."""
    from scl_deepfake_audio_detection_tpu import serving as sv

    b = MicroBatcher(fake_batch_score, cut=CUT, batch_size=2, max_wait_ms=0)
    # simulate the race: the worker sees _STOP and exits while a request is
    # still (or becomes) enqueued behind it
    b._q.put(sv._STOP)
    b._worker.join(timeout=10)
    assert not b._worker.is_alive()
    straggler = sv._Request(np.zeros(CUT, np.float32))
    b._q.put(straggler)
    b.close()
    with pytest.raises(RuntimeError, match="closed before scoring"):
        straggler.wait()
    assert b.errors == 1
    b.close()  # idempotent


def _raw_http_roundtrip(base, request_bytes):
    """Send raw bytes on one socket; return (head, closed_after_response)."""
    import socket
    from urllib.parse import urlparse

    u = urlparse(base)
    with socket.create_connection((u.hostname, u.port), timeout=30) as s:
        s.sendall(request_bytes)
        s.settimeout(30)
        data = b""
        while b"\r\n\r\n" not in data:
            chunk = s.recv(4096)
            if not chunk:
                break
            data += chunk
        head, _, rest = data.partition(b"\r\n\r\n")
        # read any body already buffered, then check for EOF = server closed
        try:
            while True:
                chunk = s.recv(4096)
                if not chunk:
                    return head, True
        except socket.timeout:
            return head, False


def test_http_undrained_body_closes_connection(http_server):
    """Replying without draining the body (404 route / oversized length) must
    close the connection — otherwise leftover body bytes desync keep-alive
    and get parsed as the next request."""
    base, _ = http_server
    # 404 with an unread body on a keep-alive connection
    body = b"x" * 100
    req = (
        b"POST /nope HTTP/1.1\r\nHost: t\r\nConnection: keep-alive\r\n"
        b"Content-Length: 100\r\n\r\n" + body
    )
    head, closed = _raw_http_roundtrip(base, req)
    assert b"404" in head.split(b"\r\n")[0]
    assert b"Connection: close" in head or closed
    # oversized Content-Length, body never sent
    req2 = (
        b"POST /score HTTP/1.1\r\nHost: t\r\nConnection: keep-alive\r\n"
        b"Content-Type: audio/wav\r\n"
        b"Content-Length: 1073741824\r\n\r\n"
    )
    head2, closed2 = _raw_http_roundtrip(base, req2)
    assert b"400" in head2.split(b"\r\n")[0]
    assert b"Connection: close" in head2 or closed2


def test_http_score_batch_fills_device_batches(http_server, tmp_path):
    """/score_batch submits every decodable row before waiting on any, so a
    single request fills whole [batch, cut] forwards on its own; decode
    failures stay per-item."""
    base, server = http_server
    rng = np.random.default_rng(11)
    paths, wants = [], {}
    for i in range(6):
        p = str(tmp_path / f"c{i}.wav")
        save_wav(p, (rng.normal(size=500 + 40 * i) * 0.2).astype(np.float32), SR)
        paths.append(p)
        wants[p] = float(expected_row(pad_eval(load_audio(p), "zero", CUT))[1])
    paths.insert(3, str(tmp_path / "missing.wav"))  # mid-list failure

    before = server.batcher.batches
    code, out = _post(
        base + "/score_batch",
        json.dumps({"paths": paths}).encode(),
        {"Content-Type": "application/json"},
    )
    assert code == 200
    results = out["results"]
    assert [r["path"] for r in results] == paths  # request order kept
    for r in results:
        if r["path"] in wants:
            assert r["score"] == pytest.approx(wants[r["path"]], abs=1e-6)
        else:
            assert "error" in r and "score" not in r
    # 6 rows at batch_size 4 -> 2 device batches, not 6
    assert server.batcher.batches - before == 2


def test_http_calibration_applied(tmp_path):
    server = make_server(
        fake_batch_score, cut=CUT, port=0, batch_size=1,
        calibration=(2.0, 0.5), padding_type="zero",
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    try:
        wav = np.full(600, 0.05, np.float32)
        p = str(tmp_path / "c.wav")
        save_wav(p, wav, SR)
        raw = float(expected_row(pad_eval(load_audio(p), "zero", CUT))[1])
        code, out = _post(
            f"http://{host}:{port}/score",
            json.dumps({"path": p}).encode(),
            {"Content-Type": "application/json"},
        )
        assert code == 200
        assert out["score"] == pytest.approx(2.0 * raw + 0.5, abs=1e-5)
        assert out["log_probs"][1] == pytest.approx(raw, abs=1e-6)  # raw kept
    finally:
        server.shutdown()
        server.close()
        t.join(timeout=10)


def test_http_long_audio(tmp_path):
    """long_audio=True scores clips longer than the window as chunked crops
    (score_long_audio semantics), short clips via the fixed window."""
    from scl_deepfake_audio_detection_tpu.train.scoring import score_long_audio

    server = make_server(
        fake_batch_score, cut=CUT, port=0, batch_size=2,
        long_audio=True, padding_type="repeat",
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    try:
        rng = np.random.default_rng(5)
        long_wav = (rng.normal(size=int(CUT * 2.2)) * 0.2).astype(np.float32)
        p = str(tmp_path / "long.wav")
        save_wav(p, long_wav, SR)
        dec = load_audio(p)
        want = float(
            np.asarray(score_long_audio(dec, fake_batch_score, window=CUT, batch=2))[1]
        )
        code, out = _post(
            f"http://{host}:{port}/score",
            json.dumps({"path": p}).encode(),
            {"Content-Type": "application/json"},
        )
        assert code == 200 and out["score"] == pytest.approx(want, abs=1e-5)
    finally:
        server.shutdown()
        server.close()
        t.join(timeout=10)


# --------------------------------------------------------------------------
# CLI wiring (--serve_http builds the engine-backed scorer)
# --------------------------------------------------------------------------


def test_cli_serve_http_e2e(tmp_path, monkeypatch):
    """--serve_http through main(): the CLI builds the tiny-model scorer and
    hands it to serving.serve_http; scores over real HTTP match --serve's
    stdin replies for the same audio."""
    import io
    import sys as _sys

    from scl_deepfake_audio_detection_tpu import serving
    from scl_deepfake_audio_detection_tpu.cli import main

    rng = np.random.default_rng(21)
    p = str(tmp_path / "s.wav")
    save_wav(p, (rng.normal(size=5000) * 0.2).astype(np.float32), SR)

    # stdin --serve reply for the same file = the parity target
    monkeypatch.setattr("sys.stdin", io.StringIO(p + "\n"))
    out = io.StringIO()
    monkeypatch.setattr(_sys, "stdout", out)
    assert main(["--serve", "--ssl_preset", "tiny",
                 "--config", "configs/conf-3-linear.yaml"]) == 0
    want = float(out.getvalue().strip().split("\t")[1])

    captured = {}
    real_serve_http = serving.serve_http

    def capture_serve_http(batch_score, **kw):
        # run the real server, drive one request, then return (no
        # serve_forever block inside the test)
        server = serving.make_server(batch_score, **kw)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        host, port = server.server_address[:2]
        try:
            code, reply = _post(
                f"http://{host}:{port}/score",
                json.dumps({"path": p}).encode(),
                {"Content-Type": "application/json"},
            )
            captured["code"] = code
            captured["reply"] = reply
            captured["kw"] = kw
        finally:
            server.shutdown()
            server.close()
            t.join(timeout=10)
        return 0

    monkeypatch.setattr(serving, "serve_http", capture_serve_http)
    assert real_serve_http is not capture_serve_http
    rc = main(["--serve_http", "0", "--serve_batch", "2",
               "--ssl_preset", "tiny",
               "--config", "configs/conf-3-linear.yaml"])
    assert rc == 0
    assert captured["code"] == 200
    assert captured["reply"]["score"] == pytest.approx(want, abs=5e-5)
    assert captured["kw"]["cut"] == 64600
    assert captured["kw"]["batch_size"] == 2
    assert captured["kw"]["model_tag"]  # model name rode along


def test_cli_serve_http_excludes_stdin_serve(capsys):
    from scl_deepfake_audio_detection_tpu.cli import main

    rc = main(["--serve", "--serve_http", "0", "--ssl_preset", "tiny",
               "--config", "configs/conf-3-linear.yaml"])
    assert rc == 2


def test_microbatcher_close_during_inflight_batch_reposts_stop():
    """close() whose join times out while a batch is in flight (e.g. the
    first 20-40s compile) must not steal the worker's _STOP: the drain
    re-posts it so the worker exits instead of blocking on q.get forever."""
    import time

    release = threading.Event()
    started = threading.Event()

    def slow_batch_score(block):
        started.set()
        release.wait(timeout=30)
        return fake_batch_score(block)

    b = MicroBatcher(slow_batch_score, cut=CUT, batch_size=2, max_wait_ms=0)
    b._join_timeout_s = 0.2
    h = b.submit_async(np.zeros(CUT, np.float32))
    assert started.wait(timeout=10)
    b.close()  # join times out; drain must re-post _STOP, not swallow it
    release.set()
    np.testing.assert_allclose(h.wait(), expected_row(np.zeros(CUT)),
                               atol=1e-6)
    b._worker.join(timeout=10)
    assert not b._worker.is_alive(), "worker leaked after close()"


def test_microbatcher_serial_path_counters_and_isolation():
    """A mixed rows+long group goes through the same dispatch/readback
    accounting as the pipelined path, and a long-clip failure doesn't fail
    the fixed-window rows that shared its group."""
    b = MicroBatcher(fake_batch_score, cut=CUT, batch_size=4, max_wait_ms=200)
    try:
        row = np.full(CUT, 0.01, np.float32)
        h_row = b.submit_async(row)  # co-rides the long clip's serial group
        got = b.submit_long(np.ones(int(CUT * 1.5), np.float32) * 0.01)
        assert np.isfinite(got).all()
        np.testing.assert_allclose(h_row.wait(), expected_row(row), atol=1e-6)
        # serial-path device batches hit the same counters as the pipeline
        assert b.batches >= 1 and b.served >= 2
        assert b.readback_s > 0.0
        assert b.errors == 0
    finally:
        b.close()


def test_http_get_with_body_closes_connection(http_server):
    """A GET carrying a body (legal HTTP) must close after replying — no GET
    route reads a body, so leftover bytes would desync keep-alive."""
    base, _ = http_server
    req = (
        b"GET /healthz HTTP/1.1\r\nHost: t\r\nConnection: keep-alive\r\n"
        b"Content-Length: 10\r\n\r\n0123456789"
    )
    head, closed = _raw_http_roundtrip(base, req)
    assert b"200" in head.split(b"\r\n")[0]
    assert b"Connection: close" in head or closed
    req2 = (
        b"GET /nope HTTP/1.1\r\nHost: t\r\nConnection: keep-alive\r\n"
        b"Content-Length: 4\r\n\r\nbody"
    )
    head2, closed2 = _raw_http_roundtrip(base, req2)
    assert b"404" in head2.split(b"\r\n")[0]
    assert b"Connection: close" in head2 or closed2


def test_cli_serve_batch_score_data_shards_over_mesh(monkeypatch):
    """The serve scorer shards its [batch, cut] block over the mesh's data
    axis, same as the eval path (cli/evaluate.py) — on a multi-chip host
    each chip scores a slice instead of replicating the whole forward."""
    from scl_deepfake_audio_detection_tpu import serving
    from scl_deepfake_audio_detection_tpu.cli import main

    captured = {}

    def capture_serve_http(batch_score, **kw):
        captured["batch_score"] = batch_score
        captured["cut"] = kw["cut"]
        return 0

    monkeypatch.setattr(serving, "serve_http", capture_serve_http)
    assert main(["--serve_http", "0", "--serve_batch", "8",
                 "--mesh", "8,1", "--ssl_preset", "tiny",
                 "--config", "configs/conf-3-linear.yaml"]) == 0

    rng = np.random.default_rng(7)
    cut = captured["cut"]
    block = (rng.normal(size=(8, cut)) * 0.05).astype(np.float32)
    out = captured["batch_score"](block)  # un-read device array (async path)
    shardings = {tuple(s.data.shape) for s in out.addressable_shards}
    ndev = len(out.sharding.device_set)
    assert ndev == 8, f"expected the batch on all 8 devices, got {ndev}"
    assert shardings == {(1, 2)}, (
        f"expected per-device [1, 2] score shards (batch data-sharded), "
        f"got {shardings}"
    )
    # and the values match a replicated 1-device run of the same block
    lp = np.asarray(out)
    one = captured["batch_score"](block[:1].repeat(8, axis=0))
    np.testing.assert_allclose(np.asarray(one)[0], lp[0], atol=1e-5)


def test_microbatcher_max_queue_sheds_load():
    """With max_queue set, submits beyond the bound raise ServerBusy (and
    count as rejected) instead of growing an unbounded backlog; capacity
    frees as the worker drains."""
    from scl_deepfake_audio_detection_tpu.serving import ServerBusy

    release = threading.Event()
    started = threading.Event()

    def slow(block):
        started.set()
        release.wait(timeout=30)
        return fake_batch_score(block)

    b = MicroBatcher(slow, cut=CUT, batch_size=1, max_wait_ms=0, max_queue=2)
    try:
        row = np.zeros(CUT, np.float32)
        h1 = b.submit_async(row)  # worker picks this up and blocks
        assert started.wait(timeout=10)
        h2 = b.submit_async(row)  # queued (1/2)
        h3 = b.submit_async(row)  # queued (2/2)
        with pytest.raises(ServerBusy, match="max_queue"):
            b.submit_async(row)
        assert b.rejected == 1
        release.set()
        for h in (h1, h2, h3):
            np.testing.assert_allclose(h.wait(), expected_row(row), atol=1e-6)
        # queue drained: submits are accepted again
        np.testing.assert_allclose(b.submit(row), expected_row(row),
                                   atol=1e-6)
        assert b.rejected == 1
    finally:
        release.set()
        b.close()


def test_http_503_when_queue_full(tmp_path):
    """A full micro-batcher queue maps to HTTP 503 + Retry-After, and the
    rejected counter surfaces in /healthz and /metrics."""
    release = threading.Event()
    started = threading.Event()

    def slow(block):
        started.set()
        release.wait(timeout=60)
        return fake_batch_score(block)

    server = make_server(slow, cut=CUT, port=0, batch_size=1, max_wait_ms=0,
                         max_queue=1, padding_type="zero", model_tag="fake")
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"
    p = str(tmp_path / "a.wav")
    save_wav(p, np.zeros(CUT, np.float32), SR)
    body = json.dumps({"path": p}).encode()
    hdr = {"Content-Type": "application/json"}
    try:
        results = []

        def post_bg():
            try:
                results.append(_post(base + "/score", body, hdr))
            except urllib.error.HTTPError as e:
                results.append((e.code, json.loads(e.read())))

        t1 = threading.Thread(target=post_bg)  # occupies the worker
        t1.start()
        assert started.wait(timeout=30)
        t2 = threading.Thread(target=post_bg)  # fills the queue (1/1)
        t2.start()
        # wait until the co-rider is actually enqueued
        for _ in range(100):
            if json.load(urllib.request.urlopen(
                    base + "/healthz", timeout=30))["queue_depth"] >= 1:
                break
            import time as _t
            _t.sleep(0.05)
        try:
            _post(base + "/score", body, hdr)
            overflow = None
        except urllib.error.HTTPError as e:
            overflow = (e.code, e.headers.get("Retry-After"),
                        json.loads(e.read()))
        assert overflow is not None and overflow[0] == 503
        assert overflow[1] == "1"
        assert "max_queue" in overflow[2]["error"]
        release.set()
        t1.join(timeout=30)
        t2.join(timeout=30)
        assert sorted(c for c, _ in results) == [200, 200]
        h = json.load(urllib.request.urlopen(base + "/healthz", timeout=30))
        assert h["rejected"] == 1 and h["max_queue"] == 1
        with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
            text = r.read().decode()
        assert "scl_serve_rejected_total 1" in text
        assert "scl_serve_queue_depth" in text
    finally:
        release.set()
        server.shutdown()
        server.close()
        t.join(timeout=10)


def test_serve_http_sigterm_drains(tmp_path):
    """SIGTERM on the serve_http process drains and exits 0 (graceful
    rolling-restart behavior)."""
    import signal
    import subprocess
    import sys as _sys
    import time as _t

    script = tmp_path / "srv.py"
    script.write_text(
        "import sys\n"
        "sys.path.insert(0, %r)\n"
        "import numpy as np\n"
        "from scl_deepfake_audio_detection_tpu.serving import serve_http\n"
        "def score(block):\n"
        "    return np.zeros((block.shape[0], 2), np.float32)\n"
        "raise SystemExit(serve_http(score, cut=1000, port=0, batch_size=2))\n"
        % "/root/repo"
    )
    proc = subprocess.Popen([_sys.executable, str(script)],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True)
    try:
        # wait for the listening banner (serving.py imports no jax: fast)
        deadline = _t.monotonic() + 60
        line = ""
        while _t.monotonic() < deadline:
            line = proc.stderr.readline()
            if "listening on" in line:
                break
        assert "listening on" in line, line
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=30)
        rest = proc.stderr.read()
        assert rc == 0, rest
        assert "draining" in rest
    finally:
        if proc.poll() is None:
            proc.kill()
