"""HTTP service surface (AstroRestService.java:70-84 equivalent).
No Spark session is involved — the endpoint runs the kernel driver-side.
"""

import json
import threading
import urllib.parse
import urllib.request

import pytest


@pytest.fixture(scope="module")
def server(artifacts):
    from astrospark.api import AstroEngine
    from astrospark.service import serve

    vocab, trie, model = artifacts
    srv = serve(port=0, engine=AstroEngine(artifacts=(vocab, trie, model)))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, data, ctype="application/x-www-form-urlencoded"):
    req = urllib.request.Request(
        url + "/processAstroText",
        data=data.encode(),
        headers={"Content-Type": ctype},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_process_text_form(server):
    body = urllib.parse.urlencode(
        {"text": "We detect GRB 020819B at 3 GHz near NGC 1275."}
    )
    status, raw = _post(server, body)
    assert status == 200
    out = json.loads(raw)
    assert "runtime" in out
    got = [(e["kind"], e["text"], e["offset"]) for e in out["entities"]]
    assert ("object", "GRB 020819B", 10) in got
    assert ("object", "NGC 1275", 36) in got


def test_process_text_raw_body(server):
    status, raw = _post(server, "The field contains IC 3309 only.", ctype="text/plain")
    assert status == 200
    assert any(e["text"] == "IC 3309" for e in json.loads(raw)["entities"])


def test_blank_input_is_no_content(server):
    status, _ = _post(server, urllib.parse.urlencode({"text": "   "}))
    assert status == 204  # AstroParser.java:96-98 null-result path


def test_health(server):
    with urllib.request.urlopen(server + "/health", timeout=10) as resp:
        assert json.loads(resp.read())["status"] == "ok"
