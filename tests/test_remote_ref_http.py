"""Remote $ref over a REAL localhost HTTP socket — the analog of the
reference's integration harness (test/json_schema/utils.clj:13-26 starts a
localhost:1234 server; v3_test.clj:68-82 / v4_test.clj:27-46 run remote-ref
cases against it).

Covers: fetch via the stdlib http loader, per-endpoint registry caching
(each document hits the server exactly once per validator), fragment
pointers into the fetched doc, and $id-scope-chain resolution of relative
remote refs (mk-ref-with-ids, core.clj:956-970).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from json_schema_clj_spark.pyvalidator.validator import http_loader, validate

DOCS = {
    "/subSchemas.json": {
        "integer": {"type": "integer"},
        "refToInteger": {"$ref": "#/integer"},
    },
    "/folder/folderInteger.json": {"type": "integer"},
}


class _Handler(BaseHTTPRequestHandler):
    hits: dict[str, int] = {}

    def do_GET(self):  # noqa: N802 — http.server API
        doc = DOCS.get(self.path)
        _Handler.hits[self.path] = _Handler.hits.get(self.path, 0) + 1
        if doc is None:
            self.send_response(404)
            self.end_headers()
            return
        body = json.dumps(doc).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence request logging
        pass


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_remote_ref_fragment_over_socket(server):
    schema = {"$ref": f"{server}/subSchemas.json#/integer"}
    assert not validate(schema, 7, loader=http_loader)["errors"]
    assert validate(schema, "x", loader=http_loader)["errors"]


def test_remote_ref_inside_remote_doc(server):
    # the fetched registry resolves its own internal refs
    schema = {"$ref": f"{server}/subSchemas.json#/refToInteger"}
    assert not validate(schema, 3, loader=http_loader)["errors"]
    assert validate(schema, "x", loader=http_loader)["errors"]


def test_registry_cache_one_fetch_per_validator(server):
    _Handler.hits.clear()
    from json_schema_clj_spark.pyvalidator.validator import compile_schema

    v = compile_schema(
        {
            "properties": {
                "a": {"$ref": f"{server}/subSchemas.json#/integer"},
                "b": {"$ref": f"{server}/subSchemas.json#/refToInteger"},
            }
        },
        loader=http_loader,
    )
    for doc in ({"a": 1, "b": 2}, {"a": "x"}, {"b": 3}):
        v(doc)
    # two refs, three validations — but ONE fetch (per-endpoint cache)
    assert _Handler.hits == {"/subSchemas.json": 1}


def test_id_scope_chain_resolves_relative_remote_ref(server):
    # draft-4 refRemote shape: base id + folder id scope, relative $ref
    schema = {
        "id": f"{server}/",
        "items": {"id": "folder/", "items": {"$ref": "folderInteger.json"}},
    }
    assert not validate(schema, [[1, 2]], loader=http_loader)["errors"]
    assert validate(schema, [["x"]], loader=http_loader)["errors"]


def test_unreachable_remote_is_unresolved_error(server):
    schema = {"$ref": f"{server}/missing.json#/x"}
    errs = validate(schema, 1, loader=http_loader)["errors"]
    assert errs and "Could not resolve $ref" in errs[0]["message"]
