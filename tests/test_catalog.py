"""Catalog seam: one contract suite over both backends.

The directory backend is LakeCatalog; the REST backend talks to an
in-process HTTP server implementing the minimal Iceberg-REST-shaped
API (config / namespaces / tables CRUD / rename) backed by a temp
warehouse — network-free proof that the seam is pluggable.
"""

from __future__ import annotations

import http.server
import json
import os
import shutil
import threading
import urllib.parse

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pg_lakehouse_spark.catalog import CATALOG_TYPES, Catalog, RestCatalog, catalog
from pg_lakehouse_spark.lakehouse import LakeCatalog, LakehouseError


class _RestState:
    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        self.namespaces: set[str] = set()
        self.tables: dict[tuple[str, str], str] = {}  # (ns, name) -> location
        # (ns, name) -> {"refs": {...}, "seq": int}; CAS on seq
        self.refs: dict[tuple[str, str], dict] = {}


def _make_handler(state: _RestState, required_token: str | None = None):
    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _auth_ok(self) -> bool:
            if required_token is None:
                return True
            return self.headers.get("Authorization") == f"Bearer {required_token}"

        def _json(self, code: int, payload=None):
            body = json.dumps(payload).encode() if payload is not None else b""
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self):
            n = int(self.headers.get("Content-Length") or 0)
            return json.loads(self.rfile.read(n)) if n else {}

        def _parts(self):
            path = urllib.parse.urlparse(self.path)
            return [urllib.parse.unquote(p) for p in path.path.strip("/").split("/")], (
                urllib.parse.parse_qs(path.query)
            )

        def do_GET(self):
            if not self._auth_ok():
                return self._json(401, {"error": "unauthorized"})
            parts, _ = self._parts()
            if parts == ["v1", "config"]:
                return self._json(200, {"defaults": {}, "overrides": {}})
            if parts == ["v1", "namespaces"]:
                return self._json(
                    200, {"namespaces": [[ns] for ns in sorted(state.namespaces)]}
                )
            if len(parts) == 4 and parts[:2] == ["v1", "namespaces"] and parts[3] == "tables":
                ns = parts[2]
                idents = [
                    {"namespace": [n], "name": t}
                    for (n, t) in sorted(state.tables)
                    if n == ns
                ]
                return self._json(200, {"identifiers": idents})
            if len(parts) == 6 and parts[3] == "tables" and parts[5] == "refs":
                key = (parts[2], parts[4])
                if key not in state.tables:
                    return self._json(404, {"error": "no such table"})
                doc = state.refs.get(key)
                if doc is None:
                    return self._json(404, {"error": "no refs"})
                return self._json(200, doc)
            if len(parts) == 5 and parts[3] == "tables":
                key = (parts[2], parts[4])
                if key in state.tables:
                    return self._json(200, {"metadata-location": state.tables[key]})
                return self._json(404, {"error": "no such table"})
            return self._json(404, {"error": "bad path"})

        def do_POST(self):
            if not self._auth_ok():
                return self._json(401, {"error": "unauthorized"})
            parts, _ = self._parts()
            if parts == ["v1", "namespaces"]:
                ns = self._body()["namespace"][0]
                state.namespaces.add(ns)
                return self._json(200, {"namespace": [ns]})
            if len(parts) == 4 and parts[3] == "tables":
                ns, name = parts[2], self._body()["name"]
                key = (ns, name)
                if key in state.tables:
                    return self._json(409, {"error": "exists"})
                loc = os.path.join(state.warehouse, ns, name)
                state.namespaces.add(ns)
                state.tables[key] = loc
                return self._json(200, {"metadata-location": loc})
            if len(parts) == 6 and parts[3] == "tables" and parts[5] == "refs":
                key = (parts[2], parts[4])
                if key not in state.tables:
                    return self._json(404, {"error": "no such table"})
                b = self._body()
                cur = state.refs.get(key, {"refs": {}, "seq": 0})
                if int(b.get("expected-seq", -1)) != cur["seq"]:
                    return self._json(409, {"error": "seq conflict"})
                doc = {"refs": b["refs"], "seq": cur["seq"] + 1}
                state.refs[key] = doc
                return self._json(200, {"seq": doc["seq"]})
            if parts == ["v1", "tables", "rename"]:
                b = self._body()
                src = (b["source"]["namespace"][0], b["source"]["name"])
                dst = (b["destination"]["namespace"][0], b["destination"]["name"])
                if src not in state.tables or dst in state.tables:
                    return self._json(409, {"error": "rename conflict"})
                dst_loc = os.path.join(state.warehouse, dst[0], dst[1])
                os.makedirs(os.path.dirname(dst_loc), exist_ok=True)
                os.rename(state.tables[src], dst_loc)
                state.tables[dst] = dst_loc
                state.namespaces.add(dst[0])
                del state.tables[src]
                return self._json(200, {})
            return self._json(404, {"error": "bad path"})

        def do_DELETE(self):
            if not self._auth_ok():
                return self._json(401, {"error": "unauthorized"})
            parts, query = self._parts()
            if len(parts) == 5 and parts[3] == "tables":
                key = (parts[2], parts[4])
                if key not in state.tables:
                    return self._json(404, {"error": "no such table"})
                loc = state.tables.pop(key)
                if query.get("purgeRequested") == ["true"]:
                    shutil.rmtree(loc, ignore_errors=True)
                else:
                    shutil.rmtree(os.path.join(loc, "_lakehouse"), ignore_errors=True)
                return self._json(200, {})
            return self._json(404, {"error": "bad path"})

    return Handler


@pytest.fixture(scope="module")
def rest_server(tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("rest_wh"))
    state = _RestState(warehouse)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


@pytest.fixture(params=["internal", "rest"])
def cat(request, spark, tmp_path, rest_server):
    if request.param == "internal":
        return catalog(spark, "internal", warehouse=str(tmp_path / "wh"))
    return catalog(spark, "rest", uri=rest_server)


@pytest.fixture
def df10(spark):
    return spark.createDataFrame([Row(k=i, v=f"v{i}") for i in range(10)])


def test_contract_crud(cat, df10, spark):
    ns, name = "analytics", f"t_{type(cat).__name__.lower()}"
    assert not cat.table_exists(ns, name)
    tbl = cat.create_table_as(ns, name, df10)
    assert cat.table_exists(ns, name)
    assert (ns, name) in cat.list_tables()
    assert cat.list_tables(ns) == [(ns, name)] or (ns, name) in cat.list_tables(ns)

    loaded = cat.load_table(ns, name)
    assert loaded.read().count() == 10
    loaded.append(df10.withColumn("k", F.col("k") + 100))
    assert cat.load_table(ns, name).read().count() == 20

    with pytest.raises(LakehouseError, match="already exists"):
        cat.create_table(ns, name, df10.schema)
    same = cat.create_table(ns, name, df10.schema, if_not_exists=True)
    assert same.read().count() == 20

    cat.rename_table(ns, name, ns, name + "_renamed")
    assert not cat.table_exists(ns, name)
    assert cat.load_table(ns, name + "_renamed").read().count() == 20

    cat.drop_table(ns, name + "_renamed", purge=True)
    assert not cat.table_exists(ns, name + "_renamed")
    with pytest.raises(LakehouseError, match="does not exist"):
        cat.load_table(ns, name + "_renamed")


def test_protocol_satisfied(spark, tmp_path, rest_server):
    assert isinstance(LakeCatalog(spark, str(tmp_path / "w")), Catalog)
    assert isinstance(RestCatalog(spark, rest_server), Catalog)


def test_factory_validation(spark, tmp_path):
    with pytest.raises(LakehouseError, match="unsupported catalog_type"):
        catalog(spark, "glue", warehouse=str(tmp_path))
    with pytest.raises(LakehouseError, match="requires catalog_uri"):
        catalog(spark, "rest")
    with pytest.raises(LakehouseError, match="requires a warehouse"):
        catalog(spark, "internal")
    assert CATALOG_TYPES == ("internal", "hadoop", "rest")
    # hadoop type roots at the uri (directory semantics)
    hc = catalog(spark, "hadoop", uri=str(tmp_path / "hadoop_wh"))
    assert isinstance(hc, LakeCatalog)


def test_rest_unreachable(spark):
    with pytest.raises(LakehouseError, match="unreachable"):
        RestCatalog(spark, "http://127.0.0.1:9", timeout=0.5)


@pytest.fixture(scope="module")
def auth_rest_server(tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("auth_rest_wh"))
    state = _RestState(warehouse)
    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), _make_handler(state, required_token="sekret-42")
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_rest_ref_sync(spark, rest_server, df10):
    """Branch/tag refs publish to and adopt from the REST catalog:
    push CAS-bumps the server sequence, pull merges remote-wins, a
    stale push 409s, and sync_refs converges after a concurrent push."""
    cat = RestCatalog(spark, rest_server)
    tbl = cat.create_table_as("refs_ns", "t_refs", df10)
    tbl.append(df10)
    tbl.tag("v_first", 2)
    tbl.create_branch("dev")

    # push publishes the local refs; server seq becomes 1
    assert cat.push_refs("refs_ns", "t_refs") == 1
    remote, seq = cat.remote_refs("refs_ns", "t_refs")
    assert seq == 1 and remote["tags"] == {"v_first": 2}
    assert "dev" in remote["branches"]

    # a second client (same shared storage) adopts the refs on pull
    tbl._write_refs({}, {})  # wipe local refs ≙ fresh mirror
    merged = cat.pull_refs("refs_ns", "t_refs")
    assert merged["tags"] == {"v_first": 2} and "dev" in merged["branches"]
    assert tbl.tags() == {"v_first": 2}

    # concurrent push moved the seq -> a stale push 409s...
    cat._request(
        "POST",
        cat._refs_endpoint("refs_ns", "t_refs"),
        {"refs": {"tags": {"other": 1}, "branches": {}}, "expected-seq": 1},
    )
    tbl.tag("v_local", 1)
    with pytest.raises(LakehouseError, match="HTTP 409"):
        # push bases on a re-read seq, so force staleness via raw POST
        cat._request(
            "POST",
            cat._refs_endpoint("refs_ns", "t_refs"),
            {"refs": {}, "expected-seq": 1},
        )
    # ...and sync converges: remote-wins merge of both sides, pushed
    assert cat.sync_refs("refs_ns", "t_refs") == 3
    remote, _ = cat.remote_refs("refs_ns", "t_refs")
    assert remote["tags"] == {"v_first": 2, "other": 1, "v_local": 1}
    assert "dev" in remote["branches"]

    # remote ref to a snapshot this mirror doesn't have is skipped
    cat._request(
        "POST",
        cat._refs_endpoint("refs_ns", "t_refs"),
        {
            "refs": {"tags": {"ghost": 999}, "branches": {}},
            "expected-seq": 3,
        },
    )
    merged = cat.pull_refs("refs_ns", "t_refs")
    assert merged["skipped"] == {"ghost": 999}
    assert "ghost" not in tbl.tags()
    cat.drop_table("refs_ns", "t_refs", purge=True)


def test_rest_auth_token(spark, auth_rest_server, df10):
    # Without a token every request (including the /v1/config handshake)
    # is rejected with 401.
    with pytest.raises(LakehouseError, match="HTTP 401"):
        RestCatalog(spark, auth_rest_server)
    with pytest.raises(LakehouseError, match="HTTP 401"):
        catalog(spark, "rest", uri=auth_rest_server, token="wrong")
    # With the right token the full CRUD surface works.
    cat = catalog(spark, "rest", uri=auth_rest_server, token="sekret-42")
    tbl = cat.create_table_as("auth_ns", "t_auth", df10)
    assert tbl.read().count() == 10
    assert cat.table_exists("auth_ns", "t_auth")
    cat.drop_table("auth_ns", "t_auth", purge=True)
    assert not cat.table_exists("auth_ns", "t_auth")
