"""Thin REST layer over :class:`loudml_spark.api.Engine`.

Route parity with the reference's Flask server (SURVEY §2.11,
/root/reference/loudml/server.py) using only the standard library
(`http.server.ThreadingHTTPServer`) — the engine does the work; this
module only frames JSON.  Heavy work can run in the background
(`?bg=true` → 202 + job id, the reference's job contract).

Deliberately NOT a production HTTP stack: the reference's server is
an operational convenience around the engine, and so is this.  At
cluster scale the Engine is driven from notebooks / Airflow-style
schedulers; the HTTP layer exists so a reference user's scripts keep
working.

Routes:
  GET  /                               → version banner
  GET  /buckets                        → names
  POST /buckets                        → add bucket (settings JSON)
  DELETE /buckets/<name>
  POST /buckets/<name>/_read?from&to&bucket_interval&features=a;b
  POST /buckets/<name>/_write          → rows JSON [{...}]
  POST /buckets/<name>/_clear
  HEAD /buckets/<a;b>                  → 200 iff every name exists
  PATCH /buckets/<a;b>                 → merge partial settings (204)
  GET  /models                         → names
  POST /models                         → create (settings JSON)
  DELETE /models/<name>
  HEAD /models/<a;b>                   → 200 iff every name exists
  PATCH /models/<a;b>                  → settings-only update (204)
  POST /models/<name>/_train?from&to&bucket=<b>&features=<f>&bg
  POST /models/<name>/_eval?from&to&bucket=<b>&features=<f>
  POST /models/<name>/_forecast?from&to&constraint=&percent_interval=
  GET  /models/<name>/_top?from&to&bucket=&features=&keys=a,b&size=
  POST /models/<name>/_start           → periodic eval (JSON: every…)
  POST /models/<name>/_stop
  GET  /jobs                           → job descriptions
  GET  /jobs/<id>
  HEAD /jobs/<a;b>                     → 200 iff every id exists
  POST /jobs/<id>/_cancel
  GET  /scheduled_jobs
  POST /scheduled_jobs                 → create (desc JSON, 201)
  DELETE /scheduled_jobs               → clear all (204)
  GET  /scheduled_jobs/<a;b>           → descs of the found ids
  HEAD /scheduled_jobs/<a;b>           → 200 iff every id exists
  DELETE /scheduled_jobs/<a;b>         → remove (missing ok, 204)
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit

from loudml_spark import errors

VERSION = {"version": "loudml-spark", "tagline": "PySpark-native"}


def _df_records(df) -> list[dict]:
    return [r.asDict(recursive=True) for r in df.collect()]


class _Handler(BaseHTTPRequestHandler):
    engine = None  # injected by make_server

    # -- plumbing ---------------------------------------------------------
    def log_message(self, *a):  # quiet test runs
        pass

    def _json(self, code: int, payload) -> None:
        body = json.dumps(payload, default=str).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        # HEAD answers with GET's headers and status but NO body
        # (RFC 9110 §9.3.2); routes shared between GET and HEAD rely
        # on this rather than duplicating logic
        if self.command != "HEAD":
            self.wfile.write(body)

    def _status(self, code: int) -> None:
        """Body-less response — 204s and HEAD existence probes."""
        self.send_response(code)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def _body(self):
        n = int(self.headers.get("Content-Length") or 0)
        if n == 0:
            return None
        return json.loads(self.rfile.read(n))

    def _route(self, method: str) -> None:
        # urlsplit, NOT urlparse: urlparse carves `;params` off the
        # last path segment, silently truncating the reference's
        # semicolon-multi ids (/buckets/a;b)
        url = urlsplit(self.path)
        parts = [p for p in url.path.split("/") if p]
        q = {k: v[0] for k, v in parse_qs(url.query).items()}
        try:
            self._dispatch(method, parts, q)
        except (errors.BucketNotFound, errors.ModelNotFound) as e:
            self._json(404, {"error": str(e)})
        except errors.ForecastConstraintViolation as e:
            self._json(409, {
                "error": str(e), "feature": e.feature, "type": e.type,
                "threshold": e.threshold, "timestamp": e.timestamp,
            })
        except errors.Invalid as e:
            self._json(400, {"error": str(e)})
        except errors.LoudMLSparkError as e:
            self._json(500, {"error": str(e)})
        except KeyError as e:
            # missing required query param / body field
            self._json(400, {"error": f"missing parameter: {e}"})
        except Exception as e:  # malformed path, bad JSON, …
            self._json(500, {"error": f"{type(e).__name__}: {e}"})

    def do_GET(self):  # noqa: N802
        self._route("GET")

    def do_POST(self):  # noqa: N802
        self._route("POST")

    def do_DELETE(self):  # noqa: N802
        self._route("DELETE")

    def do_PATCH(self):  # noqa: N802
        self._route("PATCH")

    def do_HEAD(self):  # noqa: N802
        self._route("HEAD")

    # -- routing ----------------------------------------------------------
    def _dispatch(self, method, parts, q):
        if not parts:
            return self._json(200, VERSION)

        head = parts[0]
        if head == "buckets":
            return self._buckets(method, parts[1:], q)
        if head == "models":
            return self._models(method, parts[1:], q)
        if head == "jobs":
            return self._jobs(method, parts[1:], q)
        if head == "scheduled_jobs":
            return self._scheduled_jobs(method, parts[1:], q)
        if head == "_nodes" and method == "GET":
            return self._nodes(parts[1:])
        return self._json(404, {"error": f"no route: {'/'.join(parts)}"})

    def _nodes(self, rest):
        """GET /_nodes[/<node>[/http]] — single-node cluster listing
        (server.py:1739-1775 shape; Spark is the 'cluster', so the one
        node reports the driver's bound address; no DNS lookups so the
        endpoint stays offline-safe)."""
        host = self.server.server_address[0] or "127.0.0.1"
        port = self.server.server_address[1]
        addr = f"{host}:{port}"
        node = {
            "name": "node-0",
            "transport_address": addr,
            "host": host,
            "version": VERSION["version"],
            "roles": ["master", "data"],
            "http": {"bound_address": [addr], "publish_address": addr},
        }
        # ES-style routing: the first segment may be a METRIC selector
        # (GET /_nodes/http), not only a node name
        if rest and rest[0] == "http":
            rest = ["_all", *rest]
        if rest and rest[0] not in ("node-0", "_all"):
            return self._json(404, {"error": f"no node: {rest[0]}"})
        if len(rest) >= 2 and rest[1] == "http":
            return self._json(200, {"nodes": {"node-0": {
                "name": node["name"], "http": node["http"]}}})
        return self._json(200, {
            "_nodes": {"total": 1, "successful": 1, "failed": 0},
            "cluster_name": "loudml-spark",
            "nodes": {"node-0": node},
        })

    def _buckets(self, method, rest, q):
        eng = self.engine
        if not rest:
            if method in ("GET", "HEAD"):
                return self._json(200, eng.list_buckets())
            if method == "POST":
                body = self._body()
                if not body:
                    return self._json(
                        400, {"error": "bucket settings body required"})
                eng.add_bucket(body)
                return self._json(201, {"ok": True})
            return self._json(405, {"error": f"{method} not allowed"})
        name = rest[0]
        if len(rest) == 1:
            if method == "DELETE":
                eng.delete_bucket(name)
                return self._json(200, {"ok": True})
            if method == "HEAD":
                # multi-name existence probe (a;b) — 200 iff ALL exist
                # (reference server.py:1122-1134)
                known = set(eng.list_buckets())
                ok = set(name.split(";")) <= known
                return self._status(200 if ok else 404)
            if method == "PATCH":
                # partial-settings update, multi-name (a;b) — 204
                # (reference server.py:1105-1114)
                data = self._body() or {}
                for n in name.split(";"):
                    eng.patch_bucket(n, data)
                return self._status(204)
            if method == "GET":
                bucket = eng.buckets.get(name)
                return self._json(
                    200, {"name": bucket.name,
                          "type": type(bucket).__name__})
            return self._json(405, {"error": f"{method} not allowed"})
        action = rest[1]
        if action == "_read":
            features = (q.get("features") or "").split(";")
            kw = {}
            if "ts_col" in q:
                kw["ts_col"] = q["ts_col"]
            if "ts_unit" in q:
                kw["ts_unit"] = q["ts_unit"]
            return self._json(200, eng.read(
                name, q["from"], q["to"],
                q.get("bucket_interval", "1h"), features, **kw))
        if action == "_write":
            rows = self._body() or []
            df = eng.spark.createDataFrame(rows)
            eng.write(name, df)
            return self._json(200, {"written": len(rows)})
        if action == "_clear":
            eng.clear_bucket(name)
            return self._json(200, {"ok": True})
        return self._json(404, {"error": f"no bucket action {action}"})

    def _models(self, method, rest, q):
        eng = self.engine
        if not rest:
            if method in ("GET", "HEAD"):
                return self._json(200, eng.list_models())
            if method == "POST":
                body = self._body()
                if not body:
                    return self._json(
                        400, {"error": "model settings body required"})
                model = eng.create_model(body)
                return self._json(201, {"name": model.name})
            return self._json(405, {"error": f"{method} not allowed"})
        name = rest[0]
        if len(rest) == 1:
            if method == "DELETE":
                eng.delete_model(name)
                return self._json(200, {"ok": True})
            if method == "HEAD":
                # 200 iff every listed model exists
                # (reference server.py:776-787)
                known = set(eng.list_models())
                ok = set(name.split(";")) <= known
                return self._status(200 if ok else 404)
            if method == "PATCH":
                # settings-only update, trained state survives — 204
                # (reference server.py:790-829)
                data = self._body() or {}
                for n in name.split(";"):
                    eng.patch_model(n, data)
                return self._status(204)
            if method == "GET":
                return self._json(200, eng.get_model(name).settings())
            return self._json(405, {"error": f"{method} not allowed"})
        action = rest[1]
        if action == "hooks":
            return self._model_hooks(method, name, rest[2:])
        kw = {}
        if "ts_col" in q:
            kw["ts_col"] = q["ts_col"]
        if "ts_unit" in q:
            kw["ts_unit"] = q["ts_unit"]
        bg = q.get("bg", "").lower() in ("1", "true", "yes")
        if action == "versions" and method == "GET":
            return self._json(200, eng.model_versions(name))
        if action == "_restore":
            eng.restore_model(name, int(q["version"]))
            return self._json(200, {"restored": int(q["version"])})
        if action == "_train":
            resume = q.get("resume", "").lower() in ("1", "true", "yes")
            out = eng.train(name, q["bucket"], q["from"], q["to"],
                            q.get("features", "avg(value)"), bg=bg,
                            resume=resume, **kw)
            if bg:
                return self._json(202, {"job": out.id})
            return self._json(200, {"trained": name})
        if action == "_eval":
            flag = q.get("flag_abnormal_data", "").lower() in (
                "1", "true", "yes")
            out = eng.eval_model(
                name, q["bucket"], q["from"], q["to"],
                q.get("features", "avg(value)"), bg=bg,
                output_bucket=q.get("output_bucket"),
                flag_abnormal=flag, **kw)
            if bg:
                return self._json(202, {"job": out.id})
            return self._json(200, _df_records(out))
        if action == "_forecast":
            fkw = {}
            if "percent_interval" in q:
                fkw["percent_interval"] = float(q["percent_interval"])
            if "constraint" in q:
                fkw["constraint"] = q["constraint"]
            out = eng.forecast(name, q["from"], q["to"], bg=bg, **fkw)
            if bg:
                return self._json(202, {"job": out.id})
            return self._json(200, _df_records(out))
        if action == "_top":
            out = eng.top(
                name, q["bucket"], q["from"], q["to"],
                q.get("features", "avg(value)"),
                q.get("keys", "").split(","),
                size=int(q.get("size", 10)), **kw)
            return self._json(200, _df_records(out))
        if action == "_start":
            body = self._body() or {}
            eng.start_periodic_eval(
                name, body["bucket"], body.get("features", "avg(value)"),
                body["every"], **kw)
            return self._json(200, {"ok": True})
        if action == "_stop":
            eng.stop_periodic_eval(name)
            return self._json(200, {"ok": True})
        return self._json(404, {"error": f"no model action {action}"})

    def _model_hooks(self, method, name, rest):
        """/models/<n>/hooks CRUD + /hooks/<h>/_test (reference
        server.py:939-1028): collection GET lists hook names, POST
        creates (201); per-hook GET describes, POST updates in place,
        DELETE removes; _test drives the fake prediction through the
        real detect path and fires the hook."""
        eng = self.engine
        if not rest:
            if method in ("GET", "HEAD"):
                eng.get_model(name)  # 404 on unknown model
                return self._json(200, eng.list_hooks(name))
            if method == "POST":
                eng.set_hook(name, self._body() or {})
                return self._json(201, {"ok": True})
            return self._json(405, {"error": f"{method} not allowed"})
        hook_name = rest[0]
        if len(rest) == 1:
            if method == "GET":
                return self._json(200, eng.get_hook(name, hook_name))
            if method == "POST":
                body = dict(self._body() or {})
                # the URL names the resource: a body carrying a
                # DIFFERENT name would silently create/replace some
                # other hook and still answer 200 for this one
                if body.get("name", hook_name) != hook_name:
                    return self._json(400, {
                        "error": "body name %r does not match URL "
                                 "hook %r" % (body["name"], hook_name)})
                body["name"] = hook_name
                eng.set_hook(name, body)
                return self._json(200, {"ok": True})
            if method == "DELETE":
                eng.get_hook(name, hook_name)  # 404 on unknown hook
                eng.delete_hook(name, hook_name)
                return self._json(200, {"ok": True})
            return self._json(405, {"error": f"{method} not allowed"})
        if len(rest) == 2 and rest[1] == "_test" and method == "POST":
            eng.get_hook(name, hook_name)  # 404 on unknown hook
            eng.test_hook(name, hook_name)
            return self._json(200, {"ok": True})
        return self._json(404, {"error": "no hook route"})

    def _jobs(self, method, rest, q):
        eng = self.engine
        if not rest:
            return self._json(200, eng.jobs.list_jobs())
        job_id = rest[0]
        if len(rest) == 1 and method == "HEAD":
            # 200 iff every listed job id exists
            # (reference server.py:1280-1291)
            known = {j["id"] for j in eng.jobs.list_jobs()}
            ok = set(job_id.split(";")) <= known
            return self._status(200 if ok else 404)
        if len(rest) == 1 and method == "GET":
            return self._json(200, eng.jobs.get(job_id).describe())
        if len(rest) == 2 and rest[1] == "_cancel":
            eng.jobs.cancel(job_id)
            return self._json(200, {"ok": True})
        return self._json(404, {"error": "no job route"})

    def _scheduled_jobs(self, method, rest, q):
        """/scheduled_jobs CRUD (reference server.py:1302-1402):
        collection GET/POST/DELETE + per-id GET/HEAD/DELETE with
        semicolon-multi ids."""
        eng = self.engine
        if not rest:
            if method in ("GET", "HEAD"):
                return self._json(200, eng.scheduled.list_scheduled())
            if method == "POST":
                body = self._body()
                if not body:
                    return self._json(
                        400, {"error": "scheduled-job body required"})
                created = eng.add_scheduled(body)
                return self._json(
                    201, {"names": [sj.name for sj in created]})
            if method == "DELETE":
                eng.delete_scheduled()
                return self._status(204)
            return self._json(405, {"error": f"{method} not allowed"})
        ids = rest[0].split(";")
        if len(rest) == 1:
            known = set(eng.scheduled.names())
            if method == "HEAD":
                return self._status(200 if set(ids) <= known else 404)
            if method == "GET":
                found = [eng.scheduled.describe(i)
                         for i in ids if i in known]
                if not found:
                    return self._json(
                        404, {"error": "job(s) not found"})
                return self._json(200, found)
            if method == "DELETE":
                eng.delete_scheduled(ids)
                return self._status(204)
        return self._json(404, {"error": "no scheduled-job route"})


def make_server(engine, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server bound to ``engine``.  Port 0
    picks a free port (server.server_address[1] has the real one)."""
    handler = type("EngineHandler", (_Handler,), {"engine": engine})
    return ThreadingHTTPServer((host, port), handler)


def serve_background(engine, host: str = "127.0.0.1",
                     port: int = 0) -> ThreadingHTTPServer:
    """Start the server on a daemon thread; returns it (call
    ``shutdown()`` to stop)."""
    srv = make_server(engine, host, port)
    threading.Thread(target=srv.serve_forever, daemon=True,
                     name="loudml-spark-http").start()
    return srv
