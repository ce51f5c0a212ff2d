"""REST control plane — the ``api.py`` analog (api.py:63-123).

The reference exposes a FastAPI app with four endpoints backed by a Redis
task hash (api.py TaskRedis): list spiders, list running tasks, launch a
spider command, kill a task's process tree. This container has no
FastAPI/uvicorn (no pip installs), so the same surface runs on the stdlib
``http.server`` — localhost-only by design, like the reference's
``uvicorn.run(host="127.0.0.1")`` — and the Redis task hash becomes a JSON
registry file guarded by an exclusive-create lock (one control plane per
runs root, the same single-writer model).

Endpoints (paths kept identical to api.py):
    GET /openapi/spiders            -> {total, spiders}
    GET /openapi/tasks[?spider=][&sort=spider|host]
    GET /openapi/run/{spider}?cmd=  -> run synchronously, return rc + output
    GET /openapi/kill/{id}          -> SIGTERM the task's process group

``run`` launches the command with ``start_new_session=True`` so kill can
take down the whole tree with os.killpg — the psutil-children walk of
api.py:111-117 without psutil.
"""

from __future__ import annotations

import json
import os
import signal
import socket
import subprocess
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit

_HOST = socket.gethostname()


def list_spiders() -> dict:
    """Spider inventory — the reference scans SP/spiders (api.py:63-70);
    ours lists the simulated-web scales plus the CrawlSpec default (one
    engine, many specs — SURVEY.md §2.9)."""
    from spiderman_ray.simweb import SCALES

    spiders = sorted(SCALES) + ["zhifang_sim"]
    return {"total": len(spiders), "spiders": spiders}


class TaskRegistry:
    """JSON-file task hash — TaskRedis (api.py:31-60) without Redis.

    Redis hash ops are atomic; the file analog must be too: every
    load-modify-save runs under an ``flock`` on a sidecar lockfile (push
    from a runner thread races remove from the killer — both the dying
    task's ``finally`` and ``kill_task`` deregister), and the write-side
    tmp name is per-writer so concurrent writers can never truncate each
    other's tmp or ``os.replace`` a path the other already consumed."""

    def __init__(self, path: str = "/tmp/spiderman_tasks.json"):
        self.path = path

    def _locked(self):
        import fcntl
        from contextlib import contextmanager

        @contextmanager
        def lock():
            with open(self.path + ".lock", "a") as lf:
                fcntl.flock(lf, fcntl.LOCK_EX)
                try:
                    yield
                finally:
                    fcntl.flock(lf, fcntl.LOCK_UN)

        return lock()

    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def _save(self, tasks: dict) -> None:
        import threading

        tmp = f"{self.path}.{os.getpid()}.{threading.get_ident()}.tmp"
        with open(tmp, "w") as f:
            json.dump(tasks, f, indent=1)
        os.replace(tmp, self.path)

    def push(self, task: dict) -> None:
        with self._locked():
            tasks = self._load()
            tasks[task["id"]] = task
            self._save(tasks)

    def remove(self, task_id: str) -> None:
        with self._locked():
            tasks = self._load()
            tasks.pop(task_id, None)
            self._save(tasks)

    def get_task(self, task_id: str) -> dict | None:
        return self._load().get(task_id)

    def get_tasks(self, spider: str | None = None, sort: str = "spider") -> dict:
        """Group running tasks by spider or host (api.py:50-60)."""
        out: dict[str, list] = {}
        for task in self._load().values():
            if spider and spider != task["spider"]:
                continue
            key = task["host"] if sort == "host" else task["spider"]
            out.setdefault(key, []).append(task)
        return out


def run_task(spider: str, cmd: str, registry: TaskRegistry | None = None) -> dict:
    """Launch a command synchronously under the registry (api.py:81-104):
    the task is visible in /openapi/tasks while it runs, and removed when
    it exits. ``start_new_session`` puts it in its own process group so
    kill_task can terminate the whole tree."""
    registry = registry or TaskRegistry()
    task = {
        "id": str(uuid.uuid1()),
        "spider": spider,
        "cmd": cmd,
        "host": _HOST,
        "start": time.strftime("%Y-%m-%d %H:%M:%S", time.localtime()),
        "pid": None,
    }
    p = subprocess.Popen(
        cmd, shell=True, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        start_new_session=True,
    )
    task["pid"] = p.pid
    registry.push(task)
    try:
        stdout, stderr = p.communicate()
    finally:
        registry.remove(task["id"])
    return {
        "returncode": p.returncode,
        "host": task["host"],
        "cmd": cmd,
        "start": task["start"],
        "end": time.strftime("%Y-%m-%d %H:%M:%S", time.localtime()),
        "msg": stdout.decode(errors="replace") + stderr.decode(errors="replace"),
    }


def kill_task(task_id: str, registry: TaskRegistry | None = None) -> dict:
    """SIGTERM a registered task's process group (api.py:107-122)."""
    registry = registry or TaskRegistry()
    task = registry.get_task(task_id)
    if task is None:
        return {"returncode": -1, "msg": "unknown task"}
    if task["host"] != _HOST:
        return {"returncode": -1, "msg": "task runs on another host"}
    try:
        os.killpg(int(task["pid"]), signal.SIGTERM)
    except (ProcessLookupError, PermissionError) as e:
        return {"returncode": -1, "msg": str(e)}
    registry.remove(task_id)
    return {"returncode": 0, "msg": "success"}


class _Handler(BaseHTTPRequestHandler):
    registry: TaskRegistry  # set by make_server

    def log_message(self, *a):  # quiet
        pass

    def _json(self, obj, code: int = 200) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (stdlib naming)
        parts = urlsplit(self.path)
        q = {k: v[0] for k, v in parse_qs(parts.query).items()}
        segs = [s for s in parts.path.split("/") if s]
        if segs[:2] == ["openapi", "spiders"]:
            return self._json(list_spiders())
        if segs[:2] == ["openapi", "tasks"]:
            tasks = self.registry.get_tasks(q.get("spider"), q.get("sort", "spider"))
            return self._json({"total": len(tasks), "tasks": tasks})
        if segs[:2] == ["openapi", "run"] and len(segs) == 3:
            cmd = q.get("cmd")
            if not cmd:
                return self._json({"returncode": -1, "msg": "cmd required"}, 400)
            return self._json(run_task(segs[2], cmd, self.registry))
        if segs[:2] == ["openapi", "kill"] and len(segs) == 3:
            return self._json(kill_task(segs[2], self.registry))
        return self._json({"msg": "not found"}, 404)


def make_server(port: int = 0, registry: TaskRegistry | None = None) -> ThreadingHTTPServer:
    """Bind the control plane on 127.0.0.1:port (0 = ephemeral). Caller owns
    serve_forever()/shutdown() — tests run it in a thread."""
    handler = type("Handler", (_Handler,), {"registry": registry or TaskRegistry()})
    return ThreadingHTTPServer(("127.0.0.1", port), handler)


def serve(port: int = 2021) -> None:  # pragma: no cover - manual entry point
    srv = make_server(port)
    print(json.dumps({"listening": f"http://127.0.0.1:{srv.server_address[1]}"}))
    srv.serve_forever()
