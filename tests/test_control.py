"""Control-plane parity (api.py:63-123): spiders / tasks / run / kill over
the stdlib REST server and the JSON task registry."""

import json
import threading
import time
import urllib.request


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return json.loads(r.read())


def test_rest_spiders_tasks_run(tmp_path):
    from spiderman_ray.control import TaskRegistry, make_server

    reg = TaskRegistry(str(tmp_path / "tasks.json"))
    srv = make_server(0, reg)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        spiders = _get(port, "/openapi/spiders")
        assert spiders["total"] >= 3 and "bench" in spiders["spiders"]

        tasks = _get(port, "/openapi/tasks")
        assert tasks == {"total": 0, "tasks": {}}

        res = _get(port, "/openapi/run/t1?cmd=echo%20hello")
        assert res["returncode"] == 0 and "hello" in res["msg"]
        # synchronous run removed itself from the registry on exit
        assert _get(port, "/openapi/tasks")["total"] == 0

        missing = _get(port, "/openapi/kill/nope")
        assert missing["returncode"] == -1
    finally:
        srv.shutdown()


def test_kill_task_terminates_process_group(tmp_path):
    from spiderman_ray.control import TaskRegistry, kill_task, run_task

    reg = TaskRegistry(str(tmp_path / "tasks.json"))
    # long-running task launched asynchronously (thread), killed from outside
    result = {}

    def runner():
        result.update(run_task("t1", "sleep 300", reg))

    th = threading.Thread(target=runner, daemon=True)
    th.start()
    for _ in range(100):  # wait for registration
        tasks = reg.get_tasks()
        if tasks:
            break
        time.sleep(0.05)
    assert tasks, "task never registered"
    task = next(iter(tasks.values()))[0]

    res = kill_task(task["id"], reg)
    assert res["returncode"] == 0
    th.join(timeout=30)
    assert not th.is_alive()
    assert result["returncode"] != 0  # terminated, not a clean exit
    assert reg.get_tasks() == {}
    # killing again: unknown
    assert kill_task(task["id"], reg)["returncode"] == -1


def test_cli_query_list_names():
    """`cli query --list` prints the full registry without needing Ray."""
    import json as _json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "spiderman_ray.cli", "query", "--list"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0, out.stderr
    names = _json.loads(out.stdout.strip().splitlines()[-1])
    assert "curate" in names and "knn_graph" in names and len(names) >= 70


def test_registry_concurrent_writers_never_corrupt(tmp_path):
    """Regression for the kill-path race: the dying task's finally-remove
    and kill_task's remove (plus concurrent pushes) must never truncate
    each other's tmp file, lose the file, or leave invalid JSON."""
    from spiderman_ray.control import TaskRegistry

    reg = TaskRegistry(str(tmp_path / "tasks.json"))
    errs = []

    def hammer(tid):
        try:
            for i in range(60):
                reg.push({"id": f"{tid}-{i}", "spider": "s", "host": "h"})
                reg.remove(f"{tid}-{i}")
        except Exception as e:  # FileNotFoundError / JSONDecodeError pre-fix
            errs.append(e)

    threads = [threading.Thread(target=hammer, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    assert reg.get_tasks() == {}  # every push got its matching remove
