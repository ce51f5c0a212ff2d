"""Crawler scaffolding generator — the ``easy_scrapy.py`` analog.

The reference bootstraps a new site with three generated files (spider /
items / job, plus an optional job_patch) from ``${placeholder}`` templates
(easy_scrapy.py:368-458, README.md:201-213). Here the per-site surface is
one declarative ``CrawlSpec`` (spec.py), so ``new()`` emits:

- ``{name}_spec.py``    — runnable spec module (spider + job fused): seeds,
                          parser registry, policy, and a ``run()`` launcher
- ``{name}_schema.py``  — the items analog: output table schemas to extend
- ``{name}_patch.py``   — the job_patch analog: re-crawl missing rows

Like the reference, existing files are never overwritten (easy_scrapy.py
raises on collision) and each file is stamped with name/describe/author/
time. The generated spec crawls t1 out of the box (tests/test_scaffold.py
proves it against the reference-loop oracle).
"""

from __future__ import annotations

import os
import time

_SPEC_TMPL = '''"""${describe}

Crawl spec for ``${name}`` — generated ${time} by `spiderman_ray.cli new`
(author: ${author}). Edit the three marked blocks; everything else is the
shared engine. Reference shape: SP_JOBS/${name}_job.py + SP/spiders/${name}.py.
"""

from spiderman_ray.parsers import PARSERS
from spiderman_ray.policy import CrawlPolicy
from spiderman_ray.simweb import SimParams
from spiderman_ray.spec import CrawlSpec, build_engine, default_seeds


def make_spec(scale: str = "t1") -> CrawlSpec:
    return CrawlSpec(
        name="${name}",
        params=SimParams.for_scale(scale),
        # 1) POLICY: dedup mode, retries, politeness, splash routing
        policy=CrawlPolicy(),
        # 2) PARSERS: callback registry — replace entries with your own
        #    ``fn(response, request_row) -> (rows, child_requests)``
        parsers=dict(PARSERS),
        # 3) SEEDS: the make_job equivalent — ``fn(web) -> [request rows]``
        seed_fn=default_seeds,
    )


def run(out_dir: str = "/tmp/${name}_run", scale: str = "t1", *,
        resume: bool = False, **engine_kwargs) -> dict:
    """Launch the crawl (the job's __main__). Owns no Ray session —
    call from the CLI / a script that already initialised Ray."""
    eng = build_engine(make_spec(scale), out_dir, **engine_kwargs)
    try:
        return eng.run(resume=resume)
    finally:
        pool = getattr(eng, "_pool", None)
        if pool is not None:
            pool.shutdown()


if __name__ == "__main__":
    import json

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    print(json.dumps(run()))
    ray.shutdown()
'''

_SCHEMA_TMPL = '''"""${describe}

Output table schemas for ``${name}`` — generated ${time} (author:
${author}). The items-class analog (SP/items/${name}_items.py): extend
these when your parsers emit extra columns; the engine sinks whatever
columns the parser rows carry, these schemas document the contract.
"""

from spiderman_ray.schemas import DETAILS, IMAGES, PAGES  # noqa: F401

# e.g. PAGES_EXTRA = PAGES.append(pa.field("my_col", pa.string()))
'''

_PATCH_TMPL = '''"""${describe}

Patch job for ``${name}`` — generated ${time} (author: ${author}).
Re-crawls anything scheduled but missing from the sinks (the
SP_JOBS/${name}_job_patch.py analog): completeness anti-joins find missing
pages/details/images, re-offers release seen-set entries, and the engine
re-runs only those. Requires a prior ``run()`` checkpoint at ``out_dir``.
"""

from spiderman_ray.patch import run_patch
from spiderman_ray.policy import load_policy
from spiderman_ray.spec import build_engine

from ${name}_spec import make_spec


def patch(out_dir: str = "/tmp/${name}_run", scale: str = "t1") -> dict:
    spec = make_spec(scale)
    # the stored policy wins: patching with fresh defaults would silently
    # change splash/dedup semantics mid-checkpoint (policy.py contract)
    stored = load_policy(out_dir)
    if stored is not None:
        spec.policy = stored
    eng = build_engine(spec, out_dir)
    try:
        return run_patch(eng)
    finally:
        pool = getattr(eng, "_pool", None)  # set by run(); patch may not crawl
        if pool is not None:
            pool.shutdown()


if __name__ == "__main__":
    import json

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    print(json.dumps(patch()))
    ray.shutdown()
'''


def spider_info(name: str, dest_dir: str) -> dict[str, str]:
    """Paths of the generated triple (easy_scrapy.spider_info analog)."""
    return {
        "spec_path": os.path.join(dest_dir, f"{name}_spec.py"),
        "schema_path": os.path.join(dest_dir, f"{name}_schema.py"),
        "patch_path": os.path.join(dest_dir, f"{name}_patch.py"),
    }


def _render(tmpl: str, replace_map: dict[str, str]) -> str:
    for key, val in replace_map.items():
        tmpl = tmpl.replace(key, val)
    return tmpl


def new(
    name: str,
    dest_dir: str,
    describe: str = "",
    author: str = "",
    patch_only: bool = False,
) -> dict[str, str]:
    """Create a new crawler scaffold; returns {kind: path}. Raises on any
    existing file (the reference's collision contract) and on names that
    are not valid module identifiers."""
    if not name or not name.isidentifier():
        raise NameError(f"spider name must be a Python identifier, got {name!r}")
    os.makedirs(dest_dir, exist_ok=True)
    info = spider_info(name, dest_dir)
    want = {"patch_path": info["patch_path"]} if patch_only else info
    for path in want.values():
        if os.path.exists(path):
            raise FileExistsError(f"{path} already exists")
    replace_map = {
        "${name}": name,
        "${describe}": describe or f"{name} crawler",
        "${author}": author or os.environ.get("USER", "spiderman"),
        "${time}": time.strftime("%Y-%m-%d %H:%M", time.localtime()),
    }
    tmpls = {
        "spec_path": _SPEC_TMPL,
        "schema_path": _SCHEMA_TMPL,
        "patch_path": _PATCH_TMPL,
    }
    for kind, path in want.items():
        with open(path, "w", encoding="utf-8") as f:
            f.write(_render(tmpls[kind], replace_map))
    return want
