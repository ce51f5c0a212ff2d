"""Scaffolding generator (easy_scrapy analog): the generated spec module
must be importable and crawl t1 with reference-loop-exact results."""

import importlib.util
import sys

import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _import_from(path: str, modname: str):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod  # the patch stub imports `{name}_spec`
    spec.loader.exec_module(mod)
    return mod


def test_new_generates_runnable_spec_that_crawls_t1(tmp_path):
    from spiderman_ray.engine import read_table_all_gens
    from spiderman_ray.oracle import run_oracle
    from spiderman_ray.scaffold import new
    from spiderman_ray.simweb import SimParams

    d = str(tmp_path / "gen")
    paths = new("mysite", d, describe="test site", author="pytest")
    assert sorted(paths) == ["patch_path", "schema_path", "spec_path"]

    mod = _import_from(paths["spec_path"], "mysite_spec")
    out = str(tmp_path / "run")
    metrics = mod.run(out_dir=out, scale="t1")

    o = run_oracle(SimParams.for_scale("t1"))
    assert metrics["crawled"] == o.metrics["crawled"]
    assert metrics["images"] == o.metrics["images"]
    co = (
        read_table_all_gens(out, "crawl_order")
        .to_pandas()
        .sort_values(["generation", "seq"])
    )
    assert co["url"].tolist() == [c["url"] for c in o.crawl_order]

    # the schema module imports and re-exports the table contracts
    sch = _import_from(paths["schema_path"], "mysite_schema")
    assert sch.PAGES.names[0] == "title"

    # the patch stub imports against the generated spec and reports
    # nothing missing on a complete crawl
    patch_mod = _import_from(paths["patch_path"], "mysite_patch")
    res = patch_mod.patch(out_dir=out, scale="t1")
    assert isinstance(res, dict)


def test_new_refuses_collisions_and_bad_names(tmp_path):
    from spiderman_ray.scaffold import new

    d = str(tmp_path / "gen2")
    new("asite", d)
    with pytest.raises(FileExistsError):
        new("asite", d)
    with pytest.raises(NameError):
        new("bad-name", d)
    # patch_only creates just the patch stub for an existing crawler
    paths = new("bsite", d, patch_only=True)
    assert sorted(paths) == ["patch_path"]


def test_cli_new_command(tmp_path, capsys):
    from spiderman_ray.cli import main

    rc = main(["new", "clisite", "--dir", str(tmp_path / "cli")])
    assert rc == 0
    assert "clisite_spec.py" in capsys.readouterr().out
    rc = main(["new", "clisite", "--dir", str(tmp_path / "cli")])
    assert rc == 1  # collision reported as an error, not a traceback
