import pyarrow as pa

from spiderman_ray.functions.textops import (
    clean,
    clean_column,
    coalesce,
    deal_time_stamp,
    decode_base64,
    encode_base64,
)
from spiderman_ray.functions.urls import (
    canonical_host,
    canonicalize,
    get_file_type,
    url_check,
    url_check_mask,
    urljoin,
)


def test_url_check_reference_dirty_words():
    # SP/utils/tool.py:116-134 semantics
    assert not url_check("https://www.baidu.com/x")
    assert not url_check("javascript:void(0)")
    assert not url_check("mailto:someone@x.com")
    assert url_check("https://esf.zhifang.com/dq00000/1")
    assert not url_check("https://ok.example/x", dirty_words="ok.example")
    assert not url_check("https://ok.example/x", dirty_words=["nope", "example"])


def test_url_check_mask_matches_scalar():
    urls = [
        "https://www.baidu.com/x",
        "https://esf.zhifang.com/1",
        "mailto:a@qq.com",
        "https://fine.example/a",
    ]
    mask = url_check_mask(pa.array(urls))
    assert mask.to_pylist() == [url_check(u) for u in urls]


def test_get_file_type():
    # SP/utils/tool.py:88-113 semantics
    assert get_file_type("http://x/a.jpg") == "jpg"
    assert get_file_type("http://x/a.JPG?v=1") == "JPG"  # case preserved, suffix stripped
    assert get_file_type("http://x/a.png&size=2") == "png"
    assert get_file_type("http://x/a.html", "jpg") == "jpg"  # fallback arg
    assert get_file_type("data:image/png;base64,AAA") == "png"
    assert get_file_type("http://x/a.html") == ""


def test_urljoin_and_canonicalize():
    assert urljoin("https://esf.zhifang.com/dq00000/1", "/detail/9") == (
        "https://esf.zhifang.com/detail/9"
    )
    assert canonicalize("HTTPS://Host.Example:443/p?q=1#frag") == "https://host.example/p?q=1"
    assert canonicalize("http://host.example") == "http://host.example/"
    assert canonical_host("https://A.B.Example:8080/x") == "a.b.example"


def test_clean_reference_rule():
    # SP/utils/tool.py:17-27
    assert clean("  a\nb\tc\x0d\xa0\001  ") == "abc"
    assert clean(None) == ""
    assert clean(123) == "123"


def test_clean_column_matches_scalar():
    vals = ["  a\nb ", None, "\tx\x0d", "ok"]
    out = clean_column(pa.array(vals)).to_pylist()
    assert out == [clean(v) for v in vals]


def test_coalesce():
    assert coalesce(["", None, "x", "y"]) == "x"
    assert coalesce([[], ["a", "b"]]) == "a"
    assert coalesce("z") == "z"
    assert coalesce([None, ""]) == ""


def test_base64_roundtrip():
    assert decode_base64(encode_base64("héllo")) == "héllo"


def test_deal_time_stamp():
    assert deal_time_stamp(1600000000, unit="s") == "2020-09-13"
    assert deal_time_stamp(1600000000000, unit="ms") == "2020-09-13"


def test_write_delimited_sanitizes_values(tmp_path):
    """Datafile-sink contract: delimiter and newlines stripped FROM values,
    header line first, str() coercion (pipelines_datafile.py:62-100)."""
    import pyarrow as pa

    from spiderman_ray.sources.table_io import write_delimited

    tbl = pa.table(
        {
            "a": ["x|y", "line\nbreak"],
            "b": [1, 2],
        }
    )
    path = write_delimited(tbl, str(tmp_path), "t", delimiter="|")
    lines = open(path).read().splitlines()
    assert lines == ["a|b", "xy|1", "linebreak|2"]


def test_rdbms_sink_roundtrip_idempotent_and_poison(tmp_path):
    """RdbmPipeline-parity sqlite sink: meta columns added, values stored
    as TEXT, re-running a load does not duplicate (deterministic keyid +
    INSERT OR REPLACE), and a poison row is dropped row-at-a-time instead
    of failing the batch (pipelines_rdbm.py:90-105 fallback)."""
    import sqlite3

    import pyarrow as pa

    from spiderman_ray.sources.rdbms import read_table_rdbms, write_table_rdbms

    db = str(tmp_path / "sink.db")
    tbl = pa.table({"pkey": ["a", "b", "c"], "price": [1, 2, 3]})
    res = write_table_rdbms(tbl, db, "zhifang_list", bizdate="2026-08-17")
    assert res == {"rows_written": 3, "rows_dropped": 0, "table": "zhifang_list"}

    back = read_table_rdbms(db, "zhifang_list")
    assert back.num_rows == 3
    assert back.column_names == [
        "keyid", "pkey", "price", "bizdate", "ctime", "spider"
    ]
    assert set(back["price"].to_pylist()) == {"1", "2", "3"}  # VARCHAR parity
    assert all(k.startswith("2026-08-17_") for k in back["keyid"].to_pylist())

    # idempotent re-load: same content -> same keyids -> REPLACE, no dupes
    write_table_rdbms(tbl, db, "zhifang_list", bizdate="2026-08-17")
    assert read_table_rdbms(db, "zhifang_list").num_rows == 3

    # poison row: pre-create the table with a CHECK the batch violates once
    db2 = str(tmp_path / "poison.db")
    con = sqlite3.connect(db2)
    con.execute(
        'CREATE TABLE "t" (keyid TEXT PRIMARY KEY, "pkey" TEXT, "price" TEXT, '
        "bizdate TEXT, ctime TEXT, spider TEXT, CHECK (\"price\" != '2'))"
    )
    con.commit()
    con.close()
    res2 = write_table_rdbms(tbl, db2, "t", bizdate="2026-08-17")
    assert res2["rows_written"] == 2 and res2["rows_dropped"] == 1
    assert set(read_table_rdbms(db2, "t")["pkey"].to_pylist()) == {"a", "c"}


def test_rdbms_sink_empty_table_still_created(tmp_path):
    """A 0-row input must still leave a queryable (empty) table behind —
    empty crawl tables are a supported case."""
    import pyarrow as pa

    from spiderman_ray.sources.rdbms import read_table_rdbms, write_table_rdbms

    db = str(tmp_path / "empty.db")
    tbl = pa.table({"pkey": pa.array([], type=pa.string()),
                    "price": pa.array([], type=pa.int64())})
    res = write_table_rdbms(tbl, db, "t", bizdate="2026-08-17")
    assert res["rows_written"] == 0
    back = read_table_rdbms(db, "t")
    assert back.num_rows == 0
    assert back.column_names == ["keyid", "pkey", "price", "bizdate", "ctime", "spider"]
