"""cookies_tool analog (SP/utils/cookies_tool.py): acquisition shapes,
determinism, and the CrawlSpec pool bridge. Pure-python — no Ray session."""

import pytest

from spiderman_ray.functions.cookies_tool import (
    acquire_cookie_pool,
    cookies_str_from_dict,
    dict_from_cookies_str,
    get_normal_cookies,
    get_sp_cookies,
    get_ys_cookies,
)
from spiderman_ray.simweb import SimParams, SimResponse, SimWeb


@pytest.fixture(scope="module")
def web():
    return SimWeb(SimParams.for_scale("t1", render_rate=0.5))


def test_cookies_str_roundtrip():
    s = "a=1;b=x=y;c="
    d = dict_from_cookies_str(s)
    assert d == {"a": "1", "b": "x=y", "c": ""}  # first-'=' split, ref contract
    assert dict_from_cookies_str(cookies_str_from_dict(d)) == d


def test_normal_cookies_deterministic_per_host(web):
    u1 = web.list_url(0)
    c1 = get_normal_cookies(web, u1)
    assert set(c1) == {"session"}
    assert get_normal_cookies(web, u1) == c1  # deterministic
    # same host, different path -> same session; different host -> different
    same_host = [u for p in range(web.p.pages)
                 if (u := web.list_url(p)).startswith("https://" + u1.split("://")[1].split("/")[0])]
    if len(same_host) > 1:
        assert get_normal_cookies(web, same_host[1]) == c1
    other = next(
        (web.list_url(p) for p in range(web.p.pages)
         if web.host_of_page(p) != u1.split("://")[1].split("/")[0]),
        None,
    )
    if other:
        assert get_normal_cookies(web, other) != c1
    cookies, resp = get_normal_cookies(web, u1, source=True)
    assert cookies == c1 and isinstance(resp, SimResponse)


def test_sp_cookies_superset_with_js_token(web):
    u = web.list_url(0)
    normal = get_normal_cookies(web, u)
    sp, page = get_sp_cookies(web, u, source=True)
    assert normal.items() <= sp.items()  # session survives the merge loop
    assert "js_token" in sp
    assert isinstance(page, SimResponse)
    assert get_sp_cookies(web, u, times=3) != sp  # wait time keys the token


def test_sp_cookies_see_rendered_detail(web):
    """The splash path fetches THROUGH the render gate: a JS-rendered
    detail page returns its fields to get_sp_cookies but a shell to a
    plain fetch."""
    rendered = next(
        (web.detail_url(p, d)
         for p in range(web.p.pages) for d in range(web.p.details)
         if web.needs_render(web.detail_url(p, d))),
        None,
    )
    assert rendered is not None  # render_rate=0.5 at t1 plants some
    _, page = get_sp_cookies(web, rendered, source=True)
    assert page.fields  # rendered content visible
    assert not web.fetch(rendered).fields  # plain fetch sees the shell


def test_ys_cookies_two_step(web):
    u = web.list_url(0)
    c = get_ys_cookies(web, u)
    assert set(c) == {"session", "security_session_verify"}
    assert c["session"] == get_normal_cookies(web, u)["session"]
    cookies, resp = get_ys_cookies(web, u, source=True)
    assert cookies == c and isinstance(resp, SimResponse)


def test_acquire_cookie_pool_feeds_spec(web):
    from spiderman_ray.spec import CrawlSpec

    urls = [web.list_url(p) for p in range(3)]
    pool = acquire_cookie_pool(web, urls, mode="splash")
    assert len(pool) == 3
    spec = CrawlSpec(cookies=pool)
    jar = dict_from_cookies_str(spec.cookies[0])
    assert "session" in jar and "js_token" in jar
    with pytest.raises(ValueError):
        acquire_cookie_pool(web, urls, mode="bogus")
