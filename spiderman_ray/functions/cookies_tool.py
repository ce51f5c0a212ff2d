"""Cookie acquisition utilities — the SP/utils/cookies_tool.py analog.

The reference acquires cookies three ways (cookies_tool.py:8-100): a plain
requests GET (``get_normal_cookies``), a Splash lua render that waits for
JS to set its cookies (``get_sp_cookies``), and the two-step yunsuo
handshake where a ``security_verify_data`` probe unlocks the verify cookie
(``get_ys_cookies``) — plus the cookies-string parser
(``dict_from_cookies_str``). There is no live network here, so the SERVER
side of each handshake is modeled deterministically against the simulated
web: a host session token is a pure function of (seed, host), the render
path additionally yields the JS-set token, and the ys verify token appears
only after the probe request. The acquisition SHAPES (which requests are
made, what merges into the jar, the ``source=`` return contract) match the
reference; the cookie VALUES are the simulation's.

``acquire_cookie_pool`` bridges to the engine surface: it fills
``CrawlSpec.cookies`` (the CookiesPoolMiddleWare pool,
SP/middlewares/SPMiddleWare.py:88-103) with freshly acquired jars instead
of hand-written strings.
"""

from __future__ import annotations

from spiderman_ray.functions.hashing import md5_hex
from spiderman_ray.simweb import SimResponse, SimWeb

#: the reference's yunsuo probe constant (cookies_tool.py:85)
YS_VERIFY_DATA = "313932302c31303830"


def dict_from_cookies_str(cookies_str: str) -> dict:
    """'k=v;k2=v2' -> dict (cookies_tool.py:59-64, exact contract: split on
    ';', then one split on the first '=' — values may contain '=')."""
    return dict([i.split("=", 1) for i in cookies_str.split(";")])


def cookies_str_from_dict(cookies: dict) -> str:
    """Inverse of ``dict_from_cookies_str`` (deterministic key order)."""
    return ";".join(f"{k}={v}" for k, v in sorted(cookies.items()))


def _host_of(url: str) -> str:
    return url.split("://", 1)[1].partition("/")[0]


def _token(web: SimWeb, tag: str, *key) -> str:
    """Deterministic 16-hex cookie value — the simulated server's
    Set-Cookie arithmetic (same md5(seed|tag|key) family as SimWeb._u)."""
    return md5_hex(f"{web.p.seed}|{tag}|" + "|".join(map(str, key)))[:16]


def get_normal_cookies(
    web: SimWeb, cookies_url: str, source: bool = False
) -> dict | tuple[dict, SimResponse]:
    """Plain-GET cookie acquisition (cookies_tool.get_normal_cookies):
    one ordinary fetch, the server's session cookie comes back. Returns
    the cookies dict, or (cookies, response) when ``source``."""
    response = web.fetch(cookies_url)
    host = _host_of(cookies_url)
    cookies = {"session": _token(web, "cookie_session", host)}
    if source:
        return cookies, response
    return cookies


def get_sp_cookies(
    web: SimWeb, cookies_url: str, times: int = 2, source: bool = False
) -> dict | tuple[dict, SimResponse]:
    """Render-path cookie acquisition (cookies_tool.get_sp_cookies — the
    Splash lua ``splash:go`` + ``splash:wait(times)`` + ``get_cookies``
    script): the fetch goes through the RENDER path, which is the only way
    JS-set cookies exist; the jar merges the session cookie with the
    JS token, exactly like the lua script's cookie-table merge loop.
    Returns cookies, or (cookies, rendered page) when ``source``."""
    response = web.fetch(cookies_url, render=True)
    host = _host_of(cookies_url)
    cookies: dict = {}
    # the reference merges every cookie table splash returns, in order
    for jar in (
        {"session": _token(web, "cookie_session", host)},
        {"js_token": _token(web, "cookie_js", host, times)},
    ):
        cookies.update(jar)
    if source:
        return cookies, response
    return cookies


def get_ys_cookies(
    web: SimWeb, ys_url: str, source: bool = False
) -> dict | tuple[dict, SimResponse]:
    """Two-step yunsuo handshake (cookies_tool.get_ys_cookies): request 1
    yields the base jar, request 2 carries the ``security_verify_data``
    probe and unlocks the verify cookie; both merge. A third sourced fetch
    returns the page itself, as the reference does under ``source``."""
    web.fetch(ys_url)  # step 1: base jar
    host = _host_of(ys_url)
    cookie = {"session": _token(web, "cookie_session", host)}
    web.fetch(ys_url)  # step 2: the ?security_verify_data probe
    cookie["security_session_verify"] = _token(
        web, "cookie_ys", host, YS_VERIFY_DATA
    )
    if source:
        return cookie, web.fetch(ys_url)
    return cookie


def acquire_cookie_pool(
    web: SimWeb, urls: list[str], mode: str = "normal", times: int = 2
) -> list[str]:
    """Fill a CookiesPoolMiddleWare-style pool (``CrawlSpec.cookies`` —
    list of cookie STRINGS, one jar per entry) by acquiring against each
    URL. ``mode``: 'normal' | 'splash' | 'ys'."""
    fns = {
        "normal": lambda u: get_normal_cookies(web, u),
        "splash": lambda u: get_sp_cookies(web, u, times=times),
        "ys": lambda u: get_ys_cookies(web, u),
    }
    if mode not in fns:
        raise ValueError(f"unknown mode {mode!r}")
    return [cookies_str_from_dict(fns[mode](u)) for u in urls]
