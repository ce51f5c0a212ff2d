"""The deterministic simulated web: pages, images, failures — all pure
functions of (seed, scale params, URL).

Replaces the live HTTP surface the reference crawls
(SP/spiders/zhifang.py:63-132: list pages -> detail pages -> image files).
Every page and image is derivable from its URL alone, so fetch workers need
NO broadcast site table — the "network" costs nothing to ship to 256 nodes.

Failure model mirrors the reference's retry policy surface:
- retryable HTTP codes (SP/settings.py:122-124) on the first ``fail_attempts``
  attempts of ~5% of URLs (then success); ~1% of URLs always fail -> dead
  letter after the retry budget, like scrapy dropping non-2xx responses.
- ~1% of pages have ``body_size`` below a MINSIZE threshold: retried, and
  when the budget is exhausted the (200) response is parsed anyway —
  exactly ``SizeRetryMiddleWare``'s ``self._retry(...) or response``
  (SP/middlewares/SPMiddleWare.py:145-153).

Site shape (mirrors zhifang, FIXTURES.md §2):
- ``https://{host}/list/{p}``        p in 1..P, host Zipf-skewed (host0 ~35%)
- ``https://{host}/detail/{p}-{d}``  d in 0..D-1, same host as its list page;
  ~3% are ``/private/{p}-{d}`` which robots disallows
- ``https://{imghost}/im/{p}-{d}-{k}.{jpg|png}``
- ~20% of list-page link slots point at an EARLIER page's detail (duplicate
  links -> dedup work); ~10% of image slots point at an earlier detail's
  image.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from spiderman_ray.functions.hashing import md5_hex
from spiderman_ray.functions.imaging import encode_image, generate_pixels

#: SP/settings.py:124
RETRY_HTTP_CODES = (500, 502, 503, 504, 522, 524, 408, 400, 403, 404)

#: Deterministic stand-in for the reference's random 18-entry UA pool
#: (SP/middlewares/SPMiddleWare.py:18-46): pick = f(url, attempt).
UA_POOL_SIZE = 18

#: Deterministic stand-in for the CookiesPool middleware's random pick from
#: the account cookie pool (SP/middlewares/SPMiddleWare.py:88-103): one
#: cookie jar per request, pick = f(url, attempt). Recorded in crawl_order
#: like ua_idx so engine ≡ oracle is testable per fetch.
COOKIE_POOL_SIZE = 10

#: Deterministic stand-in for ProxyMiddleWare's rotating dynamic proxy
#: (SPMiddleWare.py:66-85: one endpoint, a new upstream identity per
#: request): proxy slot pick = f(url, attempt), recorded in crawl_order
#: like ua_idx/cookie_idx so engine ≡ oracle is testable per fetch.
PROXY_POOL_SIZE = 8

#: The reference loads ONE static header set per spider at middleware init
#: (SPMiddleWare.py:49-63, headers read once from file). Deterministic
#: analog: a fixed header dict; per-request behavior is covered by the
#: ua_idx/cookie_idx picks.
DEFAULT_HEADERS = {
    "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
    "Accept-Language": "en-US,en;q=0.5",
    "Connection": "keep-alive",
}

SCALES: dict[str, dict] = {
    "t1": dict(pages=5, details=4, images=2, hosts=3, img_hosts=2),
    "t2": dict(pages=50, details=10, images=4, hosts=8, img_hosts=3),
    # bench uses web-realistic image dimensions so the measured workload is
    # dominated by image decode/hash compute, as a real crawl's would be
    "bench": dict(
        pages=500, details=20, images=8, hosts=16, img_hosts=4,
        img_sizes=(96, 128, 160, 224, 256),
    ),
}

_WORDS = (
    "garden view sunny corner tower plaza river park lake hill stone brick "
    "glass oak pine maple court gate bridge harbor"
).split()


@dataclass(frozen=True)
class SimParams:
    pages: int = 5
    details: int = 4
    images: int = 2
    hosts: int = 3
    img_hosts: int = 2
    seed: int = 42
    dup_link_rate: float = 0.20
    dup_image_rate: float = 0.10
    private_rate: float = 0.03
    hot_host_share: float = 0.35
    fail_rate: float = 0.05
    dead_rate: float = 0.01
    small_body_rate: float = 0.01
    img_sizes: tuple = (32, 48, 64, 96, 128)
    #: POST-search seeds (0 = off): each seed POSTs {"kw": k} to the host's
    #: /search endpoint — same URL, different bodies (FormRequest parity,
    #: SP/spiders/SPRedisSpider.py:55-59)
    search_seeds: int = 0
    #: fraction of detail pages that are JS-rendered (0 = off): a plain
    #: fetch returns a SHELL (no fields, no image slots) unless the request
    #: goes through the render path — the scrapy-splash scenario
    #: (SP/spiders/SPRedisSpider.py:47-54, zhifang.py:90)
    render_rate: float = 0.0

    @classmethod
    def for_scale(cls, scale: str, **overrides) -> "SimParams":
        return cls(**{**SCALES[scale], **overrides})


@dataclass
class SimResponse:
    url: str
    kind: str  # 'list' | 'detail' | 'image'
    links: list[str] = field(default_factory=list)  # list page: detail urls (DOM order)
    rows: list[dict] = field(default_factory=list)  # list page: aligned row fields
    fields: dict = field(default_factory=dict)  # detail page payload
    image_urls: list[str] = field(default_factory=list)  # detail page
    captions: list[str] = field(default_factory=list)  # aligned with image_urls
    body: bytes = b""  # image bytes


def fetch_outcome(web: "SimWeb", url: str, policy) -> tuple[bool, int, int, bool]:
    """(success, attempts_used, last_status, size_exhausted) — deterministic.
    THE single fetch-outcome arithmetic, shared by the oracle and the engine
    fetch stage (parity by construction; see also parsers.py)."""
    fail_n = web.fail_attempts_for(url)
    if fail_n >= policy.max_attempts:
        return False, policy.max_attempts, web.status_code_for(url), False
    attempts = fail_n + 1
    size_exhausted = False
    if policy.min_size is not None and web.body_size_for(url) < policy.min_size:
        # size-retries exhaust the budget; the (200) response parses anyway
        # (SizeRetryMiddleWare's `self._retry(...) or response`)
        attempts = policy.max_attempts
        size_exhausted = True
    return True, attempts, 200, size_exhausted


class SimWeb:
    """Stateless page/image oracle for one parameterization. Construct freely
    in every worker — creation is O(1)."""

    def __init__(self, params: SimParams):
        self.p = params

    # -- deterministic unit randoms ---------------------------------------
    def _u(self, tag: str, *key) -> float:
        h = md5_hex(f"{self.p.seed}|{tag}|" + "|".join(map(str, key)))
        return int(h[:8], 16) / 2**32

    def _pick(self, tag: str, n: int, *key) -> int:
        h = md5_hex(f"{self.p.seed}|{tag}|" + "|".join(map(str, key)))
        return int(h[8:16], 16) % n

    # -- topology ----------------------------------------------------------
    def host_of_page(self, p: int) -> str:
        if self._u("host", p) < self.p.hot_host_share or self.p.hosts == 1:
            return "h0.shop.example"
        return f"h{1 + self._pick('host2', self.p.hosts - 1, p)}.shop.example"

    def is_private(self, p: int, d: int) -> bool:
        return self._u("priv", p, d) < self.p.private_rate

    def list_url(self, p: int) -> str:
        return f"https://{self.host_of_page(p)}/list/{p}"

    def detail_url(self, p: int, d: int) -> str:
        seg = "private" if self.is_private(p, d) else "detail"
        return f"https://{self.host_of_page(p)}/{seg}/{p}-{d}"

    def image_url(self, p: int, d: int, k: int) -> str:
        host = f"img{self._pick('imghost', self.p.img_hosts, p, d, k)}.cdn.example"
        ext = "jpg" if self._u("ext", p, d, k) < 0.7 else "png"
        return f"https://{host}/im/{p}-{d}-{k}.{ext}"

    def list_link_targets(self, p: int) -> list[tuple[int, int]]:
        """(p, d) identity of each link slot on list page p, DOM order;
        ~dup_link_rate of slots on pages >1 point at an earlier page."""
        out = []
        for d in range(self.p.details):
            if p > 1 and self._u("dup", p, d) < self.p.dup_link_rate:
                tp = 1 + self._pick("dupP", p - 1, p, d)
                td = self._pick("dupD", self.p.details, p, d)
                out.append((tp, td))
            else:
                out.append((p, d))
        return out

    def image_slot_targets(self, p: int, d: int) -> list[tuple[int, int, int]]:
        out = []
        for k in range(self.p.images):
            ordinal = p * self.p.details + d
            if ordinal > self.p.details and self._u("idup", p, d, k) < self.p.dup_image_rate:
                t = self._pick("idupT", ordinal - self.p.details, p, d, k) + self.p.details
                tp, td = divmod(t, self.p.details)
                tk = self._pick("idupK", self.p.images, p, d, k)
                out.append((tp, td, tk))
            else:
                out.append((p, d, k))
        return out

    # -- page content ------------------------------------------------------
    def row_fields(self, tp: int, td: int) -> dict:
        w = _WORDS
        return {
            "title": f"Plot {tp}-{td}",
            "desc": f"{2 + self._pick('rooms', 4, tp, td)}room "
            f"{w[self._pick('w1', len(w), tp, td)]}",
            "location": f"district {self._pick('dist', 12, tp, td)}",
            "price": f"{3000 + self._pick('price', 5000, tp, td)}",
        }

    def detail_fields(self, p: int, d: int) -> dict:
        w = _WORDS
        return {
            "type1": f"type-{self._pick('t1', 5, p, d)}",
            "type2": f"floor-{1 + self._pick('t2', 30, p, d)}",
            "type3": f"face-{self._pick('t3', 4, p, d)}",
            "plot_name": f"Plot {p}-{d}",
            "area": f"{40 + self._pick('area', 200, p, d)}m2",
            "look_time": f"2021-{1 + self._pick('lm', 12, p, d):02d}-{1 + self._pick('ld', 28, p, d):02d}",
            "source_id": md5_hex(f"{self.p.seed}|src|{p}|{d}")[:12],
        }

    def caption_of(self, p: int, d: int, k: int) -> str:
        """Caption bound to the image's own identity (first-wins fkey does not
        change it)."""
        w = _WORDS
        ws = " ".join(w[self._pick(f"cap{i}", len(w), p, d, k)] for i in range(3))
        return f"Plot {p}-{d} photo {k}: {ws}"

    def image_dims(self, p: int, d: int, k: int) -> tuple[int, int]:
        sizes = self.p.img_sizes
        return (
            sizes[self._pick("imw", len(sizes), p, d, k)],
            sizes[self._pick("imh", len(sizes), p, d, k)],
        )

    def image_bytes(self, p: int, d: int, k: int) -> tuple[bytes, str, int, int]:
        url = self.image_url(p, d, k)
        fmt = "jpeg" if url.endswith(".jpg") else "png"
        w, h = self.image_dims(p, d, k)
        data = encode_image(generate_pixels(url, w, h), fmt, quality=90)
        return data, fmt, w, h

    # -- failure model (shared by oracle AND engine fetchers) -------------
    def fail_attempts_for(self, url: str) -> int:
        r = self._u("fail", url)
        if r < self.p.dead_rate:
            return 99  # always fails -> dead letter
        if r < self.p.dead_rate + self.p.fail_rate:
            return 1 + self._pick("failN", 3, url)  # 1..3 failures then success
        return 0

    def status_code_for(self, url: str) -> int:
        return RETRY_HTTP_CODES[self._pick("code", len(RETRY_HTTP_CODES), url)]

    def body_size_for(self, url: str) -> int:
        if self._u("size", url) < self.p.small_body_rate:
            return 64  # below any sane MINSIZE -> size-retry path
        return 600 + self._pick("sizeN", 4000, url)

    def latency_ms(self, url: str) -> float:
        """Deterministic simulated download latency: base + a
        size-proportional term + per-url jitter. Feeds the AutoThrottle
        analog (state/politeness.throttle_step) on BOTH the engine and the
        oracle — identical float64 arithmetic by construction."""
        return 20.0 + self.body_size_for(url) / 256.0 + 180.0 * self._u("lat", url)

    def ua_index(self, url: str, attempt: int) -> int:
        return self._pick("ua", UA_POOL_SIZE, url, attempt)

    def cookie_index(self, url: str, attempt: int) -> int:
        """CookiesPool pick for the FINAL attempt of a fetch — deterministic
        f(url, attempt), same contract as ua_index."""
        return self._pick("cookie", COOKIE_POOL_SIZE, url, attempt)

    def proxy_index(self, url: str, attempt: int) -> int:
        """Rotating-proxy identity for the FINAL attempt of a fetch
        (ProxyMiddleWare, SPMiddleWare.py:66-85) — deterministic
        f(url, attempt), same contract as ua_index/cookie_index."""
        return self._pick("proxy", PROXY_POOL_SIZE, url, attempt)

    # -- the network -------------------------------------------------------
    def search_url(self, host_idx: int = 0) -> str:
        return f"https://h{host_idx}.shop.example/search"

    def search_results(self, kw: int) -> list[tuple[int, int]]:
        """Deterministic detail identities matching a search keyword."""
        n = 1 + self._pick("srchN", 3, kw)
        return [
            (1 + self._pick(f"srchP{i}", self.p.pages, kw), self._pick(f"srchD{i}", self.p.details, kw))
            for i in range(n)
        ]

    def parse_url(self, url: str) -> tuple[str, tuple]:
        rest = url.split("://", 1)[1]
        host, _, path = rest.partition("/")
        segs = path.split("/")
        if segs[0] == "search":
            return "search", ()
        if segs[0] == "list":
            return "list", (int(segs[1]),)
        if segs[0] in ("detail", "private"):
            p, d = segs[1].split("-")
            return "detail", (int(p), int(d))
        if segs[0] == "im":
            stem = segs[1].rsplit(".", 1)[0]
            p, d, k = stem.split("-")
            return "image", (int(p), int(d), int(k))
        raise ValueError(f"not a simulated-web url: {url}")

    def needs_render(self, url: str) -> bool:
        """True for JS-rendered detail pages (render_rate subset): their
        plain fetch returns a shell; only a render fetch sees content."""
        if self.p.render_rate <= 0:
            return False
        kind, key = self.parse_url(url)
        return kind == "detail" and self._u("render", *key) < self.p.render_rate

    def fetch(self, url: str, body: str = "", render: bool = False) -> SimResponse:
        """Content of a URL (success case — failures are modeled by the
        caller via ``fail_attempts_for``). POST bodies select content for
        the /search endpoint (same URL, different payloads). ``render``
        is the SplashRequest path (SPRedisSpider.py:47-54): JS-rendered
        detail pages return an empty SHELL without it."""
        import json as _json

        kind, key = self.parse_url(url)
        if kind == "detail" and not render and self.needs_render(url):
            return SimResponse(url=url, kind="detail")  # shell: no content
        if kind == "search":
            kw = int(_json.loads(body or "{}").get("kw", 0))
            targets = self.search_results(kw)
            return SimResponse(
                url=url,
                kind="search",
                links=[self.detail_url(tp, td) for tp, td in targets],
                rows=[self.row_fields(tp, td) for tp, td in targets],
            )
        if kind == "list":
            (p,) = key
            targets = self.list_link_targets(p)
            return SimResponse(
                url=url,
                kind="list",
                links=[self.detail_url(tp, td) for tp, td in targets],
                rows=[self.row_fields(tp, td) for tp, td in targets],
            )
        if kind == "detail":
            p, d = key
            slots = self.image_slot_targets(p, d)
            return SimResponse(
                url=url,
                kind="detail",
                fields=self.detail_fields(p, d),
                image_urls=[self.image_url(*t) for t in slots],
                captions=[self.caption_of(*t) for t in slots],
            )
        p, d, k = key
        data, _, _, _ = self.image_bytes(p, d, k)
        return SimResponse(url=url, kind="image", body=data)

    # -- enumeration (synth / catalogs) -----------------------------------
    def seed_urls(self) -> list[str]:
        return [self.list_url(p) for p in range(1, self.p.pages + 1)]

    def politeness_config(self, delays_ms: dict[str, int] | None = None) -> dict:
        """host -> (crawl_delay_ms, robots_disallow, max_concurrency)."""
        cfg = {}
        for i in range(self.p.hosts):
            h = f"h{i}.shop.example"
            cfg[h] = {
                "crawl_delay_ms": (delays_ms or {}).get(h, 0),
                "robots_disallow": ["/private/"],
                "max_concurrency": 16,
            }
        for j in range(self.p.img_hosts):
            h = f"img{j}.cdn.example"
            cfg[h] = {
                "crawl_delay_ms": (delays_ms or {}).get(h, 0),
                "robots_disallow": [],
                "max_concurrency": 16,
            }
        return cfg

    def catalog_keys(self) -> list[tuple[int, int, int]]:
        """Every image identity in the site (reachable or not)."""
        return [
            (p, d, k)
            for p in range(1, self.p.pages + 1)
            for d in range(self.p.details)
            for k in range(self.p.images)
        ]
