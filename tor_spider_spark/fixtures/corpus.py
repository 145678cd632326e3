"""Deterministic synthetic onion-web corpus (FIXTURES.md schemas).

The corpus is the stand-in for live HTTP fetch (reference fetches via a Tor
SOCKS proxy, spider/spider.go:135-146; scheduled URLs in the engine
left-join this table instead — SURVEY §2.1 S9).  Everything is a pure
function of (seed, knobs): the same knobs always produce byte-identical
tables, so the simulator (pure Python) and the engine (Spark) see the same
web and golden outputs are stable.

Skew design (drives the AQE skew-join test, SURVEY §2.3 J3): `hub` hosts
receive a large share of ALL out-links (in-degree heavy hitters) and carry
`hub_factor`× the median page count, mirroring hub onion sites like the
hidden-wiki seed (reference seed.sh:2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..config import priority_for_depth  # noqa: F401  (re-export convenience)
from ..functions.hashing import xxh64_unsigned
from .images import encode_image, phash64

_B32 = "abcdefghijklmnopqrstuvwxyz234567"

_WORDS = (
    "onion deep web market forum index wiki page link mirror archive hidden "
    "service search directory chat mail drop zero night echo delta träumerei "
    "金魚 данные"
).split()


@dataclass
class FixtureKnobs:
    n_onion_hosts: int = 20
    pages_per_host: int = 5
    hub_hosts: int = 1
    hub_factor: int = 50
    image_px: int = 32
    n_clearnet_hosts: int = 2
    # onion hosts linked ONLY from clearnet pages: reachable exclusively
    # through the seed mini-crawl's clearnet traversal (frozen step 8;
    # reference spider/spider.go:353 follows every link)
    n_hidden_onion_hosts: int = 2
    seed: int = 42
    with_images: bool = True


@dataclass
class Fixture:
    corpus: list[dict]
    seeds: list[dict]
    blacklist: list[str]
    robots: list[dict]
    knobs: FixtureKnobs = field(default_factory=FixtureKnobs)
    # onion hosts reachable only through clearnet intermediates (test hook)
    hidden_hosts: list[str] = field(default_factory=list)


def _host_label(rng: np.random.Generator, long_form: bool) -> str:
    n = 56 if long_form else 16
    return "".join(_B32[i] for i in rng.integers(0, 32, n))


def pixels_for(image_id: str, w: int, h: int) -> np.ndarray:
    """Regenerate the source pixel array for an image_id — used by the
    payload-invariant tests (decode(bytes) vs original, FIXTURES.md §6)."""
    rng = np.random.default_rng(xxh64_unsigned("px:" + image_id))
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 255 // max(h - 1, 1))[..., None] * np.array([1, 0, 0]) + (
        xx * 255 // max(w - 1, 1)
    )[..., None] * np.array([0, 1, 0])
    noise = rng.integers(0, 64, (h, w, 3))
    return ((base + noise) % 256).astype(np.uint8)


def _caption_for(url: str, words: list[str]) -> str:
    u = xxh64_unsigned("cap:" + url)
    if u % 17 == 0:
        return ""  # reference Title may be empty (spider/spider.go:309-317)
    k = 3 + u % 6
    return " ".join(words[(u >> (7 * i)) % len(words)] for i in range(k))


def generate_fixture(knobs: FixtureKnobs | None = None, caption_words: list[str] | None = None) -> Fixture:
    """Build the full synthetic web + seeds + blacklist + robots."""
    k = knobs or FixtureKnobs()
    words = caption_words or _WORDS
    rng = np.random.default_rng(k.seed)

    # --- hosts ------------------------------------------------------------
    labels: list[str] = []
    seen_labels: set[str] = set()
    while len(labels) < k.n_onion_hosts:
        lab = _host_label(rng, long_form=(len(labels) % 5 == 4))
        if lab not in seen_labels:
            seen_labels.add(lab)
            labels.append(lab)
    hosts = [lab + ".onion" for lab in labels]
    hubs = hosts[: k.hub_hosts]
    # dedicated roles (FIXTURES.md §2-4)
    bl_host = hosts[-1]  # blacklisted host
    trap_host = hosts[-2]  # seed host whose pages link only to bl_host
    robots_host = hosts[1 % len(hosts)]  # has /private disallow
    delay_host = hosts[2 % len(hosts)]  # has crawl_delay
    clearnet = [f"example{i}.com" for i in range(k.n_clearnet_hosts)]
    # hidden onion hosts: never in the link-target pool; wired in only via
    # the clearnet chain below (drawn AFTER the main labels so existing
    # rng consumption — and thus the rest of the fixture — is unchanged)
    hidden: list[str] = []
    while len(hidden) < k.n_hidden_onion_hosts:
        lab = _host_label(rng, long_form=(len(hidden) % 2 == 1))
        if lab not in seen_labels:
            seen_labels.add(lab)
            hidden.append(lab + ".onion")

    pages_of: dict[str, int] = {}
    for h in hosts:
        n = max(1, int(rng.integers(max(1, k.pages_per_host // 2), k.pages_per_host * 2 + 1)))
        if h in hubs:
            n *= k.hub_factor
        pages_of[h] = n
    for c in clearnet:
        pages_of[c] = 3
    for h in hidden:
        pages_of[h] = 2

    # Zipf-ish link-target pool: hubs massively over-represented (in-degree skew)
    target_pool: list[str] = []
    for h in hosts:
        weight = k.hub_factor * 4 if h in hubs else 1
        target_pool.extend([h] * weight)

    def page_url(host: str, i: int) -> str:
        scheme = "https" if host in clearnet else "http"
        path = f"/private/p{i}" if host == robots_host and i % 4 == 3 else f"/p{i}"
        return f"{scheme}://{host}{path}"

    corpus: list[dict] = []
    for host in hosts + hidden + clearnet:
        n_pages = pages_of[host]
        hrng = np.random.default_rng(xxh64_unsigned("host:" + host) ^ k.seed)
        for i in range(n_pages):
            url = page_url(host, i)
            u = xxh64_unsigned(url)
            status = 200
            r = u % 100
            if r >= 94 and host not in clearnet:
                # clearnet pages are traversal scaffolding — always 200 so
                # the seed mini-crawl chain cannot be severed by a synthetic
                # error page
                status = 404 if r % 2 == 0 else 500
            out_links: list[str] = []
            n_links = int(3 + hrng.integers(0, 6))
            if host == trap_host:
                out_links = [f"http://{bl_host}/p{j}" for j in range(3)]
            else:
                for j in range(n_links):
                    form = int(hrng.integers(0, 10))
                    tgt_host = target_pool[int(hrng.integers(0, len(target_pool)))]
                    tgt_i = int(hrng.integers(0, pages_of[tgt_host]))
                    if form <= 4:  # absolute onion
                        out_links.append(page_url(tgt_host, tgt_i))
                    elif form == 5:  # relative same-host
                        out_links.append(f"p{int(hrng.integers(0, n_pages))}")
                    elif form == 6:  # dot-relative
                        out_links.append(f"../p{int(hrng.integers(0, n_pages))}")
                    elif form == 7:  # fragment-only → canonicalizes to dropped
                        out_links.append("#top")
                    elif form == 8:  # clearnet target (filtered at enqueue)
                        c = clearnet[int(hrng.integers(0, len(clearnet)))]
                        out_links.append(page_url(c, int(hrng.integers(0, 3))))
                    else:  # blacklisted target
                        out_links.append(f"http://{bl_host}/p0")
            row: dict = {
                "url": url,
                "host": host,
                "status": status,
                "out_links": out_links,
                "image_id": None,
                "bytes": None,
                "w": None,
                "h": None,
                "fmt": None,
                "caption": None,
                "phash": None,
            }
            if status == 200:
                image_id = f"img{u & 0xFFFFFFFF:08x}"
                caption = _caption_for(url, words)
                row.update(image_id=image_id, caption=caption)
                if k.with_images:
                    px = pixels_for(image_id, k.image_px, k.image_px)
                    fmt = "png" if u % 2 == 0 else "jpeg"
                    row.update(
                        bytes=encode_image(px, fmt),
                        w=k.image_px,
                        h=k.image_px,
                        fmt=fmt,
                        phash=phash64(px),
                    )
            corpus.append(row)

    # clearnet chain to the hidden onion hosts (judge case: an onion URL
    # reachable ONLY through clearnet intermediates within the mini-crawl
    # window): seed=cl0/p0 (d0) → p1 (d1) → hidden[0] (d2) and
    # p1 → p2 (d2) → hidden[1] (d3 — exactly the window boundary)
    if hidden and clearnet:
        by_url = {r["url"]: r for r in corpus}
        cl0 = [page_url(clearnet[0], i) for i in range(3)]
        by_url[cl0[0]]["out_links"] = by_url[cl0[0]]["out_links"] + ["p1"]
        hops = [page_url(hidden[0], 0), "p2"]
        by_url[cl0[1]]["out_links"] = by_url[cl0[1]]["out_links"] + hops
        if len(hidden) > 1:
            by_url[cl0[2]]["out_links"] = by_url[cl0[2]]["out_links"] + [
                page_url(hidden[1], 0)
            ]

    seeds = [
        {"url": page_url(hubs[0], 0), "is_seed": True, "recrawl_every": 0},
        {"url": page_url(hosts[3 % len(hosts)], 0), "is_seed": True, "recrawl_every": 0},
        {"url": page_url(clearnet[0], 0), "is_seed": True, "recrawl_every": 0},
        {"url": page_url(trap_host, 0), "is_seed": True, "recrawl_every": 0},
    ]
    blacklist = [f".*{bl_host.split('.')[0]}.*"]  # matches the blacklisted hub (blacklist.txt style)
    robots = [
        {"host": robots_host, "disallow_prefixes": ["/private"], "crawl_delay_ms": 0, "max_per_round": None},
        {"host": delay_host, "disallow_prefixes": [], "crawl_delay_ms": 2000, "max_per_round": None},
        {"host": hubs[0], "disallow_prefixes": [], "crawl_delay_ms": 0, "max_per_round": 4},
    ]
    return Fixture(
        corpus=corpus,
        seeds=seeds,
        blacklist=blacklist,
        robots=robots,
        knobs=k,
        hidden_hosts=hidden,
    )


SMOKE = FixtureKnobs(n_onion_hosts=20, pages_per_host=5, hub_hosts=1, hub_factor=50, image_px=32)
CORRECTNESS = FixtureKnobs(n_onion_hosts=200, pages_per_host=20, hub_hosts=3, hub_factor=100, image_px=64)
BENCH = FixtureKnobs(
    n_onion_hosts=5000, pages_per_host=20, hub_hosts=10, hub_factor=100, image_px=16
)
