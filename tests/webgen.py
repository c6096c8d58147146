"""Deterministic synthetic Common-Crawl-style web (FIXTURES.md §1-§3).

Pure function of the seed: hosts, pages with out-links (absolute/relative/
fragment/tracking-polluted/off-host — exercising canonicalization), robots
rules (with Disallow + Crawl-delay, compliance_test.go:13-25 shape),
missing pages (fetch misses -> retry path), and seed lists.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

HTML_TMPL = (
    "<html><head><title>{title}</title></head><body>"
    "<h1>{title}</h1>"
    '<span class="price">${price}</span>'
    '<div class="status">{status}</div>'
    '<ul class="items"><li>Item 1</li><li>Item 2</li><li>Item 3</li></ul>'
    "{links}"
    "</body></html>"
)

STATUSES = ["Available", "Out of Stock", "Sold Out", "In Stock", "Coming Soon"]


def make_web(n_hosts: int = 5, pages_per_host: int = 12, seed: int = 42,
             missing_every: int = 7, private_every: int = 5):
    """Returns (pages_rows, seeds_rows, robots_texts).

    pages_rows: (url, warc_ts, html, text, lang) — input_hint schema.
    seeds_rows: (url, priority)
    robots_texts: host -> robots.txt text
    """
    rng = random.Random(seed)
    hosts = []
    for i in range(n_hosts):
        if i % 4 == 3:
            hosts.append(f"shop{i}.example.co.uk")
        else:
            hosts.append(f"site{i}.example.com")

    base_ts = datetime(2024, 3, 1, 0, 0, 0)
    pages, seeds, robots_texts = [], [], {}

    for hi, host in enumerate(hosts):
        # robots: every host disallows /private/; odd hosts get a crawl delay
        delay = "" if hi % 2 == 0 else f"Crawl-delay: {1 + hi % 3}\n"
        robots_texts[host] = (
            "User-agent: *\n"
            "Disallow: /private/\n"
            "Disallow: /admin/\n"
            "Allow: /public/\n"
            f"{delay}"
            f"Sitemap: https://{host}/sitemap.xml\n"
        )
        for pi in range(pages_per_host):
            path = f"/private/p{pi}" if pi % private_every == 4 else f"/page/{pi}"
            url = f"https://{host}{path}"
            is_missing = pi % missing_every == 6  # linked but not in pages

            links = []
            if pi + 1 < pages_per_host:
                nxt = pi + 1
                nxt_path = (f"/private/p{nxt}" if nxt % private_every == 4
                            else f"/page/{nxt}")
                # raw forms vary: relative, absolute, polluted — all canonical-
                # izing to the same target
                form = (pi + hi) % 4
                if form == 0:
                    links.append(f'<a href="{nxt_path}">next</a>')
                elif form == 1:
                    links.append(
                        f'<a href="https://{host.upper()}:443{nxt_path}">next</a>')
                elif form == 2:
                    links.append(
                        f'<a href="{nxt_path}?utm_source=feed&ref=x">next</a>')
                else:
                    links.append(f'<a href="{nxt_path}#frag">next</a>')
            # cross link within host
            tgt = (pi * 3 + hi) % pages_per_host
            tgt_path = (f"/private/p{tgt}" if tgt % private_every == 4
                        else f"/page/{tgt}")
            links.append(f'<a href="https://{host}{tgt_path}/">rel</a>')
            # off-host link (dropped when restrict_to_seed_hosts and target
            # host differs, followed otherwise)
            other = hosts[(hi + 1) % len(hosts)]
            links.append(f'<a href="https://{other}/page/0">other</a>')
            # junk links
            links.append('<a href="#top">top</a>')
            links.append('<a href="javascript:void(0)">js</a>')
            links.append('<a href="mailto:x@example.com">mail</a>')
            if pi % 3 == 0:
                links.append(f'<a href="https://{host}/page/missing-{pi}">m</a>')

            title = f"Page {pi} of {host}"
            status = STATUSES[(pi + hi) % len(STATUSES)]
            price = f"{rng.randint(1, 2000)}.{rng.randint(0, 99):02d}"
            html = HTML_TMPL.format(title=title, price=price,
                                    status=status, links="".join(links))
            if not is_missing:
                # raw URL sometimes in non-canonical form
                raw = url if pi % 3 else f"https://{host.upper()}{path}"
                ts = base_ts + timedelta(minutes=hi * 100 + pi)
                pages.append((raw, ts, html.encode("utf-8"), title, "en"))

        prio = [20, 10, 5, 5, 1][hi % 5]
        seeds.append((f"https://{host}/page/0", prio))

    return pages, seeds, robots_texts
