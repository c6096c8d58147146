"""Proxy rotation manager: selection strategies + health bookkeeping.

Reference: /root/reference/internal/proxy/
  defaults                       manager.go:38-50
  initializeProxies              manager.go:91-130  (disabled skipped)
  buildProxyURL                  manager.go:132-164 (scheme by type, auth:
                                 per-provider wins over global)
  GetProxy strategy dispatch     manager.go:166-204 (use counters)
  round_robin (skip-unavailable) manager.go:207-230
  random                         manager.go:232-244
  weighted (weight<=0 -> 1)      manager.go:246-286
  healthy (min response time)    manager.go:288-302
  availability + recovery window manager.go:308-336
  ReportSuccess / ReportFailure  manager.go:338-380 (threshold opens,
                                 success re-marks available)
  enums/config shapes            types.go:10-110

The reference's live parts (HTTP health-check loop, TLS client) need a
network, so they stay out of scope (SURVEY §2.3: proxy selection is not
a data-plane operator). What IS here is the complete selection/health
state machine, deterministic: the RNG is seeded, time is injected, so
every strategy is reproducible under test — the same treatment the crawl
engine gives the reference's wall-clock rate limiter.
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass, field as dc_field
from typing import Callable
from urllib.parse import quote

VALID_PROXY_TYPES = ("http", "https", "socks5")        # types.go:13-17
VALID_ROTATIONS = ("round_robin", "random", "weighted", "healthy")


@dataclass
class ProxyProvider:
    # types.go:73-85
    name: str
    host: str
    port: int
    type: str = "http"
    username: str = ""
    password: str = ""
    weight: int = 0
    enabled: bool = True


@dataclass
class ProxyConfig:
    # defaults: manager.go:40-50
    enabled: bool = False
    rotation: str = "round_robin"
    providers: list[ProxyProvider] = dc_field(default_factory=list)
    auth_username: str = ""
    auth_password: str = ""
    failure_threshold: int = 5
    recovery_time_s: float = 600.0
    max_retries: int = 3


@dataclass
class ProxyStatus:
    # types.go:93-102
    available: bool = True
    response_time_s: float = 0.0
    failure_count: int = 0
    last_failure: float = 0.0
    last_success: float = 0.0
    use_count: int = 0


@dataclass
class ProxyInstance:
    provider: ProxyProvider
    url: str
    status: ProxyStatus = dc_field(default_factory=ProxyStatus)


def build_proxy_url(provider: ProxyProvider,
                    config: ProxyConfig | None = None) -> str:
    """buildProxyURL (manager.go:132-164): scheme from type, host:port,
    per-provider credentials win over the global authentication block."""
    if provider.type not in VALID_PROXY_TYPES:
        raise ValueError(f"unsupported proxy type: {provider.type}")
    user, pw = provider.username, provider.password
    if not (user and pw) and config is not None:
        user, pw = config.auth_username, config.auth_password
    cred = f"{quote(user, safe='')}:{quote(pw, safe='')}@" \
        if user and pw else ""
    return f"{provider.type}://{cred}{provider.host}:{provider.port}"


class ProxyManager:
    def __init__(self, config: ProxyConfig | None = None,
                 clock: Callable[[], float] = time.monotonic,
                 seed: int = 0):
        self.cfg = config or ProxyConfig()
        self.clock = clock
        self.rng = random.Random(seed)   # deterministic; the reference
        # seeds from wall time (manager.go:74) — injected here
        self._index = 0
        self.total_requests = 0
        self.proxies: list[ProxyInstance] = [
            ProxyInstance(p, build_proxy_url(p, self.cfg))
            for p in self.cfg.providers if p.enabled
        ]

    # -- availability ----------------------------------------------------

    def _available(self) -> list[ProxyInstance]:
        """getAvailableProxies (manager.go:308-336): failure threshold
        gates; the recovery window re-opens a tripped proxy and resets
        its failure count."""
        out = []
        now = self.clock()
        for p in self.proxies:
            ok = (p.status.available
                  and p.status.failure_count < self.cfg.failure_threshold)
            if not ok and now - p.status.last_failure > self.cfg.recovery_time_s:
                p.status.available = True
                p.status.failure_count = 0
                ok = True
            if ok:
                out.append(p)
        return out

    # -- selection -------------------------------------------------------

    def get_proxy(self) -> ProxyInstance | None:
        """GetProxy (manager.go:166-204). Returns None when disabled or
        unconfigured (the reference's nil, nil); raises when every proxy
        is unhealthy."""
        if not self.cfg.enabled or not self.proxies:
            return None
        strategy = {
            "round_robin": self._round_robin,
            "random": self._random,
            "weighted": self._weighted,
            "healthy": self._healthy,
        }.get(self.cfg.rotation, self._round_robin)
        proxy = strategy()
        proxy.status.use_count += 1
        self.total_requests += 1
        return proxy

    def _usable(self, p: ProxyInstance) -> bool:
        return (p.status.available
                and p.status.failure_count < self.cfg.failure_threshold)

    def _round_robin(self) -> ProxyInstance:
        # manager.go:207-230: next AVAILABLE from the cursor, cursor
        # advances past the pick
        for i in range(len(self.proxies)):
            idx = (self._index + i) % len(self.proxies)
            if self._usable(self.proxies[idx]):
                self._index = (idx + 1) % len(self.proxies)
                return self.proxies[idx]
        raise RuntimeError("no healthy proxies available")

    def _pool(self) -> list[ProxyInstance]:
        avail = self._available()
        if not avail:
            raise RuntimeError("no healthy proxies available")
        return avail

    def _random(self) -> ProxyInstance:
        avail = self._pool()
        return avail[self.rng.randrange(len(avail))]

    def _weighted(self) -> ProxyInstance:
        # manager.go:246-286: weight<=0 counts as 1
        avail = self._pool()
        weights = [p.provider.weight if p.provider.weight > 0 else 1
                   for p in avail]
        total = sum(weights)
        r = self.rng.randrange(total)
        acc = 0
        for p, w in zip(avail, weights):
            acc += w
            if r < acc:
                return p
        return avail[0]

    def _healthy(self) -> ProxyInstance:
        # manager.go:288-302: lowest response time wins (stable on ties)
        avail = self._pool()
        return min(avail, key=lambda p: p.status.response_time_s)

    # -- health reporting ------------------------------------------------

    def report_success(self, proxy: ProxyInstance,
                       response_time_s: float | None = None) -> None:
        """ReportSuccess (manager.go:338-355)."""
        proxy.status.last_success = self.clock()
        proxy.status.available = True
        if response_time_s is not None:
            proxy.status.response_time_s = response_time_s

    def report_failure(self, proxy: ProxyInstance) -> None:
        """ReportFailure (manager.go:357-380): threshold trips the
        proxy until the recovery window elapses."""
        proxy.status.failure_count += 1
        proxy.status.last_failure = self.clock()
        if proxy.status.failure_count >= self.cfg.failure_threshold:
            proxy.status.available = False

    def stats(self) -> dict:
        """GetStats shape (manager.go:382-424 / types.go:145-167)."""
        healthy = sum(1 for p in self.proxies if self._usable(p))
        return {
            "total_proxies": len(self.proxies),
            "healthy_proxies": healthy,
            "total_requests": self.total_requests,
            "proxies": {
                p.provider.name: {
                    "url": p.url,
                    "use_count": p.status.use_count,
                    "failure_count": p.status.failure_count,
                    "healthy": self._usable(p),
                }
                for p in self.proxies
            },
        }
