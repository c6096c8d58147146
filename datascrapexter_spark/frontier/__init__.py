from .state import SnapshotTable, StateStore
from .robots import parse_robots_txt, RobotsRules
from .scheduler import CrawlEngine, CrawlConfig

__all__ = [
    "SnapshotTable", "StateStore",
    "parse_robots_txt", "RobotsRules",
    "CrawlEngine", "CrawlConfig",
]
