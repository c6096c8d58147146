from .state import SnapshotTable, StateStore
from .robots import parse_robots_txt, RobotsRules
from .scheduler import CrawlEngine, CrawlConfig
from .compliance import requires_gdpr_compliance, gdpr_required_col
from .pagination import PaginationSpec

__all__ = [
    "SnapshotTable", "StateStore",
    "parse_robots_txt", "RobotsRules",
    "CrawlEngine", "CrawlConfig",
    "requires_gdpr_compliance", "gdpr_required_col",
    "PaginationSpec",
]
