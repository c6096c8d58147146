from .dom import Node, parse_html
from .css import select, matches

__all__ = ["Node", "parse_html", "select", "matches"]
