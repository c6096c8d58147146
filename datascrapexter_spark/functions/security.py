"""Security validation: URL/input risk scoring + sanitization.

Reference: /root/reference/internal/security/security.go
  SecurityConfig defaults          :81-91
  ValidateURL                      :128-201  (length, scheme, blocked
                                    domains, suspicious + attack patterns,
                                    http risk +10)
  ValidateInput                    :204-278  (sqli/xss/cmd/path-traversal)
  addIssue risk weights            :280-297  (info 1 / low 5 / medium 15 /
                                    high 30 / critical 50)
  suspicious patterns              :317-356
  attack patterns                  :358-397
  sqli/xss/cmd/path regex tables   :399-468
  SanitizeInput                    :778-792
  IsSecureContext                  :794-805

Two surfaces:
  * driver-side `SecurityValidator` — exact per-string port (config lint,
    seed-list audit), the shape the reference exposes;
  * Spark-side `url_risk_columns` / `url_risk_score_col` — the same
    pattern tables as pure codegen regexp expressions for gating a
    10^10-URL frontier without a Python crossing (this engine's scale
    path; the per-URL semantics match the driver port, tested).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column
from pyspark.sql import functions as F

# severity -> risk weight (security.go:283-296)
RISK_WEIGHT = {"info": 1, "low": 5, "medium": 15, "high": 30, "critical": 50}

# (name, java/python-compatible case-insensitive regex, severity) —
# security.go:317-356 (suspicious) + :358-397 (attack). The same source
# strings feed the driver port (re) and the Spark expressions (rlike), so
# the two surfaces cannot drift.
URL_PATTERNS: list[tuple[str, str, str]] = [
    ("localhost_access", r"(localhost|127\.0\.0\.1|0\.0\.0\.0|::1)", "medium"),
    ("tor_hidden_service", r"\.onion$", "high"),
    ("sensitive_path",
     r"(admin|login|auth|secure|private|internal|management|config)",
     "medium"),
    ("javascript_protocol", r"javascript:", "critical"),
    ("data_protocol", r"data:", "medium"),
    ("sql_keywords",
     r"(union|select|insert|delete|update|drop|exec|script)", "high"),
]

INPUT_PATTERN_FAMILIES: dict[str, list[str]] = {
    # containsSQLInjection (:399-415)
    "sql_injection_risk": [
        r"'.*(\sor\s|\sand\s).*'", r"union\s+select", r"(exec|execute)\s*\(",
        r"drop\s+table", r"1\s*=\s*1", r"'\s*or\s*'.*'",
    ],
    # containsXSS (:417-433)
    "xss_risk": [
        r"<script[^>]*>.*</script>", r"javascript:",
        r"on\w+\s*=\s*['\"][^'\"]*['\"]", r"<iframe[^>]*>.*</iframe>",
        r"alert\s*\(", r"document\.cookie",
    ],
    # containsCommandInjection (:435-450)
    "command_injection_risk": [
        r";.*\s*(rm|del|format|fdisk)", r"\|\s*(nc|netcat|wget|curl)",
        r"&&\s*(cat|type|more|less)", r"\$\([^)]+\)", r"`[^`]+`",
    ],
    # containsPathTraversal (:452-468)
    "path_traversal_risk": [
        r"\.\.[\\/]", r"[\\/]\.\.[\\/]", r"%2e%2e", r"%2f%2e%2e%2f",
        r"(etc[\\/]passwd|windows[\\/]system32)",
    ],
}
INPUT_FAMILY_SEVERITY = {
    "sql_injection_risk": "high",
    "xss_risk": "high",
    "command_injection_risk": "critical",
    "path_traversal_risk": "high",
}


@dataclass
class SecurityConfig:
    # DefaultSecurityConfig (security.go:81-91)
    allowed_schemes: tuple[str, ...] = ("https", "http")
    blocked_domains: tuple[str, ...] = ()
    max_url_length: int = 2048


@dataclass
class SecurityIssue:
    type: str
    severity: str
    field: str = "url"


@dataclass
class ValidationResult:
    valid: bool = True
    issues: list[SecurityIssue] = dc_field(default_factory=list)
    warnings: list[str] = dc_field(default_factory=list)
    risk_score: int = 0

    def add(self, issue: SecurityIssue) -> None:
        self.issues.append(issue)
        self.valid = False
        self.risk_score += RISK_WEIGHT[issue.severity]


class SecurityValidator:
    """Driver-side exact port (per seed/config string)."""

    def __init__(self, config: SecurityConfig | None = None):
        self.cfg = config or SecurityConfig()
        self._url_res = [(n, re.compile(p, re.IGNORECASE), s)
                         for n, p, s in URL_PATTERNS]
        self._input_res = {
            fam: [re.compile(p, re.IGNORECASE) for p in pats]
            for fam, pats in INPUT_PATTERN_FAMILIES.items()
        }

    def validate_url(self, url: str) -> ValidationResult:
        """ValidateURL (security.go:128-201)."""
        from urllib.parse import urlsplit

        res = ValidationResult()
        if len(url) > self.cfg.max_url_length:
            res.add(SecurityIssue("url_length_exceeded", "medium"))
        try:
            parts = urlsplit(url)
        except ValueError:
            res.add(SecurityIssue("invalid_url_format", "high"))
            return res
        if parts.scheme not in self.cfg.allowed_schemes:
            res.add(SecurityIssue("disallowed_scheme", "high"))
        host = parts.netloc.lower()
        for blocked in self.cfg.blocked_domains:
            b = blocked.lower()
            if host == b or host.endswith("." + b):
                res.add(SecurityIssue("blocked_domain", "critical"))
                break
        for name, rx, sev in self._url_res:
            if rx.search(url):
                res.add(SecurityIssue(name, sev))
        if parts.scheme == "http":
            res.warnings.append(
                "Using HTTP instead of HTTPS reduces security")
            res.risk_score += 10
        return res

    def validate_input(self, value: str, field_name: str) -> ValidationResult:
        """ValidateInput (security.go:204-278)."""
        res = ValidationResult()
        for fam, rxs in self._input_res.items():
            if any(rx.search(value) for rx in rxs):
                res.add(SecurityIssue(fam, INPUT_FAMILY_SEVERITY[fam],
                                      field_name))
        return res


def sanitize_input(value: str) -> str:
    """SanitizeInput (security.go:778-792): strip NULs and control chars
    except \\t \\n \\r."""
    return "".join(
        ch for ch in value.replace("\x00", "")
        if ord(ch) >= 32 or ch in "\t\n\r"
    )


def is_secure_context(scheme: str, host: str) -> bool:
    """IsSecureContext (security.go:794-805)."""
    if scheme == "https":
        return True
    return scheme == "http" and host in ("localhost", "127.0.0.1", "::1")


# ---------------------------------------------------------------------------
# Spark surface: the same tables as codegen columns (frontier-scale gate)
# ---------------------------------------------------------------------------


def _ci(pattern: str) -> str:
    return "(?i)" + pattern


def url_risk_columns(url: Column | str,
                     config: SecurityConfig | None = None) -> dict[str, Column]:
    """One boolean column per URL pattern + the scheme/length checks —
    all `rlike`/`length` codegen, zero Python. Keys match the reference's
    issue type names."""
    cfg = config or SecurityConfig()
    u = F.col(url) if isinstance(url, str) else url
    out: dict[str, Column] = {
        "url_length_exceeded": F.length(u) > cfg.max_url_length,
        "disallowed_scheme": ~F.lower(
            F.coalesce(F.parse_url(u, F.lit("PROTOCOL")), F.lit(""))
        ).isin(*[s.lower() for s in cfg.allowed_schemes]),
    }
    for name, pattern, _sev in URL_PATTERNS:
        out[name] = u.rlike(_ci(pattern))
    return out


def url_risk_score_col(url: Column | str,
                       config: SecurityConfig | None = None) -> Column:
    """addIssue risk accumulation (security.go:283-296) + the http +10
    recommendation, as one expression. Matches
    SecurityValidator.validate_url's risk_score for parseable URLs
    (parity pinned by tests)."""
    cfg = config or SecurityConfig()
    u = F.col(url) if isinstance(url, str) else url
    flags = url_risk_columns(u, cfg)
    sev_by_name = dict(
        [("url_length_exceeded", "medium"), ("disallowed_scheme", "high")]
        + [(n, s) for n, _p, s in URL_PATTERNS]
    )
    score: Column = F.lit(0)
    for name, flag in flags.items():
        score = score + F.when(flag, RISK_WEIGHT[sev_by_name[name]]) \
            .otherwise(0)
    http = F.lower(F.coalesce(F.parse_url(u, F.lit("PROTOCOL")),
                              F.lit(""))) == "http"
    return (score + F.when(http, 10).otherwise(0)).cast("int")
