"""Compliance surface beyond robots.txt: GDPR TLD gate + report.

Reference: /root/reference/internal/compliance/compliance_test.go
  GDPRChecker.RequiresGDPRCompliance :280-288 — suffix match against
  the EU TLD list [.de .fr .co.uk .eu .it .es .nl]
  ComplianceReport / GenerateReport  :296-313 — report shape (robots
  compliance, recommended delay from crawl-delay, GDPR flag)

Spark-first: the per-URL flag is a pure Column expression (endswith OR
chain — codegen, no Python), so a frontier can be annotated or filtered
at any scale; `requires_gdpr_compliance` is the exact Python twin used by
tests/oracles. The crawl engine exposes it via CrawlConfig.gdpr_mode:
  "off"      (default — the reference's checker is likewise unwired)
  "block"    GDPR domains are never scheduled (frontier state
             'blocked_gdpr'); annotation needs no mode — select
             gdpr_required_col("domain") anywhere
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

# compliance_test.go:281 — verbatim list
GDPR_TLD_SUFFIXES = (".de", ".fr", ".co.uk", ".eu", ".it", ".es", ".nl")


def requires_gdpr_compliance(domain: str) -> bool:
    """Exact port of GDPRChecker.RequiresGDPRCompliance (:280-288)."""
    return domain.endswith(GDPR_TLD_SUFFIXES)


def gdpr_required_col(domain: Column | str) -> Column:
    """Column twin: TRUE iff the domain ends with an EU TLD suffix."""
    c = F.col(domain) if isinstance(domain, str) else domain
    out = F.lit(False)
    for suffix in GDPR_TLD_SUFFIXES:
        out = out | c.endswith(suffix)
    return out


@dataclass
class ComplianceReport:
    """GenerateReport shape (compliance_test.go:296-313)."""
    robots_compliant: bool
    recommended_delay_s: float
    risk_level: str
    gdpr_required: bool
    has_consent_mechanism: bool


def generate_report(robots, url_host: str, user_agent: str = "*",
                    path: str = "/") -> ComplianceReport:
    """Driver-side report for one host (the reference returns constants
    except the crawl-delay; we at least evaluate robots for the path)."""
    compliant = True
    delay = 0.0
    if robots is not None:
        compliant = not robots.is_disallowed(user_agent, path)
        delay = robots.get_crawl_delay(user_agent)
    domain = url_host
    return ComplianceReport(
        robots_compliant=compliant,
        recommended_delay_s=delay,
        risk_level="low" if compliant else "high",
        gdpr_required=requires_gdpr_compliance(domain),
        has_consent_mechanism=True,
    )
