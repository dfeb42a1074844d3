"""Article-URL extraction out of content HTML (E3, SURVEY.md §2.1).

Reference: reddit-style `href="URL">[link]</a>` regex with entity
unescape and a generic first-external-URL fallback
(news-scanner/scanner/rss_parser.py:252-302). Exposed both as a pure
function and as a Column expression (regexp_extract stays JVM-side).
"""

from __future__ import annotations

import html
import re
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

_REDDIT_LINK_RE = re.compile(r'href="([^"]+)"\s*>\s*\[link\]\s*</a>', re.I)
_ANY_URL_RE = re.compile(r'https?://[^\s"\'<>]+')

# same patterns as the pure functions, for the JVM-side fast path
# ((?i) mirrors the python re.I flag — Java regex inline flag)
REDDIT_LINK_PATTERN = r'(?i)href="([^"]+)"\s*>\s*\[link\]\s*</a>'
ANY_URL_PATTERN = r'(https?://[^\s"\'<>]+)'


def extract_article_url(content_html: str, exclude_host: str = "reddit.com") -> Optional[str]:
    if not content_html:
        return None
    m = _REDDIT_LINK_RE.search(content_html)
    if m:
        return html.unescape(m.group(1))
    for m in _ANY_URL_RE.finditer(html.unescape(content_html)):
        url = m.group(0)
        if exclude_host not in url:
            return url
    return None


def _unescape_legacy(col: Column) -> Column:
    # the legacy 5-entity subset (full html.unescape is python-only; the
    # UDF path is authoritative for exotic entities)
    for ent, rep in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'")):
        col = F.replace(col, F.lit(ent), F.lit(rep))
    return col


def reddit_link_col(content: Column, exclude_host: str = "reddit.com") -> Column:
    """JVM fast path of extract_article_url with the SAME semantics:
    case-insensitive [link] anchor first; otherwise the first URL in the
    (entity-unescaped) content whose host is not the excluded one."""
    extracted = _unescape_legacy(F.regexp_extract(content, REDDIT_LINK_PATTERN, 1))
    urls = F.regexp_extract_all(_unescape_legacy(content), F.lit(ANY_URL_PATTERN), 1)
    fallback = F.try_element_at(  # empty array → null (ANSI-safe)
        F.filter(urls, lambda u: ~u.contains(F.lit(exclude_host))), F.lit(1)
    )
    picked = F.when(extracted != "", extracted).otherwise(fallback)
    return F.when(picked != "", picked)
