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
REDDIT_LINK_PATTERN = r'href="([^"]+)"\s*>\s*\[link\]\s*</a>'
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


def reddit_link_col(content: Column) -> Column:
    extracted = F.regexp_extract(content, REDDIT_LINK_PATTERN, 1)
    fallback = F.regexp_extract(content, ANY_URL_PATTERN, 1)
    picked = F.when(extracted != "", extracted).otherwise(fallback)
    unescaped = picked
    for ent, rep in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"')):
        unescaped = F.replace(unescaped, F.lit(ent), F.lit(rep))
    return F.when(unescaped != "", unescaped)
